"""C1 — BIOES/IOB span extraction: tags array → entity mention spans.

Implements the conlleval chunk-boundary semantics
(/root/reference/conlleval.py:33-82): a stateful scan with
``is_chunk_start`` / ``is_chunk_end`` predicates that resolves
contradictory transitions (``B-PER I-LOC`` starts a new LOC chunk) and
closes a chunk left open at end-of-sequence — which also subsumes the
reference's sentinel-append trick (C2, /root/reference/word_rep.py:131-134):
no sentinel token is ever materialized here.

Spark hosting: pandas UDF producing ``array<struct<start,end,tag_type,
surface>>``, then ``explode`` → the mentions table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)


def _split(tag: str) -> tuple[str, str]:
    # memoized: the tag vocabulary is tiny (17 strings for 4 IOBES
    # types) but the fused hot path parses ~650k tags per Arrow batch —
    # profiling showed raw string splits were ~40% of the whole fused
    # pipeline body before the cache + the inlined scan below
    try:
        return _SPLIT_CACHE[tag]
    except KeyError:
        pass
    if tag == "O" or not tag:
        out = ("O", "")
    elif "-" in tag:
        p, t = tag.split("-", 1)
        out = (p, t)
    else:
        out = (tag, "")
    _SPLIT_CACHE[tag] = out
    return out


_SPLIT_CACHE: dict[str, tuple[str, str]] = {}


def is_chunk_end(prev_tag: str, tag: str) -> bool:
    """Did a chunk end BETWEEN prev_tag and tag? (conlleval.py:60-82)"""
    pp, pt = _split(prev_tag)
    cp, ct = _split(tag)
    if pp in ("E", "S"):
        return True
    if pp in ("B", "I") and cp in ("B", "S", "O"):
        return True
    if pp != "O" and pt != ct:
        return True
    return False


def is_chunk_start(prev_tag: str, tag: str) -> bool:
    """Did a chunk start AT tag? (conlleval.py:33-58)"""
    pp, pt = _split(prev_tag)
    cp, ct = _split(tag)
    if cp in ("B", "S"):
        return True
    if pp in ("E", "S", "O") and cp in ("I", "E"):
        return True
    if cp != "O" and pt != ct:
        return True
    return False


def extract_spans(tags: list[str], tokens: list[str] | None = None) -> list[dict]:
    """Pure scan: tag sequence → [{start, end, tag_type, surface}].

    ``end`` is exclusive. ``surface`` is the space-joined tokens
    (lowercase-free: normalization happens downstream, never here).
    """
    spans: list[dict] = []
    # single-parse scan: each tag is split once and the chunk-boundary
    # predicates are inlined over (prefix, type) pairs — clause-for-
    # clause identical to is_chunk_end / is_chunk_start above (which
    # remain the public single-pair API)
    pp, pt = "O", ""
    open_start, open_type = None, None
    for i, tag in enumerate(tags):
        cp, ct = _split(tag)
        if open_start is not None and (
                pp in ("E", "S")
                or (pp in ("B", "I") and cp in ("B", "S", "O"))
                or (pp != "O" and pt != ct)):
            spans.append({"start": open_start, "end": i, "tag_type": open_type})
            open_start, open_type = None, None
        if ct and (cp in ("B", "S")
                   or (pp in ("E", "S", "O") and cp in ("I", "E"))
                   or (cp != "O" and pt != ct)):
            open_start, open_type = i, ct
        pp, pt = cp, ct
    if open_start is not None:
        spans.append({"start": open_start, "end": len(tags), "tag_type": open_type})
    if tokens is not None:
        for s in spans:
            s["surface"] = " ".join(tokens[s["start"]:s["end"]])
    return spans


_SPAN_SCHEMA = ArrayType(StructType([
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
    StructField("tag_type", StringType()),
    StructField("surface", StringType()),
]))


@F.pandas_udf(_SPAN_SCHEMA)
def extract_spans_udf(tags: pd.Series, tokens: pd.Series) -> pd.Series:
    out = []
    for tg, tk in zip(tags, tokens):
        if tg is None:
            out.append([])
            continue
        spans = extract_spans(list(tg), list(tk) if tk is not None else None)
        out.append([(s["start"], s["end"], s["tag_type"], s.get("surface")) for s in spans])
    return pd.Series(out)


def mentions_table(tagged: DataFrame) -> DataFrame:
    """(url, sent_id, tokens, pred_tags) → exploded mentions table.

    One output row per detected entity mention.
    """
    return (
        tagged
        .withColumn("spans", extract_spans_udf(F.col("pred_tags"), F.col("tokens")))
        .select("url", "sent_id", F.posexplode_outer("spans").alias("mention_id", "span"))
        .filter(F.col("span").isNotNull())
        .select(
            "url", "sent_id", "mention_id",
            F.col("span.start").alias("start"),
            F.col("span.end").alias("end"),
            F.col("span.tag_type").alias("tag_type"),
            F.col("span.surface").alias("surface"),
        )
    )


def merge_tag_runs(tokens: list[str], tags: list[str]) -> list[dict]:
    """C5 — tag-run merge (paraphrase_model.py:43-63): collapse each
    multi-token chunk (B-…I-…E- continuation run) and "'"-clitics into
    a single node, keeping O tokens as their own nodes. Returns
    [{text, tag_type, start, end}] covering the sentence — the node
    sequence a downstream parser consumes."""
    spans = extract_spans(tags, tokens)
    by_start = {s["start"]: s for s in spans}
    nodes: list[dict] = []
    i = 0
    while i < len(tokens):
        s = by_start.get(i)
        if s is not None:
            nodes.append({"text": s["surface"], "tag_type": s["tag_type"],
                          "start": s["start"], "end": s["end"]})
            i = s["end"]
            continue
        # clitic merge: attach "'"-initial tokens to the previous O node
        if (tokens[i].startswith("'") and nodes
                and nodes[-1]["tag_type"] is None and nodes[-1]["end"] == i):
            nodes[-1]["text"] += tokens[i]
            nodes[-1]["end"] = i + 1
        else:
            nodes.append({"text": tokens[i], "tag_type": None,
                          "start": i, "end": i + 1})
        i += 1
    return nodes
