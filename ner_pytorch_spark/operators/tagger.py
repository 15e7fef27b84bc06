"""Sentence segmentation + featurization + batched mention tagging.

The inference hot path of the engine (SURVEY §7 Phase 1):

    pages → filter(lang='en') → sentences (split + posexplode, JVM-side)
          → tag_sentences (ONE Arrow-batched mapInPandas stage:
            featurize P1-P6 + emissions + CRF Viterbi M8)
          → mentions (C1 explode)

Two emission modes, both decoding through the SAME numpy CRF Viterbi:

* ``neural``    — the full char-CNN/BiLSTM forward
  (:mod:`ner_pytorch_spark.operators.encoder`) with broadcast weights;
  the production path once trained weights are loaded.
* ``gazetteer`` — emissions constructed from broadcast alias-dictionary
  longest matches (the distant-supervision path; deterministic, used for
  the synthetic-corpus P/R gate where no trained checkpoint exists).

Featurization parity contracts (unit-tested):
  word ids: lowercase + digit-fold + <UNK> fallback
  (/root/reference/loader.py:135-137,160-161); char ids: case kept,
  OOV chars silently DROPPED (/root/reference/loader.py:138); caps:
  4-way class (/root/reference/loader.py:113-128).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..functions.textnorm import py_cap_feature, py_zero_digits, tokenize_ws
from .crf import viterbi_decode
from .encoder import TaggerWeights, neural_emissions
from .tagset import ENTITY_TYPES, grammar_transitions, iobes_tags

MATCH_SCORE = 10.0


# ------------------------------------------------------------ sentences


def sentences_table(pages: DataFrame, lang: str | None = "en") -> DataFrame:
    """pages → (url, sent_id, sentence, tokens). All JVM-side.

    Sentence = non-empty line of the extracted text (the extractor emits
    one block element per line); tokens = whitespace split. ``sent_id``
    is the line ordinal — a pure function of the text, stable under any
    repartitioning.
    """
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return (
        df.select("url", F.posexplode(F.split("text", "\n")).alias("sent_id", "sentence"))
        .filter(F.length("sentence") > 0)
        .withColumn("tokens", tokenize_ws(F.col("sentence")))
        .filter(F.size("tokens") > 0)
    )


# ------------------------------------------------------- featurization


def featurize_sentence(tokens: list[str], word_to_id: dict, char_to_id: dict,
                       unk_id: int) -> tuple[list[int], list[list[int]], list[int]]:
    """P1-P6 for one sentence; pure, shared with the golden pipeline."""
    word_ids = [
        word_to_id.get(py_zero_digits(t.lower()), unk_id) for t in tokens]
    char_ids = [
        [char_to_id[c] for c in t if c in char_to_id]  # OOV-drop, loader.py:138
        for t in tokens]
    caps = [py_cap_feature(t) for t in tokens]
    return word_ids, char_ids, caps


# ------------------------------------------------- gazetteer emissions


def build_surface_index(aliases: list[dict]) -> dict:
    """first_token → [(token_tuple, tag_type)], longest-first.

    Greedy leftmost-longest matching mirrors the reference's PPDB
    bigram-then-unigram lookup (J5, /root/reference/ppdb.py:85-100) —
    with the bigram-construction bug at ppdb.py:89 fixed, not replicated.
    """
    idx: dict[str, list[tuple[tuple[str, ...], str]]] = {}
    for row in aliases:
        toks = tuple(row["surface"].split(" "))
        idx.setdefault(toks[0], []).append((toks, row["tag_type"]))
    for k in idx:
        idx[k].sort(key=lambda p: (-len(p[0]), p[0]))
    return idx


def gazetteer_tag_ids(tokens: list[str], surface_index: dict,
                      tag_ids: dict[str, int]) -> list[int]:
    """Greedy longest-match → IOBES tag-id sequence (gold emissions)."""
    n = len(tokens)
    ids = [tag_ids["O"]] * n
    i = 0
    while i < n:
        cands = surface_index.get(tokens[i])
        matched = False
        if cands:
            for toks, tt in cands:
                L = len(toks)
                if i + L <= n and tuple(tokens[i:i + L]) == toks:
                    if L == 1:
                        ids[i] = tag_ids[f"S-{tt}"]
                    else:
                        ids[i] = tag_ids[f"B-{tt}"]
                        for j in range(i + 1, i + L - 1):
                            ids[j] = tag_ids[f"I-{tt}"]
                        ids[i + L - 1] = tag_ids[f"E-{tt}"]
                    i += L
                    matched = True
                    break
        if not matched:
            i += 1
    return ids


# ------------------------------------------------------------- tagging

_TAGGED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("sent_id", IntegerType()),
    StructField("tokens", ArrayType(StringType())),
    StructField("pred_tags", ArrayType(StringType())),
    StructField("n_tokens", LongType()),
])


def tag_sentences(
    sentences: DataFrame,
    mode: str = "gazetteer",
    weights: TaggerWeights | None = None,
    vocab: dict | None = None,
    char_vocab: dict | None = None,
    aliases: list[dict] | None = None,
    entity_types: tuple[str, ...] = ENTITY_TYPES,
) -> DataFrame:
    """Batched mention detection: ONE mapInPandas stage over Arrow batches.

    Everything heavy (weights / dictionaries) ships via
    ``sparkContext.broadcast`` once per job, not per task. Batch size is
    bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (session
    factory) — the explicit inference-stage sizing knob.
    """
    spark = sentences.sparkSession
    sc = spark.sparkContext
    tags = iobes_tags(entity_types)
    tag_ids = {t: i for i, t in enumerate(tags)}
    transitions = grammar_transitions(entity_types)

    if mode == "gazetteer":
        if aliases is None:
            raise ValueError("gazetteer mode needs aliases")
        bc = sc.broadcast({
            "surface_index": build_surface_index(aliases),
            "tag_ids": tag_ids, "tags": tags, "transitions": transitions,
        })

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            v = bc.value
            sidx, tids, tlist, trans = (
                v["surface_index"], v["tag_ids"], v["tags"], v["transitions"])
            T = len(tlist)
            for pdf in batches:
                tok_lists = [list(t) for t in pdf["tokens"]]
                B = len(tok_lists)
                if B == 0:
                    continue
                lengths = np.array([len(t) for t in tok_lists], dtype=np.int64)
                L = max(1, int(lengths.max()))
                em = np.zeros((B, L, T), dtype=np.float32)
                for b, toks in enumerate(tok_lists):
                    gold = gazetteer_tag_ids(toks, sidx, tids)
                    em[b, np.arange(len(gold)), gold] = MATCH_SCORE
                paths = viterbi_decode(em, lengths, trans)
                pred = [[tlist[i] for i in p] for p in paths]
                yield pd.DataFrame({
                    "url": pdf["url"], "sent_id": pdf["sent_id"],
                    "tokens": pdf["tokens"], "pred_tags": pred,
                    "n_tokens": lengths,
                })

    elif mode == "neural":
        if weights is None or vocab is None or char_vocab is None:
            raise ValueError("neural mode needs weights + vocabs")
        unk_id = vocab.get("<UNK>", 0)
        bc = sc.broadcast({
            "weights": weights, "vocab": vocab, "chars": char_vocab,
            "unk": unk_id, "tags": tags, "transitions": transitions,
        })

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            v = bc.value
            w: TaggerWeights = v["weights"]
            tlist = v["tags"]
            for pdf in batches:
                tok_lists = [list(t) for t in pdf["tokens"]]
                if not tok_lists:
                    continue
                feats = [featurize_sentence(t, v["vocab"], v["chars"], v["unk"])
                         for t in tok_lists]
                word_ids = [f[0] for f in feats]
                char_ids = [f[1] for f in feats]
                caps = [f[2] for f in feats]
                em, lengths = neural_emissions(w, word_ids, char_ids, caps)
                # grammar prior keeps decodes IOBES-valid even with
                # untrained transition weights
                paths = viterbi_decode(em, lengths, w.transitions + v["transitions"])
                pred = [[tlist[i] for i in p] for p in paths]
                yield pd.DataFrame({
                    "url": pdf["url"], "sent_id": pdf["sent_id"],
                    "tokens": pdf["tokens"], "pred_tags": pred,
                    "n_tokens": lengths,
                })

    else:
        raise ValueError(f"unknown mode {mode!r}")

    return sentences.select("url", "sent_id", "tokens").mapInPandas(run, _TAGGED_SCHEMA)
