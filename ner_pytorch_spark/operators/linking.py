"""J4/A4/M12 — candidate generation + cosine entity-link scoring.

The reference does per-chunk kNN against a per-tag-type faiss ``Flat``
inner-product index over L2-normalized vectors (= cosine)
(/root/reference/word_rep.py:26-38,183-215). Spark-first re-expression:

* the alias bank is a small dimension table → **broadcast** per-type
  normalized numpy matrices (never a shuffle join at corpus scale);
* mention context embeddings are pooled token vectors (A4,
  /root/reference/word_rep.py:92-123 mean/min/max pooling) computed
  inside the same Arrow batch;
* top-k search = one dense matmul per Arrow batch against the broadcast
  matrix (exact cosine; the reference's index is also exact — faiss Flat).

Scale path: if the alias bank outgrows broadcast (~GBs), block by
(tag_type, LSH band) and use the bucketed similarity join in
:mod:`ner_pytorch_spark.operators.similarity` — same semantics.

Self-hit handling mirrors word_rep.py:206-209 (a mention may match its
own surface; keep it — linking WANTS the self hit, unlike adversarial
substitution which drops it; ``drop_self`` restores that semantics).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)


def _l2norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def build_alias_index(aliases: list[dict], pooling: str = "mean") -> dict:
    """tag_type → (normalized matrix [N,d], surfaces, canonical_ids)."""
    by_type: dict[str, dict] = {}
    key = f"emb_{pooling}"
    for tt in sorted({a["tag_type"] for a in aliases}):
        rows = sorted((a for a in aliases if a["tag_type"] == tt),
                      key=lambda a: a["surface"])
        mat = _l2norm(np.asarray([r[key] for r in rows], dtype=np.float32))
        by_type[tt] = {
            "mat": mat,
            "surfaces": [r["surface"] for r in rows],
            "ids": np.asarray([r["canonical_id"] for r in rows], dtype=np.int64),
        }
    return by_type


_CAND_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("sent_id", IntegerType()),
    StructField("mention_id", IntegerType()),
    StructField("surface", StringType()),
    StructField("tag_type", StringType()),
    StructField("rank", IntegerType()),
    StructField("candidate_surface", StringType()),
    StructField("canonical_id", LongType()),
    StructField("score", DoubleType()),
])


def _emit_topk(out_rows: dict, grp, scores: np.ndarray, surfs, ids,
               tt: str, k: int, drop_self: bool) -> None:
    """Shared top-k emission: scores [m, N] → rows appended to out_rows
    (deterministic order: score desc, then index; self-hit optionally
    dropped per word_rep.py:206-209)."""
    kk = min(k + (1 if drop_self else 0), scores.shape[1])
    top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
    for row_pos, (_, mrow) in enumerate(grp.iterrows()):
        cand = top[row_pos]
        cand = cand[np.lexsort((cand, -scores[row_pos, cand]))]
        rank = 0
        for ci in cand:
            if drop_self and surfs[ci] == mrow["surface"]:
                continue
            if rank >= k:
                break
            out_rows["url"].append(mrow["url"])
            out_rows["sent_id"].append(mrow["sent_id"])
            out_rows["mention_id"].append(mrow["mention_id"])
            out_rows["surface"].append(mrow["surface"])
            out_rows["tag_type"].append(tt)
            out_rows["rank"].append(rank)
            out_rows["candidate_surface"].append(surfs[ci])
            out_rows["canonical_id"].append(int(ids[ci]))
            out_rows["score"].append(float(scores[row_pos, ci]))
            rank += 1


def candidate_links(
    mentions: DataFrame,
    aliases: list[dict],
    k: int = 3,
    pooling: str = "mean",
    emb_dim: int = 32,
    drop_self: bool = False,
    farthest: bool = False,
) -> DataFrame:
    """Broadcast-index top-k cosine join: mentions → candidate aliases.

    ``farthest=True`` reproduces the reference's farthest-neighbor query
    trick (negated query vector, word_rep.py:201-202). One matmul per
    (Arrow batch × tag type); no shuffle.
    """
    from ..datagen import token_vector

    spark = mentions.sparkSession
    bc = spark.sparkContext.broadcast(build_alias_index(aliases, pooling))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows: dict[str, list] = {f.name: [] for f in _CAND_SCHEMA.fields}
            for tt, grp in pdf.groupby("tag_type", sort=True):
                entry = index.get(tt)
                if entry is None:
                    continue
                mat, surfs, ids = entry["mat"], entry["surfaces"], entry["ids"]
                # A4 pooling over the mention's token vectors
                q = np.stack([
                    _pool([token_vector(t, emb_dim) for t in s.split(" ")], pooling)
                    for s in grp["surface"]])
                q = _l2norm(q.astype(np.float32))
                if farthest:
                    q = -q
                scores = q @ mat.T  # [m, N]
                _emit_topk(out_rows, grp, scores, surfs, ids, tt, k, drop_self)
            yield pd.DataFrame(out_rows)

    cols = ["url", "sent_id", "mention_id", "surface", "tag_type"]
    return mentions.select(*cols).mapInPandas(run, _CAND_SCHEMA)


def _pool(vecs: list[np.ndarray], pooling: str) -> np.ndarray:
    m = np.stack(vecs)
    if pooling == "mean":
        return m.mean(axis=0)
    if pooling == "min":
        return m.min(axis=0)
    if pooling == "max":
        return m.max(axis=0)
    raise ValueError(pooling)


def contextual_candidate_links(
    mentions: DataFrame,
    tagged: DataFrame,
    aliases: list[dict],
    k: int = 3,
    pooling: str = "mean",
    window: int = 5,
    context_weight: float = 0.5,
    emb_dim: int = 32,
    drop_self: bool = False,
) -> DataFrame:
    """Context-embedding link scoring (M12 shape, north-star wording).

    The query vector pools the mention SURFACE tokens plus (weighted)
    the tokens within ``window`` positions around the span — the
    pooled-GloVe stand-in for the reference's BERT mention-context
    embedding (get_bert_embedding.py:24-36,113-121; A4 pooling). The
    alias side and the top-k broadcast-matrix search are identical to
    :func:`candidate_links`.

    ``tagged`` supplies (url, sent_id, tokens); the join on
    (url, sent_id) is the only shuffle.
    """
    from ..datagen import token_vector

    spark = mentions.sparkSession
    bc = spark.sparkContext.broadcast(build_alias_index(aliases, pooling))

    withtok = mentions.select(
        "url", "sent_id", "mention_id", "surface", "tag_type",
        "start", "end",
    ).join(tagged.select("url", "sent_id", "tokens"), on=["url", "sent_id"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows: dict[str, list] = {f.name: [] for f in _CAND_SCHEMA.fields}
            for tt, grp in pdf.groupby("tag_type", sort=True):
                entry = index.get(tt)
                if entry is None:
                    continue
                mat, surfs, ids = entry["mat"], entry["surfaces"], entry["ids"]
                qs = []
                for _, mrow in grp.iterrows():
                    surf_vecs = [token_vector(t, emb_dim)
                                 for t in mrow["surface"].split(" ")]
                    toks = list(mrow["tokens"])
                    s, e = int(mrow["start"]), int(mrow["end"])
                    ctx = toks[max(0, s - window):s] + toks[e:e + window]
                    q = _pool(surf_vecs, pooling)
                    if ctx and context_weight:
                        q = q + context_weight * _pool(
                            [token_vector(t, emb_dim) for t in ctx], pooling)
                    qs.append(q)
                q = _l2norm(np.stack(qs).astype(np.float32))
                scores = q @ mat.T
                _emit_topk(out_rows, grp, scores, surfs, ids, tt, k, drop_self)
            yield pd.DataFrame(out_rows)

    return withtok.mapInPandas(run, _CAND_SCHEMA)


def link_mentions(candidates: DataFrame) -> DataFrame:
    """Top-1 candidate per mention (deterministic tie-break on surface)."""
    from pyspark.sql import Window

    w = Window.partitionBy("url", "sent_id", "mention_id").orderBy(
        F.desc("score"), F.asc("candidate_surface"))
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "rank")
    )
