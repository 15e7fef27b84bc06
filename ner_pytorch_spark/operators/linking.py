"""J4/A4/M12 — candidate generation + cosine entity-link scoring.

The reference does per-chunk kNN against a per-tag-type faiss ``Flat``
inner-product index over L2-normalized vectors (= cosine)
(/root/reference/word_rep.py:26-38,183-215). Spark-first re-expression:

* the alias bank is a small dimension table → **broadcast** per-type
  normalized numpy matrices (never a shuffle join at corpus scale);
* mention context embeddings are pooled token vectors (A4,
  /root/reference/word_rep.py:92-123 mean/min/max pooling) computed
  inside the same Arrow batch; token vectors come from a pluggable
  provider (:mod:`ner_pytorch_spark.functions.embeddings`) — pass a
  ``MatrixEmbedder`` assembled from the GloVe scan for the reference's
  real-vector semantics (train.py:122-134); the default hash-vector
  fallback is only meaningful for exact-surface matching;
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


def build_alias_index(aliases: list[dict], pooling: str = "mean",
                      embedder=None) -> dict:
    """tag_type → (normalized matrix [N,d], surfaces, canonical_ids,
    max_dup).

    Alias embeddings come from the rows' precomputed ``emb_<pooling>``
    columns, or — when ``embedder`` is given — are pooled from the
    surface tokens with the SAME provider the query side uses (the two
    sides must share one embedding space or cosine is meaningless).
    ``max_dup`` = the largest number of alias rows sharing one surface
    within the type; ``_emit_topk`` widens its self-hit skip allowance
    by it (one reserved slot under-retrieves when a surface maps to
    several canonical ids).
    """
    by_type: dict[str, dict] = {}
    key = f"emb_{pooling}"
    for tt in sorted({a["tag_type"] for a in aliases}):
        rows = sorted((a for a in aliases if a["tag_type"] == tt),
                      key=lambda a: a["surface"])
        if embedder is not None:
            vecs = [_pool([embedder.vec(t) for t in r["surface"].split(" ")],
                          pooling) for r in rows]
            # dtype-preserving: a float64 embedder keeps scoring in
            # double end-to-end (oracle precision for near-tie ranks)
            mat = _l2norm(np.asarray(vecs))
        else:
            mat = _l2norm(np.asarray([r[key] for r in rows], dtype=np.float32))
        surfaces = [r["surface"] for r in rows]
        counts: dict[str, int] = {}
        for s in surfaces:
            counts[s] = counts.get(s, 0) + 1
        by_type[tt] = {
            "mat": mat,
            "surfaces": surfaces,
            "ids": np.asarray([r["canonical_id"] for r in rows], dtype=np.int64),
            "max_dup": max(counts.values()),
        }
    return by_type


def _default_embedder(dim: int = 32):
    from ..functions.embeddings import HashEmbedder

    return HashEmbedder(dim)


def _resolve_alias_embedder(aliases, pooling, embedder, fallback):
    """Alias-side embedding source, shared by both linking operators:
    an explicit provider wins; otherwise precomputed ``emb_<pooling>``
    columns are used when present, else the query-side fallback (the two
    sides must share one embedding space). Empty alias lists resolve to
    None (build_alias_index returns an empty index)."""
    if embedder is not None:
        return embedder
    if aliases and f"emb_{pooling}" not in aliases[0]:
        return fallback
    return None


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


def _emit_topk(out_rows: dict, grp, scores: np.ndarray, entry: dict,
               tt: str, k: int, drop_self: bool) -> None:
    """Shared top-k emission: scores [m, N] → rows appended to out_rows
    (deterministic order: score desc, then index; self-hit optionally
    dropped per word_rep.py:206-209).

    Vectorized: group columns are pulled out ONCE as python lists (the
    round-1 per-mention ``grp.iterrows()`` was the slowest per-row code
    left in the hot tail), and the retrieval widens by ``max_dup`` — the
    worst-case number of same-surface alias rows a self-hit skip can
    consume within this tag type — so ``drop_self`` can never starve a
    mention below k candidates.
    """
    surfs, ids = entry["surfaces"], entry["ids"]
    # round-then-widen-ties, like broadcast_topk: rank by the ROUNDED
    # score (the oracle's comparison key) and include every candidate
    # tied with the kk-th so exact ties never get cut arbitrarily
    scores = np.round(scores, 6)
    kk = min(k + (entry["max_dup"] if drop_self else 0), scores.shape[1])
    part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
    urls = grp["url"].tolist()
    sids = grp["sent_id"].tolist()
    mids = grp["mention_id"].tolist()
    msurfs = grp["surface"].tolist()
    for row_pos in range(scores.shape[0]):
        cut = scores[row_pos, part[row_pos]].min()
        cand = np.flatnonzero(scores[row_pos] >= cut)
        cand = cand[np.lexsort((cand, -scores[row_pos, cand]))]
        msurf = msurfs[row_pos]
        rank = 0
        for ci in cand:
            if drop_self and surfs[ci] == msurf:
                continue
            if rank >= k:
                break
            out_rows["url"].append(urls[row_pos])
            out_rows["sent_id"].append(sids[row_pos])
            out_rows["mention_id"].append(mids[row_pos])
            out_rows["surface"].append(msurf)
            out_rows["tag_type"].append(tt)
            out_rows["rank"].append(rank)
            out_rows["candidate_surface"].append(surfs[ci])
            out_rows["canonical_id"].append(int(ids[ci]))
            out_rows["score"].append(float(scores[row_pos, ci]))
            rank += 1


def _surface_vectors(surfaces, embedder, pooling: str,
                     cache: dict) -> np.ndarray:
    """Pooled query vector per surface, computed ONCE per unique surface
    (mentions repeat surfaces heavily — the memoization removes most of
    the per-mention python work)."""
    out = []
    for s in surfaces:
        v = cache.get(s)
        if v is None:
            v = _pool([embedder.vec(t) for t in s.split(" ")], pooling)
            cache[s] = v
        out.append(v)
    return np.stack(out)


def candidate_links(
    mentions: DataFrame,
    aliases: list[dict],
    k: int = 3,
    pooling: str = "mean",
    emb_dim: int = 32,
    drop_self: bool = False,
    farthest: bool = False,
    embedder=None,
) -> DataFrame:
    """Broadcast-index top-k cosine join: mentions → candidate aliases.

    ``embedder`` is the REAL-vector seam (train.py:122-134 semantics):
    pass :class:`~ner_pytorch_spark.functions.embeddings.MatrixEmbedder`
    built from the GloVe scan to score mentions and aliases in the
    pretrained space; ``None`` falls back to deterministic hash vectors
    (only exact-surface self-hits are meaningful there — fine for the
    synthetic-corpus gates, not a semantic space).

    ``farthest=True`` reproduces the reference's farthest-neighbor query
    trick (negated query vector, word_rep.py:201-202). One matmul per
    (Arrow batch × tag type); no shuffle.
    """
    spark = mentions.sparkSession
    emb = embedder or _default_embedder(emb_dim)
    bc = spark.sparkContext.broadcast({
        "index": build_alias_index(
            aliases, pooling, _resolve_alias_embedder(aliases, pooling,
                                                      embedder, emb)),
        "embedder": emb,
    })

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index, emb_ = bc.value["index"], bc.value["embedder"]
        cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows: dict[str, list] = {f.name: [] for f in _CAND_SCHEMA.fields}
            for tt, grp in pdf.groupby("tag_type", sort=True):
                entry = index.get(tt)
                if entry is None:
                    continue
                # A4 pooling over the mention's token vectors
                q = _surface_vectors(grp["surface"], emb_, pooling, cache)
                q = _l2norm(q.astype(entry["mat"].dtype))
                if farthest:
                    q = -q
                scores = q @ entry["mat"].T  # [m, N]
                _emit_topk(out_rows, grp, scores, entry, tt, k, drop_self)
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
    embedder=None,
) -> DataFrame:
    """Context-embedding link scoring (M12 shape, north-star wording).

    The query vector pools the mention SURFACE tokens plus (weighted)
    the tokens within ``window`` positions around the span — with a
    :class:`~ner_pytorch_spark.functions.embeddings.MatrixEmbedder` this
    is the pooled-GloVe analogue of the reference's BERT mention-context
    embedding (get_bert_embedding.py:24-36,113-121; A4 pooling). The
    alias side and the top-k broadcast-matrix search are identical to
    :func:`candidate_links`.

    ``tagged`` supplies (url, sent_id, tokens); the join on
    (url, sent_id) is the only shuffle.
    """
    spark = mentions.sparkSession
    emb = embedder or _default_embedder(emb_dim)
    bc = spark.sparkContext.broadcast({
        "index": build_alias_index(
            aliases, pooling, _resolve_alias_embedder(aliases, pooling,
                                                      embedder, emb)),
        "embedder": emb,
    })

    withtok = mentions.select(
        "url", "sent_id", "mention_id", "surface", "tag_type",
        "start", "end",
    ).join(tagged.select("url", "sent_id", "tokens"), on=["url", "sent_id"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        index, emb_ = bc.value["index"], bc.value["embedder"]
        tok_cache: dict[str, np.ndarray] = {}

        def tv(t: str) -> np.ndarray:
            v = tok_cache.get(t)
            if v is None:
                v = emb_.vec(t)
                tok_cache[t] = v
            return v

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_rows: dict[str, list] = {f.name: [] for f in _CAND_SCHEMA.fields}
            for tt, grp in pdf.groupby("tag_type", sort=True):
                entry = index.get(tt)
                if entry is None:
                    continue
                qs = []
                # plain-list iteration (iterrows was the per-row hot spot)
                for msurf, toks, s, e in zip(
                        grp["surface"].tolist(), grp["tokens"].tolist(),
                        grp["start"].tolist(), grp["end"].tolist()):
                    surf_vecs = [tv(t) for t in msurf.split(" ")]
                    toks = list(toks)
                    s, e = int(s), int(e)
                    ctx = toks[max(0, s - window):s] + toks[e:e + window]
                    q = _pool(surf_vecs, pooling)
                    if ctx and context_weight:
                        q = q + context_weight * _pool([tv(t) for t in ctx],
                                                       pooling)
                    qs.append(q)
                q = _l2norm(np.stack(qs).astype(entry["mat"].dtype))
                scores = q @ entry["mat"].T
                _emit_topk(out_rows, grp, scores, entry, tt, k, drop_self)
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
