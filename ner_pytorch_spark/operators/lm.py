"""M11 — corpus-trained language-model perplexity, fully relational.

The reference scores candidate sentences with GPT-2 perplexity
(/root/reference/perplexity_est.py:27-67). No transformer ships in this
sandbox; the in-engine default is an INTERPOLATED BIGRAM model trained
on the corpus itself — and unlike the python surprisal proxies in
:mod:`ner_pytorch_spark.operators.advgen`, this one is the 100 TB
shape end-to-end:

* n-gram training is two ``groupBy().count()`` aggregations (map-side
  partial combine; never a driver collect);
* scoring joins each document's (prev, word) pairs against the count
  tables with plain EQUI-JOINS — no broadcast of a web-scale
  vocabulary, AQE handles the skewed stop-word keys;
* the per-document log-prob sum is a SEQUENTIAL LEFT FOLD over the
  positions array (``F.aggregate``), which both makes the result
  partitioning-invariant and lets DuckDB replay it exactly
  (``list_aggregate(..., 'sum')``) — the perplexity query is
  hash-checked by the driver, promoting M11 from "python stand-in"
  to a value-verified operator.

p(w | prev) = λ2·c(prev,w)/c(prev) + λ1·c(w)/N + λ0/V
ppl(doc)    = exp(−mean log p over positions 1..len−1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_lower


def bigram_pairs(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, pos, prev, w): in-order adjacent token pairs, built
    row-locally from shifted array slices (no self-join)."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens_lower(text_col).alias("t"))
    pairs = toks.select(
        "doc_id",
        F.posexplode(F.when(F.size("t") >= 2, F.expr(
            "transform(sequence(2, size(t)), i -> struct(t[i-2] as prev, t[i-1] as w))"
        )).otherwise(F.array())).alias("pos", "pw"))
    return pairs.select("doc_id", "pos",
                        F.col("pw.prev").alias("prev"),
                        F.col("pw.w").alias("w"))


def train_bigram_lm(docs: DataFrame, text_col: str = "text") -> dict:
    """→ {'uni': (w, cu) DF, 'bi': (prev, w, cb) DF, 'n': long, 'v': long}.

    Pure distributed aggregation; the count tables stay DataFrames (at
    corpus scale they are joined, never collected)."""
    toks = docs.select(F.explode(tokens_lower(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    stats = uni.agg(F.sum("cu").alias("n"),
                    F.count(F.lit(1)).alias("v")).first()
    bi = (bigram_pairs(docs, text_col)
          .groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cb")))
    return {"uni": uni, "bi": bi, "n": int(stats["n"]), "v": int(stats["v"])}


def doc_perplexity(docs: DataFrame, lm: dict | None = None,
                   text_col: str = "text", id_col: str = "doc_id",
                   l2: float = 0.7, l1: float = 0.25) -> DataFrame:
    """→ (doc_id, n_scored, ppl): interpolated-bigram perplexity per doc.

    ``lm=None`` trains on ``docs`` itself (corpus self-perplexity — the
    fluency ranking shape of perplexity_est.py). Documents with < 2
    tokens have no scored positions and are omitted (same contract as
    the reference, which needs at least one context token).
    """
    lm = lm or train_bigram_lm(docs, text_col)
    l0 = 1.0 - l2 - l1
    n_total, vocab = float(lm["n"]), float(lm["v"])
    pairs = bigram_pairs(docs, text_col, id_col)
    scored = (
        pairs
        .join(lm["uni"].select(F.col("w").alias("prev"),
                               F.col("cu").alias("c_prev")),
              on="prev", how="left")
        .join(lm["uni"], on="w", how="left")
        .join(lm["bi"], on=["prev", "w"], how="left")
        .select(
            "doc_id", "pos",
            F.log(
                F.lit(l2) * F.coalesce(F.col("cb"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("c_prev"), F.lit(0)), F.lit(1))
                .cast("double")
                + F.lit(l1) * F.coalesce(F.col("cu"), F.lit(0)).cast("double")
                / F.lit(n_total)
                + F.lit(l0 / vocab)).alias("logp"))
    )
    # sequential left fold over positions → partitioning-invariant sum
    return (
        scored.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "logp")))
             .alias("ps"))
        .select(
            "doc_id",
            F.size("ps").alias("n_scored"),
            F.round(F.exp(
                -F.aggregate(F.col("ps"), F.lit(0.0),
                             lambda acc, s: acc + s["logp"])
                / F.size("ps")), 6).alias("ppl"))
    )
