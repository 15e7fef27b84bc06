"""A5-A7/A10 — chunk-level evaluation as Spark aggregations.

The reference's oracle is conlleval (/root/reference/conlleval.py):
chunk-level precision/recall/F1 per entity type plus overall, computed
by a sequential chunk-boundary scan. Spark shape (SURVEY §2.4 A5): a
per-sentence pandas UDF emits (type, n_correct, n_true, n_pred) count
rows — reusing the same span extractor as mention detection — then
plain ``groupBy().sum()`` and column arithmetic produce the metrics.
Confusion matrix (A10, /root/reference/train.py:221,253) is a native
``groupBy(true_tag, pred_tag).count()``.

Micro/macro accuracy + attack hit rate mirror
/root/reference/adv_example_eval.py:196-215.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from .spans import extract_spans

_COUNT_SCHEMA = ArrayType(StructType([
    StructField("tag_type", StringType()),
    StructField("n_correct", LongType()),
    StructField("n_true", LongType()),
    StructField("n_pred", LongType()),
]))


@F.pandas_udf(_COUNT_SCHEMA)
def _chunk_counts_udf(gold: pd.Series, pred: pd.Series) -> pd.Series:
    out = []
    for g, p in zip(gold, pred):
        g = [] if g is None else list(g)
        p = [] if p is None else list(p)
        gs = {(s["start"], s["end"], s["tag_type"]) for s in extract_spans(g)}
        ps = {(s["start"], s["end"], s["tag_type"]) for s in extract_spans(p)}
        types = sorted({t for _, _, t in gs | ps})
        rows = []
        for t in types:
            gt = {x for x in gs if x[2] == t}
            pt = {x for x in ps if x[2] == t}
            rows.append((t, len(gt & pt), len(gt), len(pt)))
        out.append(rows)
    return pd.Series(out)


def chunk_prf(tagged: DataFrame, gold_col: str = "gold_tags",
              pred_col: str = "pred_tags") -> DataFrame:
    """Per-type + OVERALL chunk precision/recall/F1.

    Input: one row per sentence with gold/pred tag arrays.
    Output: (tag_type, n_correct, n_true, n_pred, precision, recall, f1)
    with an 'OVERALL' row (micro-averaged, conlleval.py:85-96).
    """
    counts = (
        tagged
        .select(F.explode(_chunk_counts_udf(F.col(gold_col), F.col(pred_col))).alias("c"))
        .select("c.tag_type", "c.n_correct", "c.n_true", "c.n_pred")
    )
    per_type = counts.groupBy("tag_type").agg(
        F.sum("n_correct").alias("n_correct"),
        F.sum("n_true").alias("n_true"),
        F.sum("n_pred").alias("n_pred"))
    overall = per_type.agg(
        F.lit("OVERALL").alias("tag_type"),
        F.sum("n_correct").alias("n_correct"),
        F.sum("n_true").alias("n_true"),
        F.sum("n_pred").alias("n_pred"))
    both = per_type.unionByName(overall)
    prec = F.when(F.col("n_pred") > 0, F.col("n_correct") / F.col("n_pred")).otherwise(F.lit(0.0))
    rec = F.when(F.col("n_true") > 0, F.col("n_correct") / F.col("n_true")).otherwise(F.lit(0.0))
    return (
        both.withColumn("precision", F.round(prec, 6))
        .withColumn("recall", F.round(rec, 6))
        .withColumn("f1", F.round(
            F.when((F.col("precision") + F.col("recall")) > 0,
                   2 * F.col("precision") * F.col("recall")
                   / (F.col("precision") + F.col("recall"))).otherwise(F.lit(0.0)), 6))
    )


def confusion_matrix(tagged: DataFrame, gold_col: str = "gold_tags",
                     pred_col: str = "pred_tags") -> DataFrame:
    """A10: token-level (gold_tag, pred_tag, n) counts — fully native."""
    pairs = tagged.select(
        F.explode(F.arrays_zip(F.col(gold_col), F.col(pred_col))).alias("z"))
    return (
        pairs.select(F.col("z")[gold_col].alias("gold_tag"),
                     F.col("z")[pred_col].alias("pred_tag"))
        .groupBy("gold_tag", "pred_tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def adv_eval_metrics(tagged: DataFrame, gold_col: str = "gold_tags",
                     pred_col: str = "pred_tags") -> DataFrame:
    """A7: micro accuracy over non-O tokens, macro per-sentence accuracy,
    and flip (attack-hit) rate — adv_example_eval.py:196-215 semantics.

    micro_acc  = Σ correct non-O tokens / Σ non-O tokens
    macro_acc  = avg over sentences of per-sentence non-O accuracy
                 (sentences with no non-O gold tokens excluded)
    hit_rate   = fraction of sentences with ≥1 wrong non-O token
    """
    z = F.arrays_zip(F.col(gold_col), F.col(pred_col))
    non_o = F.filter(z, lambda s: s[gold_col] != "O")
    n_non_o = F.size(non_o)
    n_correct = F.size(F.filter(non_o, lambda s: s[gold_col] == s[pred_col]))
    per_sent = tagged.select(
        n_non_o.alias("n_non_o"), n_correct.alias("n_correct"),
        (n_non_o > n_correct).cast("int").alias("any_flip"))
    scored = per_sent.filter(F.col("n_non_o") > 0)
    return scored.agg(
        F.round(F.sum("n_correct") / F.sum("n_non_o"), 6).alias("micro_acc"),
        F.round(F.avg(F.col("n_correct") / F.col("n_non_o")), 6).alias("macro_acc"),
        F.round(F.avg("any_flip"), 6).alias("hit_rate"),
        F.count(F.lit(1)).alias("n_sentences"))
