"""S1 — CoNLL token-file scan: lines → sentences, fully relational.

Reference semantics (/root/reference/loader.py:21-42): whitespace-split
token lines; blank lines delimit sentences; ``-DOCSTART-`` rows dropped;
optional digit→0 fold; every kept line must have ≥2 fields
(loader.py:37 assert → here a filter + bad-record count).

Spark shape (SURVEY §2.1 S1): the blank-line sentence grouping is a
cumulative sum of blank markers over a line-ordered window — the
classic session-segmentation pattern. For a single CoNLL file the
window is global (these files are small dimension inputs, ≤10^5
lines); corpus-scale text arrives via the pages table instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_sentences(
    spark: SparkSession, path: str,
    zeros: bool = True, lower: bool = False,
) -> DataFrame:
    """→ (sent_id, tokens array<string>, tags array<string>).

    tokens = column 0 of each line, tags = last column (the reference
    uses only cols 0 and −1, loader.py:73,104). ``lower``/``zeros``
    mirror loader.py:29,135 normalization toggles.
    """
    lines = (
        spark.read.text(path)
        .select(F.monotonically_increasing_id().alias("line_id"), "value")
        .withColumn("value", F.trim("value"))
    )
    w = Window.orderBy("line_id")
    marked = lines.withColumn(
        "sent_id",
        F.sum(F.when(F.col("value") == "", 1).otherwise(0)).over(w))
    toks = (
        marked.filter(F.col("value") != "")
        .filter(~F.col("value").startswith("-DOCSTART-"))
        .withColumn("fields", F.split("value", r"\s+"))
        .filter(F.size("fields") >= 2)  # loader.py:37 contract
        .withColumn("word", F.col("fields")[0])
        .withColumn("tag", F.element_at("fields", -1))
    )
    if zeros:
        toks = toks.withColumn("word", F.regexp_replace("word", "[0-9]", "0"))
    if lower:
        toks = toks.withColumn("word", F.lower("word"))
    grouped = (
        toks.groupBy("sent_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("line_id", "word", "tag"))).alias("rows"))
        .select(
            "sent_id",
            F.transform("rows", lambda r: r["word"]).alias("tokens"),
            F.transform("rows", lambda r: r["tag"]).alias("tags"))
    )
    # re-densify sentence ids (blank-run gaps) deterministically
    w2 = Window.orderBy("sent_id")
    return grouped.withColumn("sent_id", F.row_number().over(w2) - 1)
