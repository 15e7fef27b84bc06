"""S2/S3 — GloVe embedding-file scan + vocab augmentation join (J1/J2).

Reference semantics: parse ``word v1..v<dim>`` text keeping only rows
with exactly dim+1 fields (/root/reference/train.py:122-126); the
pretrained vocab is the first token of each line
(/root/reference/loader.py:189-193); vocab augmentation adds dev/test
words that match the pretrained set directly, lowercased, or
digit-folded-lowercased (/root/reference/loader.py:177-212) — a
broadcast left join with a 3-key coalesce fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_glove(spark: SparkSession, path: str, dim: int = 100) -> DataFrame:
    """→ (token, vector array<double>); malformed rows dropped."""
    return (
        spark.read.text(path)
        .select(F.split(F.trim("value"), " ").alias("f"))
        .filter(F.size("f") == dim + 1)  # train.py:124-125 contract
        .select(
            F.col("f")[0].alias("token"),
            F.transform(F.slice("f", 2, dim),
                        lambda x: x.cast("double")).alias("vector"))
    )


def pretrained_vocab(glove: DataFrame) -> DataFrame:
    """S3: distinct first tokens (loader.py:189-193)."""
    return glove.select("token").distinct()


def augment_with_pretrained(
    vocab: DataFrame, pretrained: DataFrame, words: DataFrame | None = None,
) -> DataFrame:
    """J1: add pretrained words to the vocab.

    ``words=None`` → add ALL pretrained words (the reference's
    ``all_emb`` path); else add only words (e.g. dev/test tokens) whose
    direct / lowercase / digit-folded-lowercase form is pretrained
    (loader.py:199-208). Output: (token) distinct union.
    """
    if words is None:
        extra = pretrained.select("token")
    else:
        p = F.broadcast(pretrained.withColumnRenamed("token", "p_token"))
        w = words.select(F.col("token").alias("w")).distinct()
        matched = (
            w.join(p, F.col("w") == F.col("p_token"), "left")
            .withColumnRenamed("p_token", "m1")
            .join(p, F.lower(F.col("w")) == F.col("p_token"), "left")
            .withColumnRenamed("p_token", "m2")
            .join(p, F.regexp_replace(F.lower(F.col("w")), "[0-9]", "0")
                  == F.col("p_token"), "left")
            .withColumnRenamed("p_token", "m3")
            .filter(F.coalesce("m1", "m2", "m3").isNotNull())
            .select(F.col("w").alias("token"))
        )
        extra = matched
    return vocab.select("token").unionByName(extra).distinct()


def embedding_matrix_rows(vocab: DataFrame, glove: DataFrame) -> DataFrame:
    """J2: per-vocab-token vector with lowercase fallback; tokens with no
    match get a null vector (random-init happens at weight-load time,
    train.py:128-134 — randomness stays OUT of the relational layer)."""
    g = F.broadcast(glove)
    direct = vocab.join(g, on="token", how="left").withColumnRenamed("vector", "v1")
    lower = (
        direct.join(
            g.select(F.col("token").alias("lt"), F.col("vector").alias("v2")),
            F.lower(direct["token"]) == F.col("lt"), "left")
        .drop("lt")
    )
    return lower.select("token", F.coalesce("v1", "v2").alias("vector"))
