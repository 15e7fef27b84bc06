"""A1-A3 — vocabulary construction as native Spark aggregations.

Reference semantics:
  * frequency dico        — /root/reference/utils.py:44-56
  * min-count-3 + PAD/UNK — /root/reference/loader.py:69-84
    (<PAD> pinned freq 10000001, <UNK> 10000000)
  * rank-by-frequency ids — /root/reference/utils.py:59-67 with the
    deterministic (-freq, token) tie-break at utils.py:64 — the only
    window function shape in the reference, load-bearing for parity.

All JVM-side: explode → groupBy().count() gets partial (map-side)
aggregation from Catalyst for free; the ranking window is a single
global sort over the (small) distinct-token set, not over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAD, UNK = "<PAD>", "<UNK>"
PAD_FREQ, UNK_FREQ = 10_000_001, 10_000_000


def token_frequencies(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """A1: corpus-wide token counts → (token, freq)."""
    return (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def build_vocab(
    df: DataFrame,
    tokens_col: str = "tokens",
    min_count: int = 3,
    lowercase: bool = True,
    zeros: bool = True,
    add_sentinels: bool = True,
) -> DataFrame:
    """A1+A2+A3 → (token, id, freq) with deterministic ids.

    Word-path normalization per the reference word vocab
    (loader.py:69-84): lowercase (loader.py:135-137) and digit-fold
    (utils.py:70-74) BEFORE counting; ids dense-ranked by
    (freq desc, token asc).
    """
    toks = df.select(F.explode(tokens_col).alias("token"))
    if lowercase:
        toks = toks.select(F.lower("token").alias("token"))
    if zeros:
        toks = toks.select(F.regexp_replace("token", "[0-9]", "0").alias("token"))
    freqs = (
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
    )
    if add_sentinels:
        sentinels = freqs.sparkSession.createDataFrame(
            [(PAD, PAD_FREQ), (UNK, UNK_FREQ)], "token string, freq long")
        freqs = freqs.filter(~F.col("token").isin(PAD, UNK)).unionByName(sentinels)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return freqs.select("token", (F.row_number().over(w) - 1).alias("id"), "freq")


def char_vocab(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Char-level vocab (loader.py:87-97): chars keep case; OOV chars
    are later DROPPED (loader.py:138), not UNK'd — so no UNK sentinel."""
    chars = (
        df.select(F.explode(tokens_col).alias("token"))
        .select(F.explode(F.split("token", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("ch").agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("ch"))
    return chars.select(
        F.col("ch").alias("token"), (F.row_number().over(w) - 1).alias("id"), "freq")
