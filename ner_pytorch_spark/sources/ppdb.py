"""S4/J5 — PPDB paraphrase scan + phrase lookup.

Reference semantics (/root/reference/ppdb.py:36-76): parse
``|||``-delimited rows, keep the ``Equivalence`` relation only, filter
both phrases to the vocab, drop stem-identical pairs, and insert
BIDIRECTIONAL edges (ppdb.py:72-73) — i.e. a symmetric union. The
greedy bigram-then-unigram lookup (ppdb.py:85-100) contains a latent
bug at ppdb.py:89 (the "bigram" concatenates ``tokens[idx]`` with
itself); we implement the INTENDED semantics (token i + token i+1) and
document the divergence rather than replicating the bug (SURVEY §2.3 J5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_ppdb(
    spark: SparkSession, path: str, vocab: DataFrame | None = None,
    stem_filter: bool = False,
) -> DataFrame:
    """→ symmetric (phrase, paraphrase) edge table, Equivalence only.

    ``stem_filter=True`` drops pairs whose Snowball-English stems are
    EQUAL — the reference's inflectional-variant prefilter
    (ppdb.py:20,67: ``stemmer.stem(phrase) == stemmer.stem(paraphrase)``
    skips the pair; note it stems the whole phrase string as one
    token). Runs through the in-repo pure-python Porter2
    (:mod:`ner_pytorch_spark.functions.stemming`) in one Arrow pass
    over the (dimension-sized) edge table. Off by default so the
    oracle-checked paraphrase queries (whose DuckDB twin has no
    stemmer) keep their exact replay; parity deployments pass True.
    """
    rows = (
        spark.read.text(path)
        .select(F.split("value", r"\s*\|\|\|\s*").alias("f"))
        .filter(F.size("f") >= 6)
        .select(
            F.trim(F.col("f")[1]).alias("phrase"),
            F.trim(F.col("f")[2]).alias("paraphrase"),
            F.trim(F.element_at("f", -1)).alias("relation"))
        .filter(F.col("relation") == "Equivalence")
        .filter(F.col("phrase") != F.col("paraphrase"))
    )
    if vocab is not None:
        v = F.broadcast(vocab.select(F.col("token").alias("_v")))
        # left_semi membership filters (ppdb.py:50-65)
        rows = (
            rows.join(v, rows["phrase"] == F.col("_v"), "left_semi")
            .join(v, rows["paraphrase"] == F.col("_v"), "left_semi")
        )
    if stem_filter:
        from pyspark.sql.functions import pandas_udf

        from ..functions.stemming import snowball_stem

        @pandas_udf("string")
        def _stem(s):
            return s.map(snowball_stem)

        rows = rows.filter(_stem("phrase") != _stem("paraphrase"))
    sym = rows.select("phrase", "paraphrase").union(
        rows.select(F.col("paraphrase").alias("phrase"),
                    F.col("phrase").alias("paraphrase")))
    return sym.distinct()


def paraphrase_ngram_lookup(
    sentences: DataFrame, ppdb: DataFrame, max_n: int = 2,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Relational n-gram paraphrase match (J5, bug-fixed semantics).

    Explode token n-grams (longest n first wins per start position via
    a window dedup), broadcast-join against the paraphrase edges.
    Output: (url, sent_id, start, n, phrase, paraphrase).
    """
    from pyspark.sql import Window

    grams = None
    for n in range(max_n, 0, -1):
        # Guard short sentences: size-n < 0 would make sequence(0, -1)
        # DESCEND ([0, -1], Spark's default step is -1 when start > stop)
        # and the transform's slice(tokens, 0, n) then throws
        # INVALID_PARAMETER_VALUE.START — so sentences with fewer than n
        # tokens yield an empty gram array instead.
        g = sentences.select(
            "url", "sent_id",
            F.posexplode(
                F.when(
                    F.size(tokens_col) >= n,
                    F.transform(
                        F.sequence(F.lit(0), F.size(tokens_col) - n),
                        lambda i: F.array_join(F.slice(tokens_col, i + 1, n), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))).alias("start", "phrase"),
        ).withColumn("n", F.lit(n)).filter(F.size(F.split("phrase", " ")) == n)
        grams = g if grams is None else grams.unionByName(g)
    hits = grams.join(F.broadcast(ppdb), on="phrase", how="inner")
    # longest-match-first per (sentence, start): greedy semantics
    w = Window.partitionBy("url", "sent_id", "start").orderBy(F.desc("n"), "paraphrase")
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1).drop("rn")
        .select("url", "sent_id", "start", "n", "phrase", "paraphrase")
    )
