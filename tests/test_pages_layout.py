"""Day-partitioned pages layout: pruning happens at plan time."""

import re

from ner_pytorch_spark import datagen
from ner_pytorch_spark.sources.pages import read_pages, write_pages_partitioned


def _plan(df):
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_partition_pruning(spark, tmp_path):
    pages = datagen.pages_dataframe(spark, 200)
    path = str(tmp_path / "pages")
    write_pages_partitioned(pages, path)

    full = read_pages(spark, path)
    pruned = read_pages(spark, path, since="2024-02-01", until="2024-03-01")
    n_full, n_pruned = full.count(), pruned.count()
    assert 0 < n_pruned < n_full

    plan = _plan(pruned)
    # dt filters appear as PartitionFilters on the scan, not data Filters
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dt" in m.group(1), plan[:2000]

    # row-level equivalence with a post-hoc filter
    from pyspark.sql import functions as F
    expected = (pages.withColumn("dt", F.date_format("warc_ts", "yyyy-MM-dd"))
                .filter((F.col("dt") >= "2024-02-01") & (F.col("dt") < "2024-03-01"))
                .count())
    assert n_pruned == expected


def test_incremental_processing_equals_full(spark, tmp_path):
    """Process days < D, then incrementally process days >= D; the union
    of mention outputs equals one full run (snapshot-incremental
    semantics on the day-partitioned layout)."""
    from ner_pytorch_spark import datagen
    from ner_pytorch_spark.operators.spans import mentions_table
    from ner_pytorch_spark.operators.tagger import sentences_table, tag_sentences
    from ner_pytorch_spark.sources.pages import incremental_pages

    pages = datagen.pages_dataframe(spark, 120)
    path = str(tmp_path / "pages")
    write_pages_partitioned(pages, path)
    aliases = datagen.alias_rows()

    def mentions_of(df):
        return sorted(map(tuple, mentions_table(
            tag_sentences(sentences_table(df), mode="gazetteer",
                          aliases=aliases)).collect()))

    cutoff = "2024-02-15"
    first = read_pages(spark, path, until=cutoff)
    rest = incremental_pages(spark, path, cutoff)
    assert first.count() + rest.count() == pages.count()
    combined = sorted(mentions_of(first) + mentions_of(rest))
    full = mentions_of(read_pages(spark, path))
    assert combined == full
