"""HTML→text extractor: goldens + byte-identity under repartitioning
(the north-rule per-row invariant, evidenced at two parallelism levels)."""

from ner_pytorch_spark.functions.extraction import extract_text


def test_basic_extraction():
    html = (b"<html><head><title>T</title><script>var x=1;</script>"
            b"<style>p{}</style></head>"
            b"<body><p>Hello world .</p><p>Second line .</p>"
            b"<!-- comment --></body></html>")
    assert extract_text(html) == "T\nHello world .\nSecond line ."


def test_entities_and_nesting():
    html = b"<p>A &amp; B &lt;tag&gt; <b>bold</b> &nbsp; x</p>"
    assert extract_text(html) == "A & B <tag> bold x"


def test_non_ascii():
    html = "<p>café résumé</p>".encode("utf-8")
    assert extract_text(html) == "café résumé"


def test_deterministic_pure():
    html = b"<p>same input</p>"
    assert extract_text(html) == extract_text(html) == extract_text(bytes(html))


def test_byte_identity_under_repartitioning():
    """Same corpus, two parallelism levels + shuffles → identical text
    per url (pure function of html only)."""
    from ner_pytorch_spark import datagen
    from ner_pytorch_spark.functions.extraction import extract_text_udf
    from ner_pytorch_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="extract8", cores=8, shuffle_partitions=8)
    pages = datagen.pages_dataframe(spark, 60)

    def extracted(df, parts):
        out = (df.repartition(parts, "url")
               .withColumn("re_text", extract_text_udf(F.col("html")))
               .select("url", "re_text").collect())
        return {r.url: r.re_text for r in out}

    a = extracted(pages, 3)
    b = extracted(pages, 17)
    gold = {p["url"]: p["text"] for p in datagen.generate_pages(60)[0]}
    assert a == b == gold


def test_spark_udf_matches_pure(spark):
    from pyspark.sql import functions as F

    from ner_pytorch_spark.functions.extraction import extract_text_udf

    payloads = [b"<p>x</p>", b"<div>a<br>b</div>", b"", b"plain"]
    df = spark.createDataFrame([(p,) for p in payloads], "html binary")
    got = [r[0] for r in df.select(extract_text_udf(F.col("html"))).collect()]
    assert got == [extract_text(p) for p in payloads]
