"""URL canonicalization: re-crawl variants collapse to one key."""

from pyspark.sql import functions as F

from ner_pytorch_spark.functions.urlnorm import normalize_url


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.n for r in
            df.select(normalize_url(F.col("url")).alias("n")).collect()]


def test_variants_collapse(spark):
    variants = [
        "HTTP://WWW.Example.COM:80/a/B?utm_source=x&b=2&a=1#frag",
        "http://www.example.com/a/B?a=1&b=2",
        "http://www.example.com:80/a/B#other",       # no query
    ]
    got = _norm(spark, variants)
    assert got[0] == got[1] == "http://www.example.com/a/B?a=1&b=2"
    assert got[2] == "http://www.example.com/a/B"


def test_rules_individually(spark):
    cases = {
        # scheme + host lowercase; PATH case preserved
        "HTTPS://Sub.Example.Org/CaseSensitive":
            "https://sub.example.org/CaseSensitive",
        # default port per scheme; non-default kept
        "https://h.com:443/x": "https://h.com/x",
        "https://h.com:8443/x": "https://h.com:8443/x",
        "http://h.com:443/x": "http://h.com:443/x",
        # empty path → /
        "http://h.com": "http://h.com/",
        # tracking params dropped, rest sorted; all-tracking query
        # loses its '?'
        "http://h.com/p?z=1&utm_campaign=c&a=2&gclid=g&fbclid=f&ref=r":
            "http://h.com/p?a=2&z=1",
        "http://h.com/p?utm_source=s": "http://h.com/p",
        # fragment-only difference vanishes
        "http://h.com/p#sec": "http://h.com/p",
        # a param whose NAME merely starts like a real one survives
        "http://h.com/p?reference=1&b=1": "http://h.com/p?b=1&reference=1",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_schemeless_passthrough(spark):
    """No '://' → pass-through (trim + fragment strip only); assembling
    '://host' around an empty scheme minted mangled colliding keys."""
    got = _norm(spark, [" www.Example.com/Path#frag ", "relative/path?a=1"])
    assert got == ["www.Example.com/Path", "relative/path?a=1"]


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(normalize_url(F.col("url")).alias("n")).first().n is None
