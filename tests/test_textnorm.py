"""P1/P4/P9 scalar-function parity: Column exprs vs pure-python twins."""

from pyspark.sql import functions as F

from ner_pytorch_spark.functions.textnorm import (cap_feature, despace_punct,
                                                  py_cap_feature,
                                                  py_unicode_to_ascii,
                                                  py_zero_digits, tokenize_ws,
                                                  zero_digits)

WORDS = ["hello", "WORLD", "Paris", "iPhone", "2024", "ABC-1", "a", "Z",
         "mid2dle", "O'Brien", "", "ALL CAPS".split()[0]]


def test_cap_feature_parity(spark):
    df = spark.createDataFrame([(w,) for w in WORDS if w], "w string")
    got = dict(df.select("w", cap_feature(F.col("w")).alias("c")).collect())
    for w in WORDS:
        if w:
            assert got[w] == py_cap_feature(w), w


def test_cap_feature_classes():
    assert py_cap_feature("hello") == 0
    assert py_cap_feature("WORLD") == 1
    assert py_cap_feature("Paris") == 2
    assert py_cap_feature("iPhone") == 3
    assert py_cap_feature("2024") == 0  # caseless == lower


def test_zero_digits_parity(spark):
    df = spark.createDataFrame([("abc123xyz7",), ("no-digits",)], "s string")
    got = [r[0] for r in df.select(zero_digits(F.col("s"))).collect()]
    assert got == [py_zero_digits("abc123xyz7"), py_zero_digits("no-digits")]
    assert py_zero_digits("a1b2") == "a0b0"


def test_despace_punct(spark):
    df = spark.createDataFrame([("Hello , world . OK",)], "s string")
    got = df.select(despace_punct(F.col("s"))).first()[0]
    assert got == "Hello, world. OK"


def test_tokenize_ws(spark):
    df = spark.createDataFrame([("  a  b\tc  ",)], "s string")
    assert df.select(tokenize_ws(F.col("s"))).first()[0] == ["a", "b", "c"]


def test_unicode_to_ascii():
    assert py_unicode_to_ascii("café") == "cafe"
    assert py_unicode_to_ascii("naïve, résumé") == "naive, resume"
