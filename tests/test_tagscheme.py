"""P7 tag-scheme rewrite goldens (utils.py:77-142 semantics)."""

import pytest

from ner_pytorch_spark.functions.tagscheme import iob2, iob_iobes, iobes_iob


def test_iob1_to_iob2():
    assert iob2(["I-PER", "I-PER", "O"]) == ["B-PER", "I-PER", "O"]
    assert iob2(["O", "I-LOC"]) == ["O", "B-LOC"]
    # type change forces B
    assert iob2(["I-PER", "I-LOC"]) == ["B-PER", "B-LOC"]
    # already IOB2 untouched
    assert iob2(["B-ORG", "I-ORG", "O"]) == ["B-ORG", "I-ORG", "O"]


def test_iob2_rejects_garbage():
    with pytest.raises(ValueError):
        iob2(["X-PER"])
    with pytest.raises(ValueError):
        iob2(["I-PER-EXTRA-DASH-OK", "WAT"])


def test_iob_iobes():
    assert iob_iobes(["B-PER", "I-PER", "O"]) == ["B-PER", "E-PER", "O"]
    assert iob_iobes(["B-PER", "O"]) == ["S-PER", "O"]
    assert iob_iobes(["B-LOC", "I-LOC", "I-LOC"]) == ["B-LOC", "I-LOC", "E-LOC"]


def test_iobes_iob_roundtrip():
    seq = ["B-PER", "I-PER", "O", "O", "I-LOC", "O", "I-MISC"]
    iobes = iob_iobes(iob2(seq))
    back = iobes_iob(iobes)
    assert back == iob2(seq)


def test_udf_matches_pure(spark):
    from pyspark.sql import functions as F

    from ner_pytorch_spark.functions.tagscheme import iob_iobes_udf

    rows = [(["B-PER", "I-PER", "O"],), (["B-LOC"],), (["O", "O"],)]
    df = spark.createDataFrame(rows, "tags array<string>")
    got = [r[0] for r in df.select(iob_iobes_udf(F.col("tags"))).collect()]
    assert got == [iob_iobes(list(r[0])) for r in rows]
