"""A1-A3 vocab determinism: sentinel pinning, min-count, tie-break
(utils.py:59-67 ordering is load-bearing)."""

from ner_pytorch_spark.operators.vocab import PAD, UNK, build_vocab, char_vocab


def test_vocab_golden(spark):
    rows = [
        (["the", "cat", "sat"],),
        (["the", "dog", "sat"],),
        (["the", "cat", "ran"],),
        (["zzz", "cat", "sat"],),
    ]
    df = spark.createDataFrame(rows, "tokens array<string>")
    got = {r.token: (r.id, r.freq) for r in build_vocab(df, min_count=3).collect()}
    # <PAD> freq 10000001 → id 0; <UNK> → id 1 (loader.py:76-78)
    assert got[PAD] == (0, 10_000_001)
    assert got[UNK] == (1, 10_000_000)
    # the/cat/sat all freq 3 → tie broken alphabetically (utils.py:64)
    assert got["cat"][0] == 2
    assert got["sat"][0] == 3
    assert got["the"][0] == 4
    # min_count=3 drops dog/ran/zzz
    assert "dog" not in got and "zzz" not in got


def test_vocab_normalization(spark):
    df = spark.createDataFrame(
        [(["Ab1", "ab2", "AB3"],)], "tokens array<string>")
    got = {r.token for r in build_vocab(df, min_count=3).collect()}
    # lowercase + digit fold merges all three → freq 3 → kept
    assert "ab0" in got


def test_char_vocab_case_kept(spark):
    df = spark.createDataFrame([(["Ab", "aB", "ab"],)], "tokens array<string>")
    got = {r.token: r.freq for r in char_vocab(df).collect()}
    # chars keep case (loader.py:87-97): a×2, b×2, A×1, B×1
    assert got["a"] == 2 and got["b"] == 2 and got["A"] == 1 and got["B"] == 1


def test_deterministic_under_repartition(spark):
    import random

    rng = random.Random(9)
    rows = [([rng.choice("abcdefg") * rng.randint(1, 3) for _ in range(10)],)
            for _ in range(200)]
    df = spark.createDataFrame(rows, "tokens array<string>")
    v1 = sorted(build_vocab(df.repartition(2)).collect())
    v2 = sorted(build_vocab(df.repartition(13)).collect())
    assert v1 == v2
