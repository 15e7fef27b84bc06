"""Dedup operators on constructed duplicates/near-duplicates."""

import pytest
from pyspark.sql import functions as F

from ner_pytorch_spark.operators.dedup import (exact_duplicates,
                                               minhash_lsh_pairs,
                                               ngram_jaccard_pairs,
                                               simhash64, simhash_pairs,
                                               word_shingles)

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the green forest near the river bank every single morning")


@pytest.fixture(scope="module")
def docs(spark):
    near = BASE.replace("green", "dark")          # 1-token edit
    far = "completely different text about spark sql engines and shuffles"
    rows = [(0, BASE), (1, BASE), (2, near), (3, far), (4, far.upper()), (5, "tiny doc")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact(docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].canonical_id == 0 and groups[0].dup_ids == [0, 1]


def test_shingles_short_doc(docs):
    sh = word_shingles(docs, n=3)
    tiny = [r.shingle for r in sh.filter("doc_id = 5").collect()]
    assert tiny == ["tiny doc"]  # < n tokens → single full-join shingle


def test_ngram_jaccard(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0          # exact dup
    assert (0, 2) in pairs               # near dup above 0.5
    assert (0, 3) not in pairs
    # normalization lowercases → far & FAR are exact under shingling
    assert pairs[(3, 4)] == 1.0


def test_minhash_lsh_finds_near_dups(docs):
    got = {(r.doc_a, r.doc_b)
           for r in minhash_lsh_pairs(docs, n_hashes=16, bands=8, n=3,
                                      threshold=0.5).collect()}
    assert (0, 1) in got and (3, 4) in got
    assert (0, 2) in got  # near dup caught by at least one band


def test_lsh_wide_buckets_match_long_path(spark, docs):
    """The one-shuffle wide-aggregate bucket builder produces the SAME
    candidate set as the explode→groupBy long formulation it replaced
    (bucket keys are seed-tagged, so key equality ⟺ per-band minhash
    equality in both)."""
    from ner_pytorch_spark.operators.dedup import (
        _lsh_buckets, minhash_signatures, word_shingles)

    n_hashes, bands, rpb = 16, 4, 4
    sig = minhash_signatures(docs)
    long_buckets = (
        sig.withColumn("band", (F.col("seed") / rpb).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.concat_ws("|", F.sort_array(F.collect_list(
            F.concat_ws("=", F.col("seed"), F.col("minhash"))))).alias("k")))

    def cands(buckets, key):
        a = buckets.select(F.col("doc_id").alias("doc_a"), "band", key)
        b = buckets.select(F.col("doc_id").alias("doc_b"), "band", key)
        return {(r.doc_a, r.doc_b) for r in
                a.join(b, on=["band", key])
                .filter(F.col("doc_a") < F.col("doc_b"))
                .select("doc_a", "doc_b").distinct().collect()}

    wide = _lsh_buckets(word_shingles(docs), n_hashes, bands)
    assert cands(wide, "bucket_key") == cands(long_buckets, "k")


def test_simhash_blocking_is_lossless(spark):
    """Pigeonhole recall at max_hamming > 3 (the round-1 bug class).

    Correlated random docs (subsets of a tiny vocab) produce many pairs
    at Hamming 4-20 whose differing bits span ALL FOUR of the old fixed
    16-bit chunks — the old blocking silently dropped those. The new
    (max_hamming+1)-chunk blocking must return exactly the brute-force
    all-pairs answer.
    """
    import random

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(30)]
    texts = [" ".join(rng.sample(vocab, rng.randint(8, 20))) for _ in range(80)]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    hashes = {i: simhash64(t.split()) for i, t in enumerate(texts)}
    mask = (1 << 64) - 1

    def ham(a, b):
        return bin((hashes[a] ^ hashes[b]) & mask).count("1")

    for max_h in (8, 20):
        expect = {(a, b): ham(a, b) for a in hashes for b in hashes
                  if a < b and ham(a, b) <= max_h}
        got = {(r.doc_a, r.doc_b): r.hamming
               for r in simhash_pairs(docs, max_hamming=max_h).collect()}
        assert got == expect, f"max_hamming={max_h}"

    # the adversarial witness: ≥1 pair beyond Hamming 3 shares NONE of
    # the old fixed 16-bit chunks → the old 4-chunk blocking provably
    # missed it, the new blocking must not.
    def old_chunks(h):
        u = h & mask
        return [(u >> (16 * i)) & 0xFFFF for i in range(4)]

    witnesses = [
        (a, b) for a in hashes for b in hashes
        if a < b and 3 < ham(a, b) <= 20
        and all(x != y for x, y in zip(old_chunks(hashes[a]), old_chunks(hashes[b])))
    ]
    assert witnesses, "test corpus must contain an old-blocking-missed pair"
    got20 = {(r.doc_a, r.doc_b)
             for r in simhash_pairs(docs, max_hamming=20).collect()}
    assert set(witnesses) <= got20


def test_simhash_matches_duckdb_oracle(docs):
    """End-to-end engine parity: the pandas-UDF simhash equals the pure
    SQL recomputation (md5_number_upper → majority vote → two's
    complement) that the driver uses as the oracle."""
    import duckdb

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["simhash_pairs"]
    expect = {tuple(r) for r in con.execute(sql).fetchall()}
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in simhash_pairs(docs, max_hamming=8).collect()}
    assert got == expect


def test_simhash_properties(docs):
    h1 = simhash64(BASE.split())
    h2 = simhash64(BASE.replace("green", "dark").split())
    h3 = simhash64("completely different text about engines".split())
    ham12 = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    ham13 = bin((h1 ^ h3) & ((1 << 64) - 1)).count("1")
    assert ham12 < ham13  # near dup is closer in hamming space
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0
    assert (3, 4) in pairs  # case-folded → identical hash


def test_simhash_max_bucket_guard(spark):
    """Skew guard: a degenerate corpus (identical docs → one simhash)
    must not turn the blocking join quadratic. With the cap the hot
    buckets drop from blocking (0 pairs, exact_duplicates territory);
    with the guard off the full quadratic answer comes back."""
    n = 200
    same = spark.createDataFrame([(i, "same text everywhere") for i in range(n)],
                                 "doc_id long, text string")
    assert simhash_pairs(same, max_hamming=3, max_bucket=50).count() == 0
    assert (simhash_pairs(same, max_hamming=3, max_bucket=None).count()
            == n * (n - 1) // 2)
    # and exact dedup handles the degenerate group linearly
    g = exact_duplicates(same).collect()
    assert len(g) == 1 and g[0].n_dups == n


def test_hot_buckets_reports_dropped_keys(spark):
    from ner_pytorch_spark.operators.dedup import hot_buckets

    keyed = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", 0)], "k string, v long")
    hot = hot_buckets(keyed, ["k"], cap=5).collect()
    assert [(r.k, r.df) for r in hot] == [("a", 10)]


def test_shingle_cache_keyed_by_plan(spark, docs):
    """Interleaving two corpora keeps both persisted shingle tables
    (the round-4 single-slot global thrashed on this pattern)."""
    from ner_pytorch_spark.operators.dedup import _SH_CACHE, _cached_shingles

    other = spark.createDataFrame([(9, "another corpus entirely")],
                                  "doc_id long, text string")
    a1 = _cached_shingles(docs, 3, "text", "doc_id")
    b1 = _cached_shingles(other, 3, "text", "doc_id")
    a2 = _cached_shingles(docs, 3, "text", "doc_id")
    b2 = _cached_shingles(other, 3, "text", "doc_id")
    assert a1 is a2 and b1 is b2 and a1 is not b1
    # different params → different slot
    a4 = _cached_shingles(docs, 4, "text", "doc_id")
    assert a4 is not a1
    assert len(_SH_CACHE._slots) <= _SH_CACHE.capacity


def test_jaccard_dense_matches_relational(spark):
    """The dense bitmap kernel is value-identical to the relational
    blocking join, including stop-shingle cap semantics (n_common counts
    only non-stop commons; sizes stay FULL), across tile boundaries."""
    import random

    from ner_pytorch_spark.operators import dedup

    rng = random.Random(13)
    hot = ["h0", "h1", "h2"]               # in every doc → df = 60
    cold = [f"w{i}" for i in range(20)]    # df ≈ 24 each
    rows = [(i, " ".join(hot
                         + [rng.choice(cold) for _ in range(8)]))
            for i in range(60)]
    rows.append((60, ""))                  # zero-token doc: excluded
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # cap off, then cap=40: hot words stopped (df 60 > 40), cold kept —
    # n_common loses the hot words while sizes n_a/n_b keep them
    for max_block, thr in ((1000, 0.3), (40, 0.1)):
        rel = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            docs, n=1, threshold=thr, max_block=max_block,
            dense=False).collect()))
        den = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            docs, n=1, threshold=thr, max_block=max_block,
            dense=True).collect()))
        assert rel == den and len(den) > 0
    # multi-tile path: force tiny tiles so carry/slicing is exercised
    old = dedup._JTILE
    dedup._JTILE = 8
    try:
        den_tiled = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            docs, n=1, threshold=0.3, dense=True).collect()))
    finally:
        dedup._JTILE = old
    rel = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        docs, n=1, threshold=0.3, dense=False).collect()))
    assert den_tiled == rel


def test_jaccard_dense_policy_stays_relational_when_sparse(spark):
    """auto-policy: a sparse corpus (every doc its own vocabulary) must
    keep the scale-safe blocking join — the plan shows the shingle
    equi-join, not the dense MapInPandas kernel."""
    from ner_pytorch_spark.operators import dedup

    # one contiguous alnum run per token (an underscore would split into
    # a shared digit token and densify the corpus)
    rows = [(i, " ".join(f"tok{i}x{j}" for j in range(30)))
            for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    df = dedup.ngram_jaccard_pairs(docs, n=1, threshold=0.5, dense="auto")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan  # relational path chosen
    assert df.count() == 0
