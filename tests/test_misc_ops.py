"""O1 length batching, C5 tag-run merge, M9 argmax decode."""

import numpy as np


def test_repartition_by_length(spark):
    from ner_pytorch_spark import datagen
    from ner_pytorch_spark.operators.tagger import (repartition_by_length,
                                                    sentences_table)

    sents = sentences_table(datagen.pages_dataframe(spark, 40))
    out = repartition_by_length(sents, partitions=4)
    # physical only: same rows
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, sents.collect()))
    # within a partition, lengths are non-increasing
    from pyspark.sql import functions as F

    rows = (out.withColumn("pid", F.spark_partition_id())
            .withColumn("len", F.size("tokens"))
            .select("pid", "len").collect())
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.len)
    for pid, lens in by_pid.items():
        assert lens == sorted(lens, reverse=True), pid


def test_repartition_by_length_low_cardinality_parallelism(spark):
    """Regression: range bounds are sampled from the partition key, so
    ranging on bare length (few distinct values on web sentences)
    capped the stage at ~#distinct partitions with one giant partition
    — the 32-way neural stage silently ran ~7-wide. The hash tiebreaker
    must deliver the REQUESTED partition count with bounded skew."""
    from pyspark.sql import functions as F

    from ner_pytorch_spark import datagen
    from ner_pytorch_spark.operators.tagger import (repartition_by_length,
                                                    sentences_table)

    sents = sentences_table(datagen.pages_dataframe(spark, 400))
    n_lengths = sents.select(F.size("tokens")).distinct().count()
    n = 16
    assert n_lengths < n  # the corpus genuinely has few length classes
    out = repartition_by_length(sents, partitions=n).persist()
    assert out.rdd.getNumPartitions() == n
    counts = [r.n for r in
              (out.withColumn("pid", F.spark_partition_id())
               .groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect())]
    total = sum(counts)
    # no partition holds more than ~3x its fair share (pre-fix: one
    # partition held ~1/3 of ALL rows at any requested n)
    assert len(counts) == n and max(counts) <= 3 * total / n
    out.unpersist()


def test_merge_tag_runs():
    from ner_pytorch_spark.operators.spans import merge_tag_runs

    tokens = ["Alice", "Johnson", "'s", "firm", "visited", "Paris"]
    tags = ["B-PER", "E-PER", "O", "O", "O", "S-LOC"]
    nodes = merge_tag_runs(tokens, tags)
    texts = [(n["text"], n["tag_type"]) for n in nodes]
    assert texts == [("Alice Johnson", "PER"), ("'s", None), ("firm", None),
                     ("visited", None), ("Paris", "LOC")]
    # clitic merges into preceding O node
    tokens2 = ["it", "'s", "fine"]
    tags2 = ["O", "O", "O"]
    nodes2 = merge_tag_runs(tokens2, tags2)
    assert [n["text"] for n in nodes2] == ["it's", "fine"]


def test_argmax_decode():
    from ner_pytorch_spark.operators.encoder import argmax_decode

    em = np.zeros((2, 3, 4))
    em[0, 0, 2] = 5
    em[0, 1, 1] = 5
    em[1, 0, 3] = 5
    paths = argmax_decode(em, np.array([2, 1]))
    assert paths == [[2, 1], [3]]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: both sides bucketed+sorted on the join key →
    the join plan has ZERO Exchange nodes (no shuffle at all)."""
    import re

    from ner_pytorch_spark.plans.bucketing import read_bucketed, save_bucketed

    orders = spark.createDataFrame(
        [(i, f"c{i % 7}", float(i)) for i in range(500)],
        "o_orderkey long, cust string, total double")
    items = spark.createDataFrame(
        [(i % 500, j, float(i * j % 97)) for i in range(1000) for j in (0, 1)],
        "o_orderkey long, line int, price double")
    save_bucketed(orders, "b_orders", 4, ["o_orderkey"],
                  path=str(tmp_path / "bo"))
    save_bucketed(items, "b_items", 4, ["o_orderkey"],
                  path=str(tmp_path / "bi"))
    try:
        # hint("merge"): the tables are tiny so Spark would broadcast —
        # the scale-relevant plan is the sort-merge join, which bucket
        # co-location must run with ZERO shuffle (and zero extra Sort)
        joined = read_bucketed(spark, "b_orders").hint("merge").join(
            read_bucketed(spark, "b_items"), on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert not re.search(r"Exchange", plan), plan
        assert joined.count() == 2000
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_kmv_sketch_accuracy_and_exactness(spark):
    """KMV distinct estimate: exact below k; within ~3/sqrt(k) relative
    error above k (deterministic md5 hashing, so the bound is a fixed
    fact of this corpus, not a flaky probabilistic assertion)."""
    import numpy as np

    from ner_pytorch_spark.operators.textstats import kmv_distinct_tokens

    rng = np.random.default_rng(11)
    vocab = [f"w{i:04d}" for i in range(3000)]
    rows = []
    for d in range(20):
        n = int(rng.integers(5, 2000))
        rows.append((d, " ".join(rng.choice(vocab, size=n, replace=True))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {d: len(set(t.split())) for d, t in rows}
    k = 64
    est = {r.doc_id: r.n_distinct_est
           for r in kmv_distinct_tokens(docs, k=k).collect()}
    for d, n in exact.items():
        if n < k:
            assert est[d] == float(n), (d, est[d], n)
        else:
            assert abs(est[d] - n) / n < 3 / np.sqrt(k), (d, est[d], n)

    # mergeability: the corpus-wide sketch equals the estimate computed
    # from the union of per-doc hash minima (one global row)
    glob = kmv_distinct_tokens(docs, k=k, per_doc=False).first()
    all_exact = len({t for _, txt in rows for t in txt.split()})
    assert abs(glob.n_distinct_est - all_exact) / all_exact < 3 / np.sqrt(k)

    # the corpus-wide path is the IMPLEMENTED merge: per-bucket k-minima
    # then a tiny union — the estimate is invariant to input partitioning
    # and bucket count, and the plan has no global one-task window
    for n_buckets in (4, 64):
        g2 = kmv_distinct_tokens(docs.repartition(8), k=k, per_doc=False,
                                 n_buckets=n_buckets).first()
        assert g2.n_distinct_est == glob.n_distinct_est, n_buckets
    plan = (kmv_distinct_tokens(docs, k=k, per_doc=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan, plan
    # below-k corpora report the exact count (null u_k branch)
    tiny = spark.createDataFrame([(0, "a b c"), (1, "b c d")],
                                 "doc_id long, text string")
    assert kmv_distinct_tokens(tiny, k=64,
                               per_doc=False).first().n_distinct_est == 4.0


def test_hash_sampling_stable_and_consistent(spark):
    """Deterministic hash sampling: identical subset under different
    partitionings, fraction within tolerance, salt derives an
    independent subset; hash_split partitions exactly with ~requested
    proportions and agrees with deterministic_sample gating."""
    from ner_pytorch_spark.operators.sampling import (deterministic_sample,
                                                      hash_split)

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, "k", 0.2).collect()}
    b = {r.k for r in deterministic_sample(df.repartition(17), "k", 0.2).collect()}
    assert a == b                      # partitioning-invariant
    assert abs(len(a) / 5000 - 0.2) < 0.03
    salted = {r.k for r in deterministic_sample(df, "k", 0.2, salt="s1").collect()}
    assert salted != a                 # independent draw
    # nested property: a 0.1 sample is a SUBSET of the 0.2 sample
    small = {r.k for r in deterministic_sample(df, "k", 0.1).collect()}
    assert small <= a

    from pyspark.sql import functions as F

    splits = hash_split(df, "k", {"train": 0.8, "dev": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              splits.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "dev", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    # split assignment is a pure function of the key
    again = hash_split(df.repartition(5), "k", {"train": 0.8, "dev": 0.1,
                                                "test": 0.1})
    assert sorted(map(tuple, splits.collect())) == sorted(map(tuple, again.collect()))


def test_bigram_lm_perplexity(spark):
    """Interpolated-bigram perplexity (M11, relational): predictable
    repetitive text scores lower than the same tokens shuffled; scored
    position count = len-1; <2-token docs are omitted; an externally
    trained LM scores unseen pairs through the backoff terms."""
    import numpy as np

    from ner_pytorch_spark.operators.lm import doc_perplexity, train_bigram_lm

    rng = np.random.default_rng(5)
    rep = "a b " * 30                       # one dominant bigram
    toks = (["a", "b"] * 30)
    rng.shuffle(toks)
    docs = spark.createDataFrame(
        [(0, rep), (1, " ".join(toks)), (2, "solo")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in doc_perplexity(docs).collect()}
    assert set(out) == {0, 1}               # 1-token doc has no positions
    assert out[0].n_scored == 59 and out[1].n_scored == 59
    assert out[0].ppl < out[1].ppl          # order sensitivity (M11 shape)

    # external LM with OOV pairs: backoff keeps probabilities finite
    lm = train_bigram_lm(docs)
    other = spark.createDataFrame([(9, "b a zz qq b")],
                                  "doc_id long, text string")
    row = doc_perplexity(other, lm=lm).first()
    assert row.n_scored == 4 and np.isfinite(row.ppl) and row.ppl > 0


def test_repetition_scores(spark):
    """Gopher-style repetition signals on constructed docs: clean text
    scores ~0, line-repeated and phrase-repeated docs score high, and
    degenerate docs (empty / single-token) coalesce to 0."""
    from ner_pytorch_spark.operators.textstats import repetition_scores

    docs = spark.createDataFrame([
        (1, "alpha beta gamma\ndelta epsilon zeta"),            # clean
        (2, "same line here\nsame line here\nsame line here"),  # dup lines
        (3, "buy now buy now buy now buy now"),                 # one phrase
        (4, "x"),                                               # < n tokens
        (5, ""),                                                # empty
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_scores(docs, n=2).collect()}

    assert got[1].dup_line_frac == 0.0
    assert got[1].top_ngram_frac == 0.2        # 5 bigrams, all unique
    assert got[1].dup_ngram_frac == 0.0

    assert got[2].dup_line_frac == round(1 - 1 / 3, 6)
    # tokens: same line here same line here same line here → bigrams all
    # repeated ("same line"x3, "line here"x3, "here same"x2) → dup 1.0
    assert got[2].dup_ngram_frac == 1.0

    # "buy now" dominates: 7 bigrams, "buy now" 4 of them
    assert got[3].top_ngram_frac == round(4 / 7, 6)
    assert got[3].dup_ngram_frac == 1.0

    for d in (4, 5):
        assert (got[d].dup_line_frac, got[d].top_ngram_frac,
                got[d].dup_ngram_frac) == (0.0, 0.0, 0.0)
