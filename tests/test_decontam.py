"""Benchmark decontamination + domain-scoped boilerplate removal."""

import pytest

from ner_pytorch_spark.operators.decontam import (benchmark_overlap,
                                                  boilerplate_lines,
                                                  decontaminate,
                                                  doc_ngram_hashes,
                                                  strip_boilerplate)

DOCS_DDL = "doc_id long, text string, source string"


@pytest.fixture(scope="module")
def contam(spark):
    train = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon", "s"),      # leaks b1 (2 grams)
        (2, "zeta eta theta iota kappa", "s"),           # clean
        (3, "alpha beta gamma nu xi", "s"),              # leaks b1 (1 gram)
        (4, "one two", "s"),                             # shorter than n
    ], DOCS_DDL)
    bench = spark.createDataFrame([
        (100, "alpha beta gamma delta omega", "s"),
        (101, "alpha beta gamma psi chi", "s"),
    ], DOCS_DDL)
    return train, bench


def test_ngram_hashes_distinct_and_short_docs(spark, contam):
    train, _ = contam
    rows = doc_ngram_hashes(train, n=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.gram_hash)
    assert len(by_doc.get(1, ())) == 3      # 5 tokens → 3 trigrams
    assert 4 not in by_doc                  # 2 tokens < n → no grams
    # repetition within a doc collapses (distinct)
    rep = spark.createDataFrame([(9, "a b c a b c a b c", "s")], DOCS_DDL)
    grams = doc_ngram_hashes(rep, n=3).collect()
    assert len(grams) == 3                  # 'a b c', 'b c a', 'c a b'


def test_benchmark_overlap_counts(spark, contam):
    train, bench = contam
    got = {r.doc_id: (r.n_shared_ngrams, r.n_bench_docs)
           for r in benchmark_overlap(train, bench, n=3).collect()}
    # doc 1 shares 'alpha beta gamma' (both bench) + 'beta gamma delta'
    # (bench 100); doc 3 shares 'alpha beta gamma' only
    assert got == {1: (2, 2), 3: (1, 2)}


def test_max_bench_df_cap(spark, contam):
    train, bench = contam
    # 'alpha beta gamma' has bench df 2 → dropped by cap 1;
    # 'beta gamma delta' (df 1) survives → only doc 1 stays flagged
    got = {r.doc_id: (r.n_shared_ngrams, r.n_bench_docs)
           for r in benchmark_overlap(train, bench, n=3,
                                      max_bench_df=1).collect()}
    assert got == {1: (1, 1)}


def test_decontaminate_filters(spark, contam):
    train, bench = contam
    kept = {r.doc_id for r in decontaminate(train, bench, n=3,
                                            min_shared=2).collect()}
    assert kept == {2, 3, 4}                # only doc 1 has ≥2 shared
    kept1 = {r.doc_id for r in decontaminate(train, bench, n=3,
                                             min_shared=1).collect()}
    assert kept1 == {2, 4}


@pytest.fixture(scope="module")
def bp_docs(spark):
    footer = "copyright acme corp all rights reserved"
    nav = "home products about contact"
    rows = []
    for i in range(10):                     # domain A: footer on all 10,
        body = f"unique body line {i}"      # nav on 3 of 10
        text = "\n".join([body, footer] + ([nav] if i < 3 else []))
        rows.append((i, text, "a.com"))
    # domain B carries the SAME footer but only on 1 of 10 docs — must
    # NOT be flagged there (domain-scoped counting)
    for i in range(10):
        text = f"b body {i}" + ("\n" + footer if i == 0 else "")
        rows.append((100 + i, text, "b.com"))
    return spark.createDataFrame(rows, DOCS_DDL), footer, nav


def test_boilerplate_lines_domain_scoped(spark, bp_docs):
    docs, footer, nav = bp_docs
    got = {(r.source, r.line): (r.n_docs, r.doc_frac)
           for r in boilerplate_lines(docs, min_doc_frac=0.25,
                                      min_docs=2).collect()}
    assert got == {("a.com", footer): (10, 1.0),
                   ("a.com", nav): (3, 0.3)}
    # threshold above nav's 0.3 keeps only the footer
    got2 = {(r.source, r.line)
            for r in boilerplate_lines(docs, min_doc_frac=0.5).collect()}
    assert got2 == {("a.com", footer)}


def test_strip_boilerplate_preserves_order(spark, bp_docs):
    docs, footer, nav = bp_docs
    out = {r.doc_id: r.clean_text
           for r in strip_boilerplate(docs, min_doc_frac=0.25,
                                      min_docs=2).collect()}
    assert out[0] == "unique body line 0"       # footer + nav stripped
    assert out[5] == "unique body line 5"
    assert out[100] == f"b body 0\n{footer}"    # domain B keeps footer
    # multi-line body keeps original line order after reassembly
    multi = spark.createDataFrame(
        [(1, "z line\na line\n" + footer, "a.com"),
         (2, "keep\n" + footer, "a.com")], DOCS_DDL)
    got = {r.doc_id: r.clean_text
           for r in strip_boilerplate(multi, min_doc_frac=0.5).collect()}
    assert got[1] == "z line\na line"           # NOT sorted alphabetically
    assert got[2] == "keep"


def test_strip_boilerplate_all_boilerplate_doc(spark):
    docs = spark.createDataFrame(
        [(1, "same", "d"), (2, "same", "d"), (3, "same\nextra", "d")],
        DOCS_DDL)
    got = {r.doc_id: r.clean_text
           for r in strip_boilerplate(docs, min_doc_frac=0.5).collect()}
    assert got == {1: "", 2: "", 3: "extra"}
