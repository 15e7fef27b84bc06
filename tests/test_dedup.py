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
