"""Adversarial-generation operators (C3/C4, O3/O4, P8)."""

import pytest
from pyspark.sql import functions as F

from ner_pytorch_spark import datagen
from ner_pytorch_spark.operators.advgen import (adversarial_substitution,
                                                crf_nll_scores,
                                                hard_example_topk,
                                                o_segment_paraphrase,
                                                select_n_filtered,
                                                singleton_dropout,
                                                unigram_surprisal)
from ner_pytorch_spark.operators.tagger import sentences_table, tag_sentences


@pytest.fixture(scope="module")
def tagged(spark):
    pages = datagen.pages_dataframe(spark, 40)
    return tag_sentences(sentences_table(pages), mode="gazetteer",
                         aliases=datagen.alias_rows()).persist()


def test_substitution_replaces_entities(spark, tagged):
    adv = adversarial_substitution(tagged, datagen.alias_rows(), n_variants=2)
    rows = adv.collect()
    assert rows, "no adversarial variants produced"
    orig = {(r.url, r.sent_id): (list(r.tokens), list(r.pred_tags))
            for r in tagged.collect()}
    surfaces = {a["surface"] for a in datagen.alias_rows()}
    for r in rows[:50]:
        o_toks, o_tags = orig[(r.url, r.sent_id)]
        assert list(r.adv_tokens) != o_toks  # entity actually swapped
        assert len(r.adv_tokens) == len(r.adv_tags)
        # non-entity (O) token count preserved
        assert sum(1 for t in r.adv_tags if t == "O") == \
            sum(1 for t in o_tags if t == "O")
        # swapped-in chunks are real alias surfaces
        from ner_pytorch_spark.operators.spans import extract_spans
        for s in extract_spans(list(r.adv_tags), list(r.adv_tokens)):
            assert s["surface"] in surfaces
    # variants per sentence ≤ n_variants, ranks distinct
    per = adv.groupBy("url", "sent_id").agg(
        F.countDistinct("variant_id").alias("n"),
        F.count(F.lit(1)).alias("c")).collect()
    assert all(r.n == r.c and r.n <= 2 for r in per)


def test_o_segment_paraphrase(spark, tagged):
    ppdb = spark.createDataFrame(
        [("works for", "is employed by"), ("visited", "toured"),
         ("Johnson", "SHOULD-NEVER-APPLY")],  # entity surface: must pass through
        "phrase string, paraphrase string")
    out = o_segment_paraphrase(tagged, ppdb).collect()
    assert out, "no paraphrased sentences"
    for r in out[:50]:
        assert "SHOULD-NEVER-APPLY" not in list(r.adv_tokens)
        toks = list(r.adv_tokens)
        assert ("is employed by" in " ".join(toks)) or ("toured" in toks)


def test_hard_example_topk(spark, tagged):
    from ner_pytorch_spark.operators.encoder import TaggerWeights
    from ner_pytorch_spark.operators.tagset import iobes_tags

    adv = adversarial_substitution(tagged.limit(20), datagen.alias_rows(),
                                   n_variants=3).persist()
    w = TaggerWeights.random_init(200, 60, len(iobes_tags()), seed=4)
    vocab = {f"w{i}": i for i in range(199)}
    vocab["<UNK>"] = 199
    chars = {c: i for i, c in enumerate("abcdefghijklmnopqrstuvwxyz .'-ABC")}
    scored = crf_nll_scores(adv, w, vocab, chars)
    assert scored.filter("loss < 0").count() == 0  # NLL = logZ−gold ≥ 0
    top = hard_example_topk(scored, k=2)
    per = top.groupBy("url", "sent_id").count().collect()
    assert all(r["count"] <= 2 for r in per)


def test_select_n_filtered(spark):
    adv = spark.createDataFrame(
        [("u", 0, 0, 1.0), ("u", 0, 1, 9.0), ("u", 0, 2, 1.5),
         ("u", 1, 0, 9.0), ("u", 1, 1, 8.0)],
        "url string, sent_id int, variant_id int, score double")
    orig = spark.createDataFrame(
        [("u", 0, 1.0), ("u", 1, 1.0)], "url string, sent_id int, score double")
    out = select_n_filtered(adv, orig, n=2, ratio=3.0).collect()
    got = {(r.url, r.sent_id, r.variant_id) for r in out}
    # sent 0: variants 0,2 pass (score < 3.0); sent 1: none pass → backfill 2
    assert got == {("u", 0, 0), ("u", 0, 2), ("u", 1, 0), ("u", 1, 1)}


def test_unigram_surprisal_ranks_rare_higher(spark):
    freqs = spark.createDataFrame(
        [("the", 100), ("cat", 50), ("zyzzyva", 1)], "token string, freq long")
    adv = spark.createDataFrame(
        [("u", 0, 0, ["the", "cat"]), ("u", 0, 1, ["zyzzyva", "zyzzyva"])],
        "url string, sent_id int, variant_id int, adv_tokens array<string>")
    out = {r.variant_id: r.score
           for r in unigram_surprisal(adv, freqs).collect()}
    assert out[1] > out[0]


def test_singleton_dropout_deterministic(spark):
    df = spark.createDataFrame(
        [("u", 0, ["common", "rare1", "common", "rare2"])],
        "url string, sent_id int, tokens array<string>")
    singles = spark.createDataFrame([("rare1",), ("rare2",)], "token string")
    a = singleton_dropout(df, singles, p=1.0).first().tokens
    b = singleton_dropout(df, singles, p=1.0).first().tokens
    assert a == b == ["common", "<UNK>", "common", "<UNK>"]
    c = singleton_dropout(df, singles, p=0.0).first().tokens
    assert c == ["common", "rare1", "common", "rare2"]

def test_bigram_surprisal_word_order(spark):
    """M11 upgrade: bigram backoff LM is order-sensitive — a scrambled
    corpus sentence scores strictly worse than the original (a unigram
    model cannot tell them apart) and an in-corpus sentence beats a
    rare-word one."""
    from ner_pytorch_spark.operators.advgen import bigram_surprisal

    corpus_rows = [(f"s{i}", "the cat sat on the mat".split()) for i in range(20)] + \
                  [(f"t{i}", "a dog ran in the park".split()) for i in range(20)]
    corpus = spark.createDataFrame(corpus_rows, "sid string, tokens array<string>")
    adv = spark.createDataFrame(
        [("u", 0, 0, "the cat sat on the mat".split()),
         ("u", 0, 1, "mat the on sat cat the".split()),
         ("u", 1, 0, "zyx qwv flurb on the mat".split())],
        "url string, sent_id int, variant_id int, adv_tokens array<string>")
    got = {(r.sent_id, r.variant_id): r.score
           for r in bigram_surprisal(adv, corpus).collect()}
    assert got[(0, 0)] < got[(0, 1)], "scrambled order must score worse"
    assert got[(0, 0)] < got[(1, 0)], "rare words must score worse"
