"""Distributed CRF-head training (structured perceptron + parameter
mixing): the in-engine trained-checkpoint quality gate."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ner_pytorch_spark import datagen


def _gold_sentences(spark, n_pages: int):
    return datagen.gold_sentences_dataframe(spark, n_pages)


@pytest.fixture(scope="module")
def trained_bundle(spark):
    """Trains on the ADVERSARIAL corpus (ambiguous surfaces, OOV
    held-out names, boundary-adjacent mentions) — the hardened gate: a
    gazetteer echo scores ~0 here, so F1 ≥ 0.9 evidences context/char
    discrimination. Same config as the kg_trained_prf driver query."""
    from ner_pytorch_spark.operators.train import (reservoir_weights,
                                                   train_crf_head)
    from ner_pytorch_spark.operators.vocab import build_vocab, char_vocab

    sents = datagen.adversarial_sentences_dataframe(
        spark, 800, oov_from=600).persist()
    train = sents.filter(F.col("page_idx") < 600)
    test = sents.filter(F.col("page_idx") >= 600)
    v = build_vocab(train, min_count=1)
    cv = char_vocab(train)
    t2i = {r["token"]: r["id"] for r in v.collect()}
    c2i = {r["token"]: r["id"] for r in cv.collect()}
    w0 = reservoir_weights(max(t2i.values()) + 1, max(c2i.values()) + 1,
                           seed=7, hidden=128, char_dim=12, char_out=16)
    trained, metrics = train_crf_head(
        train.repartition(8), w0, t2i, c2i, epochs=30, lr=0.25,
        unk_dropout=0.15)
    return w0, trained, metrics, t2i, c2i, train, test


def _f1(spark, weights, t2i, c2i, sents):
    from ner_pytorch_spark.operators.evaluation import chunk_prf
    from ner_pytorch_spark.operators.tagger import tag_sentences

    tagged = tag_sentences(sents.select("url", "sent_id", "tokens"),
                           mode="neural", weights=weights,
                           vocab=t2i, char_vocab=c2i)
    both = tagged.join(
        sents.select("url", "sent_id", "gold_tags"), on=["url", "sent_id"])
    rows = {r.tag_type: r for r in chunk_prf(both).collect()}
    return rows["OVERALL"].f1


def test_training_reduces_mistakes(trained_bundle):
    _, _, metrics, *_ = trained_bundle
    assert metrics[0]["n_mistakes"] > 0
    assert metrics[-1]["mistake_rate"] < metrics[0]["mistake_rate"]


def test_trained_heldout_f1_gate(spark, trained_bundle):
    """The north-star quality gate, demonstrable in-engine: the trained
    CRF head reaches chunk F1 ≥ 0.9 on HELD-OUT synthetic pages (the
    reference's ~90-F1 CoNLL gate, transposed to the corpus whose gold
    is known by construction), while the untrained head is far below."""
    w0, trained, _, t2i, c2i, _, test = trained_bundle
    f1_untrained = _f1(spark, w0, t2i, c2i, test)
    f1_trained = _f1(spark, trained, t2i, c2i, test)
    assert f1_trained >= 0.9, (f1_trained, f1_untrained)
    assert f1_trained > f1_untrained + 0.3


def test_trained_checkpoint_roundtrip(spark, tmp_path, trained_bundle):
    """to_npz → from_npz preserves the trained head bit-for-bit and the
    loaded bundle decodes as trained (grammar prior off by default)."""
    from ner_pytorch_spark.operators.encoder import TaggerWeights
    from ner_pytorch_spark.operators.tagger import tag_sentences

    _, trained, _, t2i, c2i, _, test = trained_bundle
    assert trained.meta.get("trained") is True
    p = str(tmp_path / "trained.npz")
    trained.to_npz(p)
    loaded = TaggerWeights.from_npz(p)
    np.testing.assert_array_equal(loaded.proj_w, trained.proj_w)
    np.testing.assert_array_equal(loaded.transitions, trained.transitions)
    sample = test.select("url", "sent_id", "tokens").limit(50)
    a = {(r.url, r.sent_id): tuple(r.pred_tags)
         for r in tag_sentences(sample, mode="neural", weights=trained,
                                vocab=t2i, char_vocab=c2i).collect()}
    b = {(r.url, r.sent_id): tuple(r.pred_tags)
         for r in tag_sentences(sample, mode="neural", weights=loaded,
                                vocab=t2i, char_vocab=c2i).collect()}
    assert a == b


def test_train_tolerates_empty_partitions(spark):
    """mapInPandas hands empty partitions an EMPTY batch iterator —
    training must not crash on them (more partitions than rows)."""
    from ner_pytorch_spark.operators.train import (reservoir_weights,
                                                   train_crf_head)

    sents = _gold_sentences(spark, 6).limit(3).repartition(16)
    toks = [t for r in sents.select("tokens").collect() for t in r.tokens]
    vocab = {t.lower(): i + 1 for i, t in enumerate(dict.fromkeys(toks))}
    vocab["<UNK>"] = 0
    chars = {c: i for i, c in enumerate("abcdefghijklmnopqrstuvwxyz .,0'-ABCDE")}
    w0 = reservoir_weights(len(vocab) + 1, len(chars), hidden=12,
                           word_dim=8, seed=3)
    trained, metrics = train_crf_head(sents, w0, vocab, chars, epochs=1)
    assert metrics and metrics[0]["n_sentences"] == 3
