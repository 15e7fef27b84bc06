"""Parity of the engine's CoNLL scan/normalize path against a literal
replay of the reference loader on the REAL CoNLL-2003 files shipped at
/root/reference/dataset (loader.py:21-42, utils.py zero_digits,
loader.py:45-66 IOB2, loader.py:69-110 vocab dicos).

These tests read the actual corpus the reference trains on — they skip
cleanly if the dataset directory is absent (e.g. on a cluster without
the reference checkout)."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

DATASET = "/root/reference/dataset"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATASET}/eng.train"),
    reason="reference CoNLL-2003 dataset not present")


def _reference_load_sentences(path, zeros=True):
    """Literal replay of /root/reference/loader.py:21-42."""
    def zero_digits(s):
        return re.sub(r"\d", "0", s)

    sentences, sentence = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = zero_digits(line.rstrip()) if zeros else line.rstrip()
            if not line:
                if len(sentence) > 0:
                    if "DOCSTART" not in sentence[0][0]:
                        sentences.append(sentence)
                    sentence = []
            else:
                word = line.split()
                assert len(word) >= 2
                sentence.append(word)
    if len(sentence) > 0:
        if "DOCSTART" not in sentence[0][0]:
            sentences.append(sentence)
    return sentences


@pytest.fixture(scope="module")
def ref_testa():
    return _reference_load_sentences(f"{DATASET}/eng.testa")


@pytest.fixture(scope="module")
def eng_testa(spark):
    from ner_pytorch_spark.sources.conll import load_sentences

    return load_sentences(spark, f"{DATASET}/eng.testa",
                          zeros=True, lower=False).persist()


def test_sentence_count_parity(eng_testa, ref_testa):
    assert eng_testa.count() == len(ref_testa)  # 3250 on eng.testa


def test_token_and_tag_parity_full_file(eng_testa, ref_testa):
    got = {r["sent_id"]: (list(r["tokens"]), list(r["tags"]))
           for r in eng_testa.collect()}
    assert len(got) == len(ref_testa)
    for i, ref_sent in enumerate(ref_testa):
        words = [w[0] for w in ref_sent]
        tags = [w[-1] for w in ref_sent]
        assert got[i] == (words, tags), f"sentence {i} diverges"


def test_train_file_counts(spark):
    # full eng.train: the reference's own training corpus
    from ner_pytorch_spark.sources.conll import load_sentences

    df = load_sentences(spark, f"{DATASET}/eng.train").persist()
    ref = _reference_load_sentences(f"{DATASET}/eng.train")
    assert df.count() == len(ref) == 14041
    n_tok = df.select(F.sum(F.size("tokens"))).first()[0]
    assert n_tok == sum(len(s) for s in ref)
    df.unpersist()


def test_vocab_dico_parity(spark, eng_testa, ref_testa):
    # A1-A2 frequency dico vs the reference's word_mapping counts
    # (loader.py:69-83: dico over zero-folded lowercased words)
    from collections import Counter

    from ner_pytorch_spark.operators.vocab import build_vocab

    v = build_vocab(eng_testa.withColumn(
        "tokens", F.transform("tokens", F.lower)), min_count=1)
    got = {r["token"]: r["freq"] for r in v.collect()
           if r["token"] not in ("<UNK>", "<PAD>")}
    ref_counts = Counter(w[0].lower() for s in ref_testa for w in s)
    assert got == dict(ref_counts)


def test_iobes_rewrite_on_real_tags(spark, eng_testa):
    # P7 over the real tag distribution: roundtrip IOB2→IOBES→IOB2
    from ner_pytorch_spark.functions.tagscheme import (
        iob2_udf, iob_iobes_udf, iobes_iob_udf)

    df = eng_testa.withColumn("iob2", iob2_udf("tags"))
    df = df.withColumn("iobes", iob_iobes_udf("iob2"))
    df = df.withColumn("back", iobes_iob_udf("iobes"))
    n_bad = df.filter(F.col("back") != F.col("iob2")).count()
    assert n_bad == 0
    # IOBES output uses only the 4 CoNLL types × {B,I,E,S} + O
    tags = {r[0] for r in
            df.select(F.explode("iobes")).distinct().collect()}
    types = {t.split("-")[-1] for t in tags if t != "O"}
    assert types == {"LOC", "MISC", "ORG", "PER"}


def test_recorded_real_f1_floor_and_checkpoint_roundtrip():
    """The committed real-corpus artifact honors the quality floor: the
    recorded dev (testa) chunk F1 is >= 0.90 and test (testb) >= 0.85
    (published reference reaches 90.94 WITH GloVe 6B vectors, which do
    not ship in this sandbox; the committed hidden=200 checkpoint
    reaches dev 0.9236 / test 0.8751 without them — above the
    published dev number), and the committed
    S6 checkpoint the kg_conll_prf driver query resumes from actually
    loads with shapes consistent with its embedded vocab."""
    import json

    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rec_path = os.path.join(root, "CONLL_REAL.json")
    ckpt = os.path.join(root, "artifacts", "conll_weights.npz")
    if not (os.path.exists(rec_path) and os.path.exists(ckpt)):
        pytest.skip("real-corpus artifact not yet recorded")

    with open(rec_path) as f:
        rec = json.load(f)
    assert rec["dataset"]["train"].endswith("eng.train")
    assert rec["dataset"]["n_train_sentences"] == 14041
    assert rec["overall_f1"] >= 0.90, rec["overall_f1"]
    assert rec["test_overall_f1"] >= 0.85, rec["test_overall_f1"]
    assert rec["dev_chunk_prf"]["OVERALL"]["f1"] == rec["overall_f1"]

    from ner_pytorch_spark.operators.encoder import TaggerWeights
    w = TaggerWeights.from_npz(ckpt)
    vocabs = TaggerWeights.vocabs_from_npz(ckpt)
    assert w.word_emb.shape[0] >= max(vocabs["word"].values()) + 1
    assert w.char_emb.shape[0] >= max(vocabs["char"].values()) + 1
    assert np.all(np.isfinite(w.word_emb))
    assert w.meta.get("trained") or w.transitions is not None
