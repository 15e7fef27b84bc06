"""File-format scans: CoNLL sentences, GloVe vectors, PPDB edges."""

import pytest


def test_conll_scan(spark, tmp_path):
    from ner_pytorch_spark.sources.conll import load_sentences

    p = tmp_path / "corpus.txt"
    p.write_text(
        "-DOCSTART- -X- O O\n"
        "\n"
        "EU NNP I-NP I-ORG\n"
        "rejects VBZ I-VP O\n"
        "German JJ I-NP I-MISC\n"
        "call NN I-NP O\n"
        "\n"
        "Peter NNP I-NP I-PER\n"
        "Blackburn NNP I-NP I-PER\n"
        "\n"
        "year 1984 was I-MISC\n")
    out = load_sentences(spark, str(p), zeros=True).orderBy("sent_id").collect()
    assert len(out) == 3
    assert out[0].tokens == ["EU", "rejects", "German", "call"]
    assert out[0].tags == ["I-ORG", "O", "I-MISC", "O"]
    assert out[1].tokens == ["Peter", "Blackburn"]
    # digit fold applies to words, not tags
    assert out[2].tokens == ["year"] or out[2].tokens[0] == "year"


def test_glove_scan_and_augment(spark, tmp_path):
    from ner_pytorch_spark.sources.glove import (augment_with_pretrained,
                                                 embedding_matrix_rows,
                                                 load_glove, pretrained_vocab)

    dim = 3
    p = tmp_path / "glove.txt"
    p.write_text(
        "the 0.1 0.2 0.3\n"
        "cat 0.4 0.5 0.6\n"
        "malformed 0.1 0.2\n"          # ≠ dim+1 fields → dropped
        "paris 0.7 0.8 0.9\n")
    g = load_glove(spark, str(p), dim=dim)
    assert g.count() == 3
    pre = pretrained_vocab(g)

    vocab = spark.createDataFrame([("the",), ("dog",)], "token string")
    words = spark.createDataFrame([("Paris",), ("cat9",), ("unknown",)], "token string")
    aug = {r.token for r in augment_with_pretrained(vocab, pre, words).collect()}
    assert "Paris" in aug        # lowercase fallback matches 'paris'
    assert "unknown" not in aug
    assert {"the", "dog"} <= aug

    mat = {r.token: r.vector for r in embedding_matrix_rows(vocab, g).collect()}
    assert mat["the"] == [0.1, 0.2, 0.3]
    assert mat["dog"] is None    # random-init deferred to weight load


def test_ppdb_scan_and_lookup(spark, tmp_path):
    from ner_pytorch_spark.sources.ppdb import load_ppdb, paraphrase_ngram_lookup

    p = tmp_path / "ppdb.txt"
    p.write_text(
        "[X] ||| big ||| large ||| f ||| e ||| a ||| Equivalence\n"
        "[X] ||| tiny home ||| small house ||| f ||| e ||| a ||| Equivalence\n"
        "[X] ||| good ||| bad ||| f ||| e ||| a ||| Exclusion\n")
    edges = load_ppdb(spark, str(p))
    pairs = {(r.phrase, r.paraphrase) for r in edges.collect()}
    assert ("big", "large") in pairs and ("large", "big") in pairs  # bidirectional
    assert ("good", "bad") not in pairs                             # relation filter

    sents = spark.createDataFrame(
        [("u", 0, ["a", "tiny", "home", "is", "big"])],
        "url string, sent_id int, tokens array<string>")
    hits = paraphrase_ngram_lookup(sents, edges, max_n=2).collect()
    by_phrase = {r.phrase: r for r in hits}
    assert by_phrase["tiny home"].paraphrase == "small house"
    assert by_phrase["tiny home"].n == 2      # bigram beats unigram at its start
    assert by_phrase["big"].paraphrase == "large"

    # regression: sentences SHORTER than max_n used to crash the job
    # (sequence(0, size-n) descends to [0, -1] when size < n and the
    # transform evaluates slice(start=0) → SparkRuntimeException); they
    # must instead contribute only their shorter n-grams.
    short = spark.createDataFrame(
        [("u", 1, ["big"]), ("u", 2, [])],
        "url string, sent_id int, tokens array<string>")
    short_hits = paraphrase_ngram_lookup(short, edges, max_n=2).collect()
    assert [(r.sent_id, r.phrase, r.paraphrase) for r in short_hits] == [
        (1, "big", "large")]


def test_multimodal_plumbing(spark):
    from ner_pytorch_spark.operators.multimodal import (extract_features,
                                                        synthetic_media)

    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    assert all(len(r.features) == 16 for r in feats)
    # deterministic: same payload → same features
    again = {r.media_id: r.features for r in extract_features(media).collect()}
    first = {r.media_id: r.features for r in feats}
    assert again == first


def test_decode_stub_raises():
    import pytest as _pytest

    from ner_pytorch_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
