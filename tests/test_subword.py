"""M12 subword-offset alignment (get_bert_embedding.py:59-63 parity).

The fixtures force MULTI-SUBWORD words so a wrong offset (off-by-one,
identity-based instead of position-based lookup) changes the extracted
vectors and fails the exact comparisons.
"""

import numpy as np

from ner_pytorch_spark.functions.subword import (WordpieceFixtureTokenizer,
                                                 aligned_mention_vectors,
                                                 aligned_word_vectors,
                                                 fake_sentence_encoder,
                                                 first_subword_offsets,
                                                 mention_context_vectors)

_VOCAB = {"spark", "data", "base", "flink", "str", "eam", "ing"}


def _tok():
    return WordpieceFixtureTokenizer(_VOCAB)


def test_tokenizer_greedy_pieces():
    t = _tok()
    assert t.tokenize("spark") == ["spark"]
    assert t.tokenize("database") == ["data", "##base"]
    # greedy longest prefix first, char fallback elsewhere
    assert t.tokenize("streaming") == ["str", "##eam", "##ing"]
    assert t.tokenize("xy") == ["x", "##y"]
    # encoding is deterministic and per-piece stable
    assert t.encode("database") == t.encode("database")
    assert len(t.encode("streaming")) == 3


def test_first_subword_offsets_running():
    """The reference's running-offset rule: start=1 ([CLS]), advance by
    each word's subword count. 'database'(2) and 'streaming'(3) make
    the offsets non-trivial; a repeated word gets a DIFFERENT offset
    (position-based, not identity-based — the reference's stated reason
    for the scheme)."""
    toks = ["spark", "database", "streaming", "database"]
    offs = first_subword_offsets(toks, _tok())
    assert offs == [1, 2, 4, 7]


def test_aligned_word_and_mention_vectors():
    toks = ["spark", "database", "streaming"]
    t = _tok()
    enc = fake_sentence_encoder(dim=8)
    hidden = enc(t, toks)                 # [1 + 1+2+3, 8]
    assert hidden.shape == (7, 8)
    wv = aligned_word_vectors(toks, hidden, t)
    np.testing.assert_array_equal(wv[0], hidden[1])   # spark
    np.testing.assert_array_equal(wv[1], hidden[2])   # data (first sub)
    np.testing.assert_array_equal(wv[2], hidden[4])   # str (first sub)
    mv = aligned_mention_vectors(toks, [(1, 3), (0, 1)], hidden, t)
    np.testing.assert_allclose(mv[0], (hidden[2] + hidden[4]) / 2)
    np.testing.assert_array_equal(mv[1], hidden[1])


def test_mention_context_vectors_spark(spark):
    """The Spark operator reproduces the local alignment exactly, one
    encode per sentence shared across its mentions."""
    tagged = spark.createDataFrame(
        [("u1", 0, ["spark", "database", "streaming"]),
         ("u1", 1, ["flink", "spark"])],
        "url string, sent_id int, tokens array<string>")
    mentions = spark.createDataFrame(
        [("u1", 0, 0, "database streaming", "ORG", 1, 3),
         ("u1", 0, 1, "spark", "ORG", 0, 1),
         ("u1", 1, 0, "flink", "ORG", 0, 1)],
        "url string, sent_id int, mention_id int, surface string, "
        "tag_type string, start int, end int")
    t = _tok()
    got = {(r.url, r.sent_id, r.mention_id): np.array(r.embedding)
           for r in mention_context_vectors(
               mentions, tagged, tokenizer=t, dim=8).collect()}
    enc = fake_sentence_encoder(dim=8)
    h0 = enc(t, ["spark", "database", "streaming"])
    h1 = enc(t, ["flink", "spark"])
    np.testing.assert_allclose(got[("u1", 0, 0)], (h0[2] + h0[4]) / 2)
    np.testing.assert_allclose(got[("u1", 0, 1)], h0[1])
    np.testing.assert_allclose(got[("u1", 1, 0)], h1[1])


def test_zero_width_span_raises():
    import numpy as np
    import pytest
    from ner_pytorch_spark.functions.subword import (
        WordpieceFixtureTokenizer, aligned_mention_vectors)

    t = WordpieceFixtureTokenizer()
    toks = ["alpha", "beta"]
    hidden = np.ones((10, 4))
    with pytest.raises(ValueError, match=r"\(1, 1\)"):
        aligned_mention_vectors(toks, [(1, 1)], hidden, t)
