"""J2 completion: relational vocab + GloVe → broadcastable weights."""

import numpy as np


def test_embedding_matrix_join(spark, tmp_path):
    from ner_pytorch_spark.operators.vocab import build_vocab
    from ner_pytorch_spark.operators.weights_io import (
        build_tagger_weights, embedding_matrix_from_tables)
    from ner_pytorch_spark.sources.glove import embedding_matrix_rows, load_glove

    dim = 4
    (tmp_path / "glove.txt").write_text(
        "the 1 2 3 4\nCat 9 9 9 9\ncat 5 6 7 8\n")
    glove = load_glove(spark, str(tmp_path / "glove.txt"), dim=dim)
    docs = spark.createDataFrame(
        [(["the", "the", "the", "Cat", "Cat", "Cat", "dog", "dog", "dog"],)],
        "tokens array<string>")
    vocab = build_vocab(docs, min_count=3)  # lowercased: the, cat, dog + PAD/UNK
    vectors = embedding_matrix_rows(vocab, glove)
    mat, t2i = embedding_matrix_from_tables(vocab, vectors, dim)
    np.testing.assert_array_equal(mat[t2i["the"]], [1, 2, 3, 4])
    # lowercase fallback is not needed ('cat' matches directly)
    np.testing.assert_array_equal(mat[t2i["cat"]], [5, 6, 7, 8])
    # unmatched 'dog' random-init within the reference bound
    bound = np.sqrt(3.0 / dim) + 1e-6
    assert np.all(np.abs(mat[t2i["dog"]]) <= bound)
    # deterministic across calls
    mat2, _ = embedding_matrix_from_tables(vocab, vectors, dim)
    np.testing.assert_array_equal(mat, mat2)


def test_build_tagger_weights_runs_inference(spark):
    from ner_pytorch_spark import datagen
    from ner_pytorch_spark.operators.tagger import sentences_table, tag_sentences
    from ner_pytorch_spark.operators.vocab import build_vocab, char_vocab
    from ner_pytorch_spark.operators.weights_io import build_tagger_weights
    from ner_pytorch_spark.functions.tagscheme import iobes_iob

    pages = datagen.pages_dataframe(spark, 15)
    sents = sentences_table(pages).persist()
    v = build_vocab(sents, min_count=1)
    cv = char_vocab(sents)
    w, t2i, c2i = build_tagger_weights(
        v, cv, word_dim=16, char_dim=6, char_out=8, hidden=12)
    out = tag_sentences(sents, mode="neural", weights=w,
                        vocab=t2i, char_vocab=c2i).collect()
    assert out
    for r in out:
        assert len(r.pred_tags) == len(r.tokens)
        iobes_iob(list(r.pred_tags))  # IOBES-valid under grammar prior
