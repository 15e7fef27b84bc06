"""Assemble TaggerWeights from relational vocab + embedding tables.

Completes the J2 join path (/root/reference/train.py:122-134): the
embedding matrix is built by joining the vocab against GloVe vectors
with exact → lowercase fallback (relational, in
:mod:`ner_pytorch_spark.sources.glove`), and tokens with no match get
the reference's uniform init U(−√(3/dim), √(3/dim))
(/root/reference/utils.py:209-214 shape) from a seeded rng — randomness
enters only HERE, at weight-assembly time, never in the relational
layer. The resulting bundle broadcasts to executors as numpy arrays.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from .encoder import TaggerWeights
from .tagset import ENTITY_TYPES, grammar_transitions, iobes_tags


def embedding_matrix_from_tables(
    vocab: DataFrame,           # (token, id, freq) — deterministic ids
    vectors: DataFrame,         # (token, vector) — glove.embedding_matrix_rows
    dim: int,
    seed: int = 42,
) -> tuple[np.ndarray, dict[str, int]]:
    """→ (matrix [V, dim], token→id). Unmatched rows random-init."""
    rows = (
        vocab.join(vectors, on="token", how="left")
        .select("token", "id", "vector")
        .collect()
    )
    V = max(r["id"] for r in rows) + 1
    rng = np.random.default_rng(seed)
    bound = float(np.sqrt(3.0 / dim))
    mat = rng.uniform(-bound, bound, size=(V, dim)).astype(np.float32)
    t2i: dict[str, int] = {}
    for r in rows:
        t2i[r["token"]] = r["id"]
        if r["vector"] is not None:
            mat[r["id"]] = np.asarray(r["vector"], dtype=np.float32)
    return mat, t2i


def build_tagger_weights(
    vocab: DataFrame,
    char_vocab: DataFrame,
    vectors: DataFrame | None = None,
    word_dim: int = 100,
    char_dim: int = 25,
    char_out: int = 25,
    hidden: int = 200,
    cap_dim: int = 4,
    char_mode: str = "CNN",
    entity_types: tuple[str, ...] = ENTITY_TYPES,
    seed: int = 42,
) -> tuple[TaggerWeights, dict[str, int], dict[str, int]]:
    """Full weight bundle with pretrained word embeddings where
    available; every other tensor seeded-random (a TRAINED checkpoint
    loads via TaggerWeights.from_npz instead). Defaults mirror the
    reference's hyperparameters (arguments.py: word_dim 100, char 25,
    hidden 200, cap 4, char_mode CNN).

    → (weights, word→id, char→id)
    """
    num_tags = len(iobes_tags(entity_types))
    if vectors is not None:
        word_emb, t2i = embedding_matrix_from_tables(
            vocab, vectors, word_dim, seed)
    else:
        rows = vocab.select("token", "id").collect()
        V = max(r["id"] for r in rows) + 1
        rng = np.random.default_rng(seed)
        bound = float(np.sqrt(3.0 / word_dim))
        word_emb = rng.uniform(-bound, bound, (V, word_dim)).astype(np.float32)
        t2i = {r["token"]: r["id"] for r in rows}
    c_rows = char_vocab.select("token", "id").collect()
    c2i = {r["token"]: r["id"] for r in c_rows}
    C = max(c2i.values()) + 1 if c2i else 1

    w = TaggerWeights.random_init(
        vocab_size=word_emb.shape[0], char_vocab_size=C, num_tags=num_tags,
        word_dim=word_dim, char_dim=char_dim, char_out=char_out,
        hidden=hidden, cap_dim=cap_dim, char_mode=char_mode, seed=seed)
    w.word_emb = word_emb
    # untrained transitions start from the IOBES grammar prior
    w.transitions = grammar_transitions(entity_types).copy()
    return w, t2i, c2i
