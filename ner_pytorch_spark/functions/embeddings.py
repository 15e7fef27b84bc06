"""Token-embedding providers for the linking/similarity operators.

The reference links mention chunks with REAL word vectors — GloVe rows
loaded at train time (/root/reference/train.py:122-134) or BERT context
embeddings (/root/reference/get_bert_embedding.py:24-36) — pooled per
chunk (/root/reference/word_rep.py:92-123). Round 1 wired the linking
operators straight to the test corpus's hash-seeded random vectors; this
module is the production seam that replaces that:

* :class:`MatrixEmbedder` — a [V, dim] matrix + token→id map (assembled
  from the GloVe scan via ``sources.glove`` + ``operators.weights_io``),
  with the reference's direct → lowercase → digit-folded-lowercase
  lookup chain (/root/reference/loader.py:199-208); OOV tokens fall back
  to a deterministic hash vector so unseen surfaces keep distinct,
  stable directions. Pickles into one ``sparkContext.broadcast``.
* :class:`HashEmbedder` — the deterministic hash-seeded unit-vector
  fallback (what the synthetic corpus uses for its alias-bank fixtures);
  useful when no pretrained vectors are supplied, NOT a semantic space.

Both expose ``vec(token) -> np.ndarray[float32, dim]`` and ``dim``.
"""

from __future__ import annotations

import numpy as np


def hash_token_vector(token: str, dim: int) -> np.ndarray:
    """Deterministic unit vector seeded by blake2b(token) — stable across
    processes/executors; direction is NOISE, not semantics."""
    import hashlib

    seed = int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=4).digest(), "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


class HashEmbedder:
    """Hash-seeded unit vectors (the no-pretrained-weights fallback)."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def vec(self, token: str) -> np.ndarray:
        return hash_token_vector(token, self.dim)


class Md5Embedder:
    """md5-derived unit vectors — recomputable in DuckDB SQL.

    Component i of ``vec(token)`` = md5_number_upper("emb:<token>:<i>")
    (little-endian first 8 md5 digest bytes) mapped to [-1, 1), then the
    vector is L2-normalized. Same construction as
    :func:`~ner_pytorch_spark.operators.similarity.lsh_planes` — NOT a
    semantic space, but deterministic across engines, which is what lets
    the driver hash-check the linking operators end-to-end.
    """

    def __init__(self, dim: int = 16, dtype=np.float32):
        # dtype=float64 keeps the whole scoring path in double — the
        # oracle's precision — which matters when candidate scores sit
        # within ~1e-6 of each other (context-weighted queries)
        self.dim = dim
        self.dtype = dtype

    def vec(self, token: str) -> np.ndarray:
        import hashlib

        u = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"emb:{token}:{i}".encode()).digest()[:8],
                "little") for i in range(self.dim)),
            dtype=np.float64, count=self.dim)
        v = u / 2.0**64 * 2 - 1
        return (v / np.linalg.norm(v)).astype(self.dtype)


class MatrixEmbedder:
    """Pretrained word vectors with the reference's 3-key lookup chain.

    ``mat``: [V, dim] float32; ``t2i``: token → row. Lookup per
    loader.py:199-208: exact token, then lowercase, then digit-folded
    lowercase. Misses fall back per ``oov``: ``'hash'`` → deterministic
    hash vector (distinct OOV surfaces keep distinct directions);
    ``'unk'`` → the ``<UNK>`` row when present (all OOV collapse onto
    one direction, the reference's UNK-id behavior).
    """

    def __init__(self, mat: np.ndarray, t2i: dict[str, int], oov: str = "hash"):
        self.mat = np.asarray(mat, dtype=np.float32)
        self.t2i = t2i
        self.dim = int(self.mat.shape[1])
        if oov not in ("hash", "unk"):
            raise ValueError(oov)
        self.oov = oov

    @classmethod
    def from_tables(cls, vocab, vectors, dim: int, seed: int = 42,
                    oov: str = "hash") -> "MatrixEmbedder":
        """Assemble from the relational path: ``vocab`` (token, id, freq)
        ⟕ ``vectors`` (token, vector) from glove.embedding_matrix_rows —
        the J2 join; unmatched vocab rows get the reference's seeded
        uniform init (weights_io.embedding_matrix_from_tables)."""
        from ..operators.weights_io import embedding_matrix_from_tables

        mat, t2i = embedding_matrix_from_tables(vocab, vectors, dim, seed)
        return cls(mat, t2i, oov)

    def vec(self, token: str) -> np.ndarray:
        import re

        i = self.t2i.get(token)
        if i is None:
            i = self.t2i.get(token.lower())
        if i is None:
            i = self.t2i.get(re.sub(r"[0-9]", "0", token.lower()))
        if i is not None:
            return self.mat[i]
        if self.oov == "unk" and "<UNK>" in self.t2i:
            return self.mat[self.t2i["<UNK>"]]
        return hash_token_vector(token, self.dim)
