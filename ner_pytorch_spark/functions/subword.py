"""Subword-offset alignment for contextual mention embeddings (M12).

The reference extracts BERT mention vectors by RUNNING-OFFSET
alignment: per word it encodes the word's subwords and records the
index of the word's FIRST subword in the full encoded sentence,
starting at 1 to skip [CLS]; chunk embeddings are then read at those
first-subword rows of the hidden-state matrix
(/root/reference/get_bert_embedding.py:59-63 — ``start=1; for ent in
sentence: ids = tokenizer.encode(ent[0]); ent.append(start);
start += len(ids)``).

No transformer ships in this sandbox, so the pieces are split at the
exact seam a cluster deployment swaps:

* :class:`WordpieceFixtureTokenizer` — a deterministic pure-python
  greedy-longest-match subword tokenizer (the WordPiece shape) standing
  in for ``BertTokenizer``; any object with ``encode(word) ->
  list[int]`` drops in.
* :func:`first_subword_offsets` — the reference's alignment rule,
  verbatim semantics.
* :func:`aligned_word_vectors` / :func:`aligned_mention_vectors` —
  hidden-state rows at those offsets, pooled per mention span (A4).
* :func:`mention_context_vectors` — the Spark operator: one Arrow
  crossing per sentence batch over a pluggable ``sentence_encoder(
  tokens) -> [n_subwords_with_cls, d]`` hidden-state callable (real
  deployment: a broadcast transformer; tests: a deterministic fake).

Dropping real BERT vectors onto a cluster needs zero new code: swap
the tokenizer + sentence_encoder pair.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               StringType, StructField, StructType)


def _piece_id(piece: str) -> int:
    """Stable 31-bit id per piece string (md5 — engine-agnostic)."""
    return int.from_bytes(
        hashlib.md5(piece.encode()).digest()[:4], "little") & 0x7FFFFFFF


class WordpieceFixtureTokenizer:
    """Greedy longest-prefix-match subword splitter (WordPiece shape).

    ``vocab`` is a set of allowed pieces; any single character is
    always a fallback piece (so encoding never fails). Continuation
    pieces carry the ``##`` prefix convention but match on their bare
    form — enough to make real multi-subword words (and therefore
    nontrivial offsets) deterministic without a model download.
    """

    def __init__(self, vocab: set[str] | None = None, max_piece: int = 6):
        self.vocab = vocab if vocab is not None else set()
        self.max_piece = max_piece

    def tokenize(self, word: str) -> list[str]:
        word = word.lower()
        pieces: list[str] = []
        i = 0
        while i < len(word):
            for ln in range(min(self.max_piece, len(word) - i), 1, -1):
                cand = word[i:i + ln]
                if cand in self.vocab:
                    pieces.append(cand if i == 0 else "##" + cand)
                    i += ln
                    break
            else:
                c = word[i]
                pieces.append(c if i == 0 else "##" + c)
                i += 1
        return pieces

    def encode(self, word: str) -> list[int]:
        return [_piece_id(p) for p in self.tokenize(word)]


def first_subword_offsets(tokens: list[str], tokenizer,
                          start: int = 1) -> list[int]:
    """Word i → index of its FIRST subword in the encoded sentence.

    Exactly get_bert_embedding.py:59-63: a running offset beginning at
    ``start`` (1 skips the [CLS] row), advanced by each word's subword
    count. Indexing by position rather than by subword identity is what
    keeps repeated subwords in one sentence unambiguous (the
    reference's comment makes the same point).
    """
    offs = []
    for t in tokens:
        offs.append(start)
        start += len(tokenizer.encode(t))
    return offs


def aligned_word_vectors(tokens: list[str], hidden: np.ndarray,
                         tokenizer, start: int = 1) -> np.ndarray:
    """[n_words, d] — hidden-state row of each word's first subword."""
    offs = np.asarray(first_subword_offsets(tokens, tokenizer, start))
    return np.asarray(hidden)[offs]


def aligned_mention_vectors(tokens: list[str], spans: list[tuple[int, int]],
                            hidden: np.ndarray, tokenizer,
                            pooling: str = "mean",
                            start: int = 1) -> np.ndarray:
    """[n_spans, d] — per-mention pool over the span's aligned word
    vectors (A4 pooling over first-subword rows, the chunk-embedding
    extraction of create_tag_chunks)."""
    wv = aligned_word_vectors(tokens, hidden, tokenizer, start)
    out = []
    for s, e in spans:
        if e <= s:
            # a zero-width span would pool an empty slice → NaN rows
            # (mean) or ValueError (min/max); fail loudly with the span
            raise ValueError(f"empty mention span ({s}, {e}); need end > start")
        seg = wv[s:e]
        if pooling == "mean":
            out.append(seg.mean(axis=0))
        elif pooling == "min":
            out.append(seg.min(axis=0))
        elif pooling == "max":
            out.append(seg.max(axis=0))
        else:
            raise ValueError(pooling)
    return np.stack(out) if out else np.zeros((0, np.asarray(hidden).shape[1]))


class FakeSentenceEncoder:
    """Deterministic stand-in for a broadcast transformer: row 0 is the
    [CLS] slot; each subword row is an md5-derived unit-scale vector of
    its piece id — so alignment bugs (off-by-one, wrong offsets) change
    values and fail exact tests, exactly what a real encoder would
    surface as silent quality loss. A plain class (not a closure) so it
    pickles into a Spark broadcast."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def _vec(self, pid: int) -> np.ndarray:
        h = hashlib.md5(f"sub:{pid}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        return rng.standard_normal(self.dim)

    def __call__(self, tokenizer, tokens: list[str]) -> np.ndarray:
        rows = [np.zeros(self.dim)]                 # [CLS]
        for t in tokens:
            rows.extend(self._vec(pid) for pid in tokenizer.encode(t))
        return np.stack(rows)


def fake_sentence_encoder(dim: int = 16):
    return FakeSentenceEncoder(dim)


_MENTION_VEC_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("sent_id", IntegerType()),
    StructField("mention_id", IntegerType()),
    StructField("surface", StringType()),
    StructField("tag_type", StringType()),
    StructField("embedding", ArrayType(DoubleType())),
])


def mention_context_vectors(mentions: DataFrame, tagged: DataFrame,
                            tokenizer=None, sentence_encoder=None,
                            pooling: str = "mean",
                            dim: int = 16) -> DataFrame:
    """Spark operator: per-mention CONTEXTUAL vectors via subword-offset
    alignment, one Arrow crossing.

    ``sentence_encoder(tokenizer, tokens) -> [1 + n_subwords, d]`` is
    the transformer seam (broadcast the model in the closure on a real
    cluster); defaults to the deterministic fixture. The join on
    (url, sent_id) is the only shuffle — same plan shape as
    :func:`~ner_pytorch_spark.operators.linking.contextual_candidate_links`.
    """
    tokenizer = tokenizer or WordpieceFixtureTokenizer()
    encode = sentence_encoder or fake_sentence_encoder(dim)
    spark = mentions.sparkSession
    bc = spark.sparkContext.broadcast({"tok": tokenizer, "enc": encode,
                                       "pooling": pooling})

    withtok = mentions.select(
        "url", "sent_id", "mention_id", "surface", "tag_type",
        "start", "end",
    ).join(tagged.select("url", "sent_id", "tokens"), on=["url", "sent_id"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc.value
        tok, enc, pool = v["tok"], v["enc"], v["pooling"]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: dict[str, list] = {f.name: []
                                    for f in _MENTION_VEC_SCHEMA.fields}
            # one encode per sentence, shared by all its mentions
            for (url, sid), grp in pdf.groupby(["url", "sent_id"],
                                               sort=False):
                toks = list(grp["tokens"].iloc[0])
                hidden = enc(tok, toks)
                spans = list(zip(grp["start"].astype(int),
                                 grp["end"].astype(int)))
                vecs = aligned_mention_vectors(toks, spans, hidden, tok,
                                               pooling)
                for row_i, (mid, surf, tt) in enumerate(zip(
                        grp["mention_id"].tolist(),
                        grp["surface"].tolist(),
                        grp["tag_type"].tolist())):
                    out["url"].append(url)
                    out["sent_id"].append(sid)
                    out["mention_id"].append(mid)
                    out["surface"].append(surf)
                    out["tag_type"].append(tt)
                    out["embedding"].append(vecs[row_i].tolist())
            yield pd.DataFrame(out)

    return withtok.mapInPandas(run, _MENTION_VEC_SCHEMA)
