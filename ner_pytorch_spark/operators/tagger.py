"""Sentence segmentation + featurization + batched mention tagging.

The inference hot path of the engine (SURVEY §7 Phase 1):

    pages → filter(lang='en') → sentences (split + posexplode, JVM-side)
          → tag_sentences (ONE Arrow-batched mapInPandas stage:
            featurize P1-P6 + emissions + CRF Viterbi M8)
          → mentions (C1 explode)

Two emission modes, both decoding through the SAME numpy CRF Viterbi:

* ``neural``    — the full char-CNN/BiLSTM forward
  (:mod:`ner_pytorch_spark.operators.encoder`) with broadcast weights;
  the production path once trained weights are loaded.
* ``gazetteer`` — emissions constructed from broadcast alias-dictionary
  longest matches (the distant-supervision path; deterministic, used for
  the synthetic-corpus P/R gate where no trained checkpoint exists).

Featurization parity contracts (unit-tested):
  word ids: lowercase + digit-fold + <UNK> fallback
  (/root/reference/loader.py:135-137,160-161); char ids: case kept,
  OOV chars silently DROPPED (/root/reference/loader.py:138); caps:
  4-way class (/root/reference/loader.py:113-128).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..functions.textnorm import (py_cap_feature, py_tokenize_ws,
                                  py_zero_digits, tokenize_ws)
from .crf import viterbi_decode
from .encoder import TaggerWeights, neural_emissions
from .tagset import ENTITY_TYPES, grammar_transitions, iobes_tags

MATCH_SCORE = 10.0

# ASCII file/group/record/unit separators: str.split() whitespace but
# NOT Java-\s whitespace — pages containing them can't use the fast path
import re as _re

_FS_SEPS = _re.compile("[\x1c-\x1f]")


# ------------------------------------------------------------ sentences


def sentences_table(pages: DataFrame, lang: str | None = "en") -> DataFrame:
    """pages → (url, sent_id, sentence, tokens). All JVM-side.

    Sentence = non-empty line of the extracted text (the extractor emits
    one block element per line); tokens = whitespace split. ``sent_id``
    is the line ordinal — a pure function of the text, stable under any
    repartitioning.
    """
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return (
        df.select("url", F.posexplode(F.split("text", "\n")).alias("sent_id", "sentence"))
        .filter(F.length("sentence") > 0)
        .withColumn("tokens", tokenize_ws(F.col("sentence")))
        .filter(F.size("tokens") > 0)
    )


# ------------------------------------------------------- featurization


def featurize_sentence(tokens: list[str], word_to_id: dict, char_to_id: dict,
                       unk_id: int) -> tuple[list[int], list[list[int]], list[int]]:
    """P1-P6 for one sentence; pure, shared with the golden pipeline."""
    word_ids = [
        word_to_id.get(py_zero_digits(t.lower()), unk_id) for t in tokens]
    char_ids = [
        [char_to_id[c] for c in t if c in char_to_id]  # OOV-drop, loader.py:138
        for t in tokens]
    caps = [py_cap_feature(t) for t in tokens]
    return word_ids, char_ids, caps


# ------------------------------------------------- gazetteer emissions


def build_surface_index(aliases: list[dict]) -> dict:
    """first_token → [(token_tuple, tag_type)], longest-first.

    Greedy leftmost-longest matching mirrors the reference's PPDB
    bigram-then-unigram lookup (J5, /root/reference/ppdb.py:85-100) —
    with the bigram-construction bug at ppdb.py:89 fixed, not replicated.
    """
    idx: dict[str, list[tuple[tuple[str, ...], str]]] = {}
    for row in aliases:
        toks = tuple(row["surface"].split(" "))
        idx.setdefault(toks[0], []).append((toks, row["tag_type"]))
    for k in idx:
        idx[k].sort(key=lambda p: (-len(p[0]), p[0]))
    return idx


def gazetteer_tag_ids(tokens: list[str], surface_index: dict,
                      tag_ids: dict[str, int]) -> list[int]:
    """Greedy longest-match → IOBES tag-id sequence (gold emissions)."""
    n = len(tokens)
    ids = [tag_ids["O"]] * n
    i = 0
    while i < n:
        cands = surface_index.get(tokens[i])
        matched = False
        if cands:
            for toks, tt in cands:
                L = len(toks)
                if i + L <= n and tuple(tokens[i:i + L]) == toks:
                    if L == 1:
                        ids[i] = tag_ids[f"S-{tt}"]
                    else:
                        ids[i] = tag_ids[f"B-{tt}"]
                        for j in range(i + 1, i + L - 1):
                            ids[j] = tag_ids[f"I-{tt}"]
                        ids[i + L - 1] = tag_ids[f"E-{tt}"]
                    i += L
                    matched = True
                    break
        if not matched:
            i += 1
    return ids


def gazetteer_decode(
    tok_lists: list[list[str]],
    surface_index: dict,
    tag_ids: dict[str, int],
    transitions: np.ndarray,
) -> list[list[int]]:
    """Exact gazetteer-mode decode WITHOUT running the Viterbi DP.

    In gazetteer mode the emission lattice is deterministic: 0
    everywhere except the matched positions, which carry MATCH_SCORE,
    and the decode transitions are the pure IOBES grammar (exactly 0 or
    IMPOSSIBLE). Under that structure the candidate path "matched tags,
    O elsewhere" is provably what :func:`viterbi_decode` returns:

    - it is grammar-valid by construction (greedy longest-match emits
      non-overlapping well-formed spans), so its score is
      MATCH_SCORE x n_matched — the maximum attainable, since every
      transition score is <= 0 and deviating at a matched position
      forfeits MATCH_SCORE;
    - tie-breaking: alternative max-score paths differ only on
      zero-emission runs, and the DP's argmax-first tie-break always
      prefers tag id 0 = "O" there (backptr argmax picks the smallest
      maximal index, and delta["O"] is maximal at every unmatched
      position), which is exactly this candidate.

    A vectorized grammar check still guards every sentence; any
    candidate that is NOT valid (impossible with the current matcher,
    cheap insurance against future matchers) falls back to the real
    DP in one small batch. The fused hot path uses this; the unfused
    ``tag_sentences`` keeps full Viterbi, so the fused==unfused
    equivalence tests differentially verify the shortcut on every run.
    Skipping the DP also skips materializing the [B, L, T] emission
    tensor — on profile this halves the fused UDF body.
    """
    from .crf import IMPOSSIBLE, viterbi_decode

    T = transitions.shape[0] - 2
    half = IMPOSSIBLE / 2.0
    ok_pair = transitions[:T, :T] > half
    ok_start = transitions[T, :T] > half
    ok_stop = transitions[:T, T + 1] > half
    paths: list[list[int] | None] = [None] * len(tok_lists)
    fallback: list[tuple[int, np.ndarray]] = []
    for b, toks in enumerate(tok_lists):
        g = np.asarray(
            gazetteer_tag_ids(toks, surface_index, tag_ids), dtype=np.int64)
        if g.size == 0:          # empty sentence: nothing to decode
            paths[b] = []
            continue
        if (ok_start[g[0]] and ok_stop[g[-1]]
                and (g.size < 2 or ok_pair[g[:-1], g[1:]].all())):
            paths[b] = g.tolist()
        else:
            fallback.append((b, g))
    if fallback:
        L = max(g.size for _, g in fallback)
        em = np.zeros((len(fallback), L, T), dtype=np.float32)
        lens = np.asarray([g.size for _, g in fallback], dtype=np.int64)
        for k, (_, g) in enumerate(fallback):
            em[k, np.arange(g.size), g] = MATCH_SCORE
        for (b, _), p in zip(fallback,
                             viterbi_decode(em, lens, transitions)):
            paths[b] = p
    return paths


def gazetteer_viterbi(
    tok_lists: list[list[str]],
    surface_index: dict,
    tag_ids: dict[str, int],
    transitions: np.ndarray,
) -> list[list[int]]:
    """Gazetteer decode through the FULL Viterbi DP (no shortcut).

    Semantically identical to :func:`gazetteer_decode` (differentially
    tested); exists so the DP-free win is measurable from the bench
    artifact (``bench.py`` times the fused path both ways) rather than
    only claimed in prose.
    """
    from .crf import viterbi_decode

    T = transitions.shape[0] - 2
    nonempty = [(b, np.asarray(
        gazetteer_tag_ids(toks, surface_index, tag_ids), dtype=np.int64))
        for b, toks in enumerate(tok_lists) if toks]
    paths: list[list[int]] = [[] for _ in tok_lists]
    if nonempty:
        L = max(g.size for _, g in nonempty)
        em = np.zeros((len(nonempty), L, T), dtype=np.float32)
        lens = np.asarray([g.size for _, g in nonempty], dtype=np.int64)
        for k, (_, g) in enumerate(nonempty):
            em[k, np.arange(g.size), g] = MATCH_SCORE
        for (b, _), p in zip(nonempty,
                             viterbi_decode(em, lens, transitions)):
            paths[b] = p
    return paths


# ------------------------------------------------------------- tagging

_TAGGED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("sent_id", IntegerType()),
    StructField("tokens", ArrayType(StringType())),
    StructField("pred_tags", ArrayType(StringType())),
    StructField("n_tokens", LongType()),
])


def _decode_transitions(weights: TaggerWeights, grammar_prior: bool | None,
                        prior: np.ndarray) -> np.ndarray:
    """Neural-mode decode transitions. The IOBES grammar prior keeps
    decodes valid under UNTRAINED (random) transition weights, but a
    genuinely trained CRF must decode with its learned transitions ALONE
    (/root/reference/crf.py:91-135) — so ``grammar_prior=None`` defaults
    to on for random-init weights and OFF for checkpoint-loaded ones
    (``meta['trained']``, set by ``TaggerWeights.from_npz``)."""
    if grammar_prior is None:
        grammar_prior = not weights.meta.get("trained", False)
    return weights.transitions + prior if grammar_prior else weights.transitions


def tag_sentences(
    sentences: DataFrame,
    mode: str = "gazetteer",
    weights: TaggerWeights | None = None,
    vocab: dict | None = None,
    char_vocab: dict | None = None,
    aliases: list[dict] | None = None,
    entity_types: tuple[str, ...] = ENTITY_TYPES,
    grammar_prior: bool | None = None,
) -> DataFrame:
    """Batched mention detection: ONE mapInPandas stage over Arrow batches.

    Everything heavy (weights / dictionaries) ships via
    ``sparkContext.broadcast`` once per job, not per task. Batch size is
    bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (session
    factory) — the explicit inference-stage sizing knob.
    """
    spark = sentences.sparkSession
    sc = spark.sparkContext
    tags = iobes_tags(entity_types)
    tag_ids = {t: i for i, t in enumerate(tags)}
    transitions = grammar_transitions(entity_types)

    if mode == "gazetteer":
        if aliases is None:
            raise ValueError("gazetteer mode needs aliases")
        bc = sc.broadcast({
            "surface_index": build_surface_index(aliases),
            "tag_ids": tag_ids, "tags": tags, "transitions": transitions,
        })

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            v = bc.value
            sidx, tids, tlist, trans = (
                v["surface_index"], v["tag_ids"], v["tags"], v["transitions"])
            T = len(tlist)
            # task-lifetime memo (pure function of the token sequence;
            # same rationale as the neural branch below)
            memo: dict[tuple, list] = {}
            for pdf in batches:
                tok_lists = [list(t) for t in pdf["tokens"]]
                B = len(tok_lists)
                if B == 0:
                    continue
                lengths = np.array([len(t) for t in tok_lists], dtype=np.int64)
                pred: list = [None] * B
                todo: dict[tuple, list[int]] = {}
                for i, toks in enumerate(tok_lists):
                    key = tuple(toks)
                    hit = memo.get(key)
                    if hit is not None:
                        pred[i] = hit
                    else:
                        todo.setdefault(key, []).append(i)
                if todo:
                    uniq = [tok_lists[ix[0]] for ix in todo.values()]
                    lens_u = np.fromiter((len(t) for t in uniq), np.int64,
                                         len(uniq))
                    L = max(1, int(lens_u.max()))
                    em = np.zeros((len(uniq), L, T), dtype=np.float32)
                    for b, toks in enumerate(uniq):
                        gold = gazetteer_tag_ids(toks, sidx, tids)
                        em[b, np.arange(len(gold)), gold] = MATCH_SCORE
                    paths = viterbi_decode(em, lens_u, trans)
                    for key, p in zip(todo, paths):
                        tags_p = [tlist[i] for i in p]
                        if len(memo) < 1_000_000:
                            memo[key] = tags_p
                        for i in todo[key]:
                            pred[i] = tags_p
                yield pd.DataFrame({
                    "url": pdf["url"], "sent_id": pdf["sent_id"],
                    "tokens": pdf["tokens"], "pred_tags": pred,
                    "n_tokens": lengths,
                })

    elif mode == "neural":
        if weights is None or vocab is None or char_vocab is None:
            raise ValueError("neural mode needs weights + vocabs")
        unk_id = vocab.get("<UNK>", 0)
        bc = sc.broadcast({
            "weights": weights, "vocab": vocab, "chars": char_vocab,
            "unk": unk_id, "tags": tags,
            "decode_trans": _decode_transitions(weights, grammar_prior,
                                                transitions),
        })

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            v = bc.value
            w: TaggerWeights = v["weights"]
            tlist = v["tags"]
            # task-lifetime memo: featurize→forward→Viterbi is a pure
            # function of the token sequence, and real corpora repeat
            # sentences heavily (boilerplate; the synthetic corpus is
            # ~15% unique) — with length-clustered partitions the copies
            # of a sentence land in the SAME task, so the forward runs
            # once per distinct sentence per task. Recomputed from the
            # parquet input on every run — nothing survives the task.
            memo: dict[tuple, list] = {}
            for pdf in batches:
                tok_lists = [list(t) for t in pdf["tokens"]]
                if not tok_lists:
                    continue
                B = len(tok_lists)
                lengths = np.fromiter((len(t) for t in tok_lists),
                                      np.int64, B)
                pred: list = [None] * B
                todo: dict[tuple, list[int]] = {}
                for i, toks in enumerate(tok_lists):
                    key = tuple(toks)
                    hit = memo.get(key)
                    if hit is not None:
                        pred[i] = hit
                    else:
                        todo.setdefault(key, []).append(i)
                if todo:
                    uniq = [tok_lists[ix[0]] for ix in todo.values()]
                    feats = [featurize_sentence(t, v["vocab"], v["chars"],
                                                v["unk"]) for t in uniq]
                    em, lens_u = neural_emissions(
                        w, [f[0] for f in feats], [f[1] for f in feats],
                        [f[2] for f in feats])
                    paths = viterbi_decode(em, lens_u, v["decode_trans"])
                    for key, p in zip(todo, paths):
                        tags_p = [tlist[i] for i in p]
                        if len(memo) < 1_000_000:   # bound task memory
                            memo[key] = tags_p
                        for i in todo[key]:
                            pred[i] = tags_p
                yield pd.DataFrame({
                    "url": pdf["url"], "sent_id": pdf["sent_id"],
                    "tokens": pdf["tokens"], "pred_tags": pred,
                    "n_tokens": lengths,
                })

    else:
        raise ValueError(f"unknown mode {mode!r}")

    return sentences.select("url", "sent_id", "tokens").mapInPandas(run, _TAGGED_SCHEMA)


# --------------------------------------------------- fused fast path

# Flat union-typed output: kind=0 → mention row, kind=1 → pair row.
# Nested list<struct> columns were measured 3-4× slower than flat
# primitives in the pandas→Arrow conversion (the stage's actual
# bottleneck at 200k pages), so the fused UDF emits flat rows and the
# JVM side filters/projects the two views.
_FUSED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("sent_id", IntegerType()),
    StructField("kind", IntegerType()),
    StructField("a", IntegerType()),        # mention_id | subj_mention_id
    StructField("b", IntegerType()),        # start      | obj_mention_id
    StructField("c", IntegerType()),        # end        | gap
    StructField("type_a", StringType()),    # tag_type   | subj_type
    StructField("type_b", StringType()),    # -          | obj_type
    StructField("surf_a", StringType()),    # surface    | subj_surface
    StructField("surf_b", StringType()),    # -          | obj_surface
    StructField("between", StringType()),   # -          | between phrase
])


def pages_to_mention_pairs(
    pages: DataFrame,
    aliases: list[dict] | None = None,
    lang: str | None = "en",
    entity_types: tuple[str, ...] = ENTITY_TYPES,
    mode: str = "gazetteer",
    weights: TaggerWeights | None = None,
    vocab: dict | None = None,
    char_vocab: dict | None = None,
    grammar_prior: bool | None = None,
    dp_free: bool = True,
) -> DataFrame:
    """The 100 TB inference hot path: ONE Arrow crossing from pages.

    ``dp_free=False`` forces the full Viterbi DP in gazetteer mode
    (bench instrumentation; see :func:`gazetteer_viterbi`).

    JVM side does only the lang filter + projection (column pruning
    reaches the scan); python does everything row-local — line split,
    tokenize, gazetteer match, CRF Viterbi, BIOES span scan, and
    in-sentence mention-pair generation (between-phrase included) — and
    emits narrow columns (no token arrays, no tag arrays cross back).

    Downstream, mentions = explode(spans) and triples = explode(pairs)
    ⨝ broadcast(lexicon): the whole pipeline has ZERO exchanges.
    Same semantics as tag_sentences→mentions_table→sentence_local_triples
    (asserted equivalent in tests).
    """
    from .spans import extract_spans

    spark = pages.sparkSession
    tags = iobes_tags(entity_types)
    tag_ids = {t: i for i, t in enumerate(tags)}
    payload: dict = {
        "mode": mode, "tag_ids": tag_ids, "tags": tags,
        "transitions": grammar_transitions(entity_types),
    }
    if mode == "gazetteer":
        if aliases is None:
            raise ValueError("gazetteer mode needs aliases")
        payload["surface_index"] = build_surface_index(aliases)
        payload["dp_free"] = dp_free
    elif mode == "neural":
        if weights is None or vocab is None or char_vocab is None:
            raise ValueError("neural mode needs weights + vocabs")
        payload.update(
            weights=weights, vocab=vocab, chars=char_vocab,
            unk=vocab.get("<UNK>", 0),
            decode_trans=_decode_transitions(
                weights, grammar_prior, payload["transitions"]))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    bc = spark.sparkContext.broadcast(payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc.value
        tlist, trans = v["tags"], v["transitions"]
        # task-lifetime template memo: decode → BIOES spans → in-sentence
        # pair generation is a pure function of the token sequence, and
        # corpora repeat sentences heavily (boilerplate; the synthetic
        # corpus is ~15% unique) — repeats replay the cached (mentions,
        # pairs) template under their own (url, sent_id). Bounded;
        # recomputed from the input every run, nothing survives the task.
        memo: dict[tuple, tuple] = {}
        for pdf in batches:
            urls, sids, tok_lists = [], [], []
            for url, text in zip(pdf["url"], pdf["text"]):
                # tokenization contract = JVM \s+ ([ \t\n\x0B\f\r]). On
                # plain-ASCII text str.split() is identical and ~3×
                # faster (the hot path) — EXCEPT the ASCII separators
                # \x1c-\x1f, which str.split() treats as whitespace and
                # Java \s does not, so those pages (and non-ASCII ones,
                # U+00A0 etc.) take the pinned ASCII-class regex.
                fast = text.isascii() and _FS_SEPS.search(text) is None
                for sent_id, line in enumerate(text.split("\n")):
                    toks = line.split() if fast else py_tokenize_ws(line)
                    if toks:
                        urls.append(url)
                        sids.append(sent_id)
                        tok_lists.append(toks)
            B = len(tok_lists)
            if B == 0:
                continue
            keys = [tuple(t) for t in tok_lists]
            todo: dict[tuple, list] = {}
            for k, toks in zip(keys, tok_lists):
                if k not in memo and k not in todo:
                    todo[k] = toks
            local: dict[tuple, tuple] = {}   # overflow when memo is full
            if todo:
                uniq = list(todo.values())
                if v["mode"] == "gazetteer":
                    # exact DP-free decode (see gazetteer_decode:
                    # candidate optimality + tie-break proof, grammar-
                    # checked with a real-Viterbi fallback); the unfused
                    # path keeps full Viterbi so the equivalence tests
                    # differentially verify this shortcut
                    decode = (gazetteer_decode if v["dp_free"]
                              else gazetteer_viterbi)
                    paths = decode(
                        uniq, v["surface_index"], v["tag_ids"], trans)
                else:
                    w: TaggerWeights = v["weights"]
                    feats = [featurize_sentence(t, v["vocab"], v["chars"],
                                                v["unk"]) for t in uniq]
                    em, lens_u = neural_emissions(
                        w, [f[0] for f in feats], [f[1] for f in feats],
                        [f[2] for f in feats])
                    paths = viterbi_decode(em, lens_u, v["decode_trans"])
                for (k, toks), p in zip(todo.items(), paths):
                    spans = extract_spans([tlist[i] for i in p], toks)
                    ments = [(mid, s["start"], s["end"], s["tag_type"],
                              s["surface"]) for mid, s in enumerate(spans)]
                    prs = []
                    for i, m1 in enumerate(spans):
                        for j in range(i + 1, len(spans)):
                            m2 = spans[j]
                            if m1["end"] > m2["start"]:
                                continue
                            prs.append((
                                i, j, m2["start"] - m1["end"],
                                m1["tag_type"], m2["tag_type"],
                                m1["surface"], m2["surface"],
                                " ".join(toks[m1["end"]:m2["start"]])))
                    tpl = (ments, prs)
                    if len(memo) < 1_000_000:
                        memo[k] = tpl
                    else:
                        local[k] = tpl
            out = {k: [] for k in ("url", "sent_id", "kind", "a", "b", "c",
                                   "type_a", "type_b", "surf_a", "surf_b",
                                   "between")}
            app = {k: out[k].append for k in out}
            for url, sid, k in zip(urls, sids, keys):
                tpl = memo.get(k)
                if tpl is None:
                    tpl = local[k]
                ments, prs = tpl
                for mid, st, en, tt, surf in ments:
                    app["url"](url); app["sent_id"](sid); app["kind"](0)
                    app["a"](mid); app["b"](st); app["c"](en)
                    app["type_a"](tt); app["type_b"](None)
                    app["surf_a"](surf); app["surf_b"](None)
                    app["between"](None)
                for i, j, gap, ta, tb, sa, sb, btw in prs:
                    app["url"](url); app["sent_id"](sid); app["kind"](1)
                    app["a"](i); app["b"](j); app["c"](gap)
                    app["type_a"](ta); app["type_b"](tb)
                    app["surf_a"](sa); app["surf_b"](sb)
                    app["between"](btw)
            # int columns as int32 ndarrays: pd.DataFrame over plain int
            # lists re-boxes per element (measured ~100 ms / 35k rows);
            # ndarray columns are zero-copy into the frame
            for col in ("sent_id", "kind", "a", "b", "c"):
                out[col] = np.asarray(out[col], dtype=np.int32)
            yield pd.DataFrame(out)

    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return df.select("url", "text").mapInPandas(run, _FUSED_SCHEMA)


def fused_mentions(fused: DataFrame) -> DataFrame:
    """kind=0 rows → mentions table (same schema as mentions_table)."""
    return (
        fused.filter(F.col("kind") == 0)
        .select("url", "sent_id",
                F.col("a").alias("mention_id"),
                F.col("b").alias("start"),
                F.col("c").alias("end"),
                F.col("type_a").alias("tag_type"),
                F.col("surf_a").alias("surface"))
    )


def fused_triples(
    fused: DataFrame,
    predicate_lexicon: dict[str, str],
    cooccurrence_window: int | None = None,
) -> DataFrame:
    """explode(pairs) ⨝ broadcast(lexicon) → triples (zero exchanges)."""
    spark = fused.sparkSession
    lex = spark.createDataFrame(
        sorted(predicate_lexicon.items()), "between string, pred string")
    pairs = (
        fused.filter(F.col("kind") == 1)
        .select(
            "url", "sent_id",
            F.col("a").alias("subj_mention_id"),
            F.col("b").alias("obj_mention_id"),
            F.col("surf_a").alias("subj_surface"),
            F.col("type_a").alias("subj_type"),
            F.col("surf_b").alias("obj_surface"),
            F.col("type_b").alias("obj_type"),
            F.col("c").alias("gap"),
            "between",
        )
    )
    out_cols = [
        "url", "sent_id", "subj_surface", "subj_type", "pred",
        "obj_surface", "obj_type", "subj_mention_id", "obj_mention_id",
    ]
    result = pairs.join(F.broadcast(lex), on="between", how="inner").select(*out_cols)
    if cooccurrence_window is not None:
        coocc = (
            pairs.join(F.broadcast(lex), on="between", how="left_anti")
            .filter(F.col("gap") <= cooccurrence_window)
            .withColumn("pred", F.lit("cooccurs_with"))
            .select(*out_cols)
        )
        result = result.unionByName(coocc)
    return result


# ------------------------------------------------- physical helpers


def repartition_by_length(sentences: DataFrame, partitions: int | None = None) -> DataFrame:
    """O1 — sort-by-length batching (loader.py:239, eval.py:122): range-
    partition on token count and sort within partitions so Arrow batches
    hold similar-length sentences → minimal padding waste in the padded
    [B, L] tensors. Purely physical; no semantic effect (the fused/
    tagged outputs are row-keyed, never order-dependent)."""
    n = partitions or sentences.sparkSession.sparkContext.defaultParallelism
    # hash-partition on the TOKEN SEQUENCE, then sort by length inside
    # each partition. This keeps the property the stage actually needs —
    # Arrow batches of similar-length sentences (the within-partition
    # sort) — while fixing two costs of the previous
    # repartitionByRange((_len, row-hash)) form:
    #   * range partitioning runs a SAMPLING JOB over the input before
    #     every action to estimate bounds; hash partitioning doesn't;
    #   * hashing the token array co-locates every COPY of a repeated
    #     sentence in one partition (web corpora repeat sentences
    #     heavily), which is exactly what the tagger's task-lifetime
    #     decode memo wants — the range form split a length class
    #     across partition boundaries.
    # Balance: keys are full token sequences (high cardinality), so n
    # near-equal partitions (regression-tested); deterministic.
    return (
        sentences.repartition(n, F.hash("tokens"))
        .sortWithinPartitions(F.desc(F.size("tokens")))
    )
