"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1/§3/§4).

Generates the ``pages(url, warc_ts, html, text, lang)`` table the north
rule's pipeline consumes, with gold mentions / gold triples / alias
dictionary known BY CONSTRUCTION — sentences are built from templates over
a fixed gazetteer, wrapped in HTML (plus script/style/comment noise), and
``text`` is set to ``extract_text(html)`` so the byte-identical invariant
is anchored to the engine's own extractor
(:mod:`ner_pytorch_spark.functions.extraction`).

Everything is seeded (``numpy.random.default_rng(seed)``), pure (no
wall-clock, no dict-order dependence), and cheap enough to synthesize at
bench scale on the fly. Domain distribution is Zipf-skewed to exercise
salted repartitioning.

The reference has no corpus generator; the CoNLL-shaped gold tags mirror
/root/reference/dataset/eng.train via /root/reference/loader.py:21-42.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np

from .functions.extraction import extract_text

SEED = 42
EMB_DIM = 32

# --------------------------------------------------------------- gazetteer
# (canonical_id, tag_type, [surfaces]); surface[0] is the canonical form.
# Surfaces are unique across the whole gazetteer so mention detection is
# unambiguous by construction.

_PER = [
    ["Alice Johnson", "Johnson", "Ms. Johnson"],
    ["Robert Smith", "Smith", "Mr. Smith"],
    ["Maria Garcia", "Garcia"],
    ["Chen Wei", "Wei"],
    ["Yuki Tanaka", "Tanaka"],
    ["Omar Hassan", "Hassan"],
    ["Anna Kowalski", "Kowalski"],
    ["David Miller", "Miller"],
    ["Sofia Rossi", "Rossi"],
    ["James Brown", "Brown"],
    ["Linda Davis", "Davis"],
    ["Pierre Dubois", "Dubois"],
    ["Elena Petrova", "Petrova"],
    ["Carlos Mendez", "Mendez"],
    ["Fatima Ali", "Ali"],
    ["Erik Larsen", "Larsen"],
]
_ORG = [
    ["Acme Corporation", "Acme", "Acme Corp"],
    ["Globex Industries", "Globex"],
    ["Initech Systems", "Initech"],
    ["Umbrella Holdings", "Umbrella"],
    ["Stark Technologies", "Stark Tech"],
    ["Wayne Enterprises", "Wayne Ent"],
    ["Cyberdyne Labs", "Cyberdyne"],
    ["Tyrell Analytics", "Tyrell"],
    ["Hooli Networks", "Hooli"],
    ["Vandelay Imports", "Vandelay"],
    ["Wonka Foods", "Wonka"],
    ["Soylent Nutrition", "Soylent"],
]
_LOC = [
    ["New York", "NYC"],
    ["San Francisco"],
    ["London"],
    ["Paris"],
    ["Berlin"],
    ["Tokyo"],
    ["Shanghai"],
    ["Mumbai"],
    ["Lagos"],
    ["Toronto"],
    ["Sydney"],
    ["Madrid"],
    ["Oslo"],
    ["Cairo"],
]
_MISC = [
    ["World Cup"],
    ["Olympic Games", "Olympics"],
    ["Nobel Prize"],
    ["Eurovision"],
]


@dataclass(frozen=True)
class Entity:
    canonical_id: int
    tag_type: str
    surfaces: tuple[str, ...]


def gazetteer() -> list[Entity]:
    ents: list[Entity] = []
    cid = 0
    for tag_type, bank in (("PER", _PER), ("ORG", _ORG), ("LOC", _LOC), ("MISC", _MISC)):
        for surfaces in bank:
            ents.append(Entity(cid, tag_type, tuple(surfaces)))
            cid += 1
    return ents


# Relation templates: (pred_name, subj_type, connector tokens, obj_type,
# trailing tokens). Connector token runs double as the predicate lexicon
# for triple extraction.
RELATION_TEMPLATES = [
    ("works_for", "PER", ("works", "for"), "ORG", (".",)),
    ("born_in", "PER", ("was", "born", "in"), "LOC", (".",)),
    ("based_in", "ORG", ("is", "based", "in"), "LOC", (".",)),
    ("visited", "PER", ("visited",), "LOC", ("last", "year", ".")),
    ("met", "PER", ("met",), "PER", ("on", "Monday", ".")),
    ("acquired", "ORG", ("acquired",), "ORG", ("in", "2019", ".")),
    ("won", "PER", ("won", "the"), "MISC", (".",)),
    ("hosted", "LOC", ("hosted", "the"), "MISC", (".",)),
]

PREDICATE_LEXICON = {" ".join(t[2]): t[0] for t in RELATION_TEMPLATES}

# Arc-shaped relation templates: the predicate VERB is surrounded by
# filler (pre/mid/post), so the exact between-phrase never matches the
# pattern lexicon — only the verb-arc layer (triples.verb_arc_triples,
# nearest-preceding-subject / nearest-following-object) recovers these.
# Shape: (pred, subj_type, pre, mid, verb, post, obj_type, tail).
ARC_TEMPLATES = [
    ("acquired", "ORG", (), ("reportedly",), "acquired",
     ("rival",), "ORG", ("in", "March", ".")),
    ("visited", "PER", ("Earlier", "this", "month", ","), (), "visited",
     ("the", "city", "of"), "LOC", (".",)),
    ("met", "PER", (), ("briefly",), "met",
     ("with",), "PER", ("at", "the", "summit", ".")),
    ("works_for", "PER", (), ("has", "now"), "joined",
     (), "ORG", ("as", "director", ".")),
    ("won", "PER", ("Against", "all", "odds", ","), (), "won",
     ("a", "hard-fought"), "MISC", (".",)),
    ("hosted", "LOC", (), ("proudly",), "hosted",
     ("this", "season", "'s"), "MISC", (".",)),
]

# verb token → predicate, for the arc layer; covers BOTH the arc
# templates' verbs and the plain templates' (arcs over already
# pattern-matched pairs are dropped by the left_anti layering).
VERB_ARC_LEXICON = {t[4]: t[0] for t in ARC_TEMPLATES}

_FILLER = [
    "The quarterly report was published on time .",
    "Markets closed higher after 3 days of losses .",
    "A new policy will take effect in 2025 .",
    "Local officials announced the results yesterday .",
    "The committee meets every second Tuesday .",
    "IT budgets grew by 12 percent this year .",
    "Rain is expected over the weekend .",
    "The museum reopened after renovation .",
]
_FILLER_DE = [
    "Der Bericht wurde gestern veroeffentlicht .",
    "Die Sitzung findet am Dienstag statt .",
    "Das Wetter bleibt am Wochenende trocken .",
]

_DOMAINS = [f"site{i:03d}.example.com" for i in range(50)]


def _zipf_weights(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def _pick(rng: np.random.Generator, seq):
    return seq[int(rng.integers(0, len(seq)))]


def _sentence_from_template(rng: np.random.Generator, ents_by_type):
    """Build one relation sentence → (tokens, mentions, triple).

    mentions: list[(start, end_exclusive, tag_type, surface)];
    triple: (subj_canonical_id, pred, obj_canonical_id).
    """
    pred, st, conn, ot, tail = RELATION_TEMPLATES[int(rng.integers(0, len(RELATION_TEMPLATES)))]
    subj = _pick(rng, ents_by_type[st])
    obj = _pick(rng, ents_by_type[ot])
    while obj.canonical_id == subj.canonical_id:
        obj = _pick(rng, ents_by_type[ot])
    subj_surface = _pick(rng, subj.surfaces)
    obj_surface = _pick(rng, obj.surfaces)
    tokens: list[str] = []
    mentions = []
    s_tok = subj_surface.split(" ")
    mentions.append((0, len(s_tok), subj.tag_type, subj_surface))
    tokens += s_tok
    tokens += list(conn)
    o_start = len(tokens)
    o_tok = obj_surface.split(" ")
    mentions.append((o_start, o_start + len(o_tok), obj.tag_type, obj_surface))
    tokens += o_tok
    tokens += list(tail)
    return tokens, mentions, (subj.canonical_id, pred, obj.canonical_id)


def _sentence_from_arc_template(rng: np.random.Generator, ents_by_type):
    """Arc relation sentence → (tokens, mentions, triple); the predicate
    verb is NOT the exact between-phrase (filler on both sides)."""
    pred, st, pre, mid, verb, post, ot, tail = ARC_TEMPLATES[
        int(rng.integers(0, len(ARC_TEMPLATES)))]
    subj = _pick(rng, ents_by_type[st])
    obj = _pick(rng, ents_by_type[ot])
    while obj.canonical_id == subj.canonical_id:
        obj = _pick(rng, ents_by_type[ot])
    subj_surface = _pick(rng, subj.surfaces)
    obj_surface = _pick(rng, obj.surfaces)
    tokens: list[str] = list(pre)
    mentions = []
    s_tok = subj_surface.split(" ")
    mentions.append((len(tokens), len(tokens) + len(s_tok),
                     subj.tag_type, subj_surface))
    tokens += s_tok
    tokens += list(mid)
    tokens.append(verb)
    tokens += list(post)
    o_start = len(tokens)
    o_tok = obj_surface.split(" ")
    mentions.append((o_start, o_start + len(o_tok), obj.tag_type, obj_surface))
    tokens += o_tok
    tokens += list(tail)
    return tokens, mentions, (subj.canonical_id, pred, obj.canonical_id)


def _ents_by_type() -> dict[str, list[Entity]]:
    out: dict[str, list[Entity]] = {}
    for e in gazetteer():
        out.setdefault(e.tag_type, []).append(e)
    return out


def generate_page(i: int, seed: int = SEED, ents_by_type=None, dom_w=None,
                  arc_frac: float = 0.0):
    """Generate page ``i`` independently (per-page rng seeded by
    (seed, i)) → (page dict, gold_mentions, gold_triples).

    ``arc_frac`` > 0 replaces that fraction of would-be filler sentences
    with ARC_TEMPLATES relation sentences (predicate verb NOT the exact
    between-phrase). The default 0.0 draws NOTHING extra from the rng,
    so existing corpora stay byte-identical.

    Per-page determinism is what lets the corpus synthesize ON THE
    EXECUTORS — at bench/scale the pages table is produced by a
    distributed ``spark.range(n) → mapInPandas`` with no driver
    materialization, exactly how a real 10^12-row synthetic input would
    be laid down.
    """
    rng = np.random.default_rng([seed, i])
    if ents_by_type is None:
        ents_by_type = _ents_by_type()
    if dom_w is None:
        dom_w = _zipf_weights(len(_DOMAINS))
    base_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)

    gold_mentions, gold_triples = [], []
    domain = _DOMAINS[int(rng.choice(len(_DOMAINS), p=dom_w))]
    url = f"https://{domain}/page/{i:08d}"
    warc_ts = base_ts + timedelta(days=int(rng.integers(0, 90)),
                                  seconds=int(rng.integers(0, 86400)))
    lang = "en" if rng.random() < 0.95 else str(_pick(rng, ["de", "fr"]))

    n_sent = int(rng.integers(2, 7))
    body_lines: list[str] = []
    title = f"Daily briefing {i % 100}"
    sent_id = 1  # 0 is the title line
    for _ in range(n_sent):
        if lang != "en":
            body_lines.append(_pick(rng, _FILLER_DE))
            sent_id += 1
            continue
        tokens = mentions = triple = None
        if rng.random() < 0.6:
            tokens, mentions, triple = _sentence_from_template(rng, ents_by_type)
        elif arc_frac and rng.random() < arc_frac:
            tokens, mentions, triple = _sentence_from_arc_template(
                rng, ents_by_type)
        if tokens is not None:
            body_lines.append(" ".join(tokens))
            for (s, e, tt, surf) in mentions:
                gold_mentions.append(
                    {"url": url, "sent_id": sent_id, "start": s, "end": e,
                     "tag_type": tt, "surface": surf})
            gold_triples.append(
                {"url": url, "sent_id": sent_id, "subj_id": triple[0],
                 "pred": triple[1], "obj_id": triple[2]})
        else:
            body_lines.append(_pick(rng, _FILLER))
        sent_id += 1

    paras = "".join(f"<p>{line}</p>" for line in body_lines)
    noise = (
        "<script>var x = 1; console.log('tracker');</script>"
        "<style>p { color: #333; }</style>"
        "<!-- generated page -->"
    )
    html = (
        f"<html><head><title>{title}</title>{noise}</head>"
        f"<body>{paras}</body></html>"
    ).encode("utf-8")
    text = extract_text(html)
    page = {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}
    return page, gold_mentions, gold_triples


def generate_pages(n_pages: int, seed: int = SEED, arc_frac: float = 0.0):
    """Driver-side corpus + gold rows. Deterministic in (n_pages, seed).

    Returns (pages, gold_mentions, gold_triples):
      pages:        [{url, warc_ts, html, text, lang}]
      gold_mentions:[{url, sent_id, start, end, tag_type, surface}]
      gold_triples: [{url, sent_id, subj_id, pred, obj_id}]
    sent_id counts non-empty text lines from the extractor (title = 0).
    """
    ents = _ents_by_type()
    dom_w = _zipf_weights(len(_DOMAINS))
    pages, gold_mentions, gold_triples = [], [], []
    for i in range(n_pages):
        p, gm, gt = generate_page(i, seed, ents, dom_w, arc_frac)
        pages.append(p)
        gold_mentions.extend(gm)
        gold_triples.extend(gt)
    return pages, gold_mentions, gold_triples


# ------------------------------------------------------------ embeddings
# Token vectors are hash-seeded (stable across processes); alias pooled
# embeddings follow the reference's mean/min/max pooling
# (/root/reference/word_rep.py:114-121).


def token_vector(token: str, dim: int = EMB_DIM) -> np.ndarray:
    from .functions.embeddings import hash_token_vector

    return hash_token_vector(token, dim)


def pooled_embedding(surface: str, mode: str = "mean", dim: int = EMB_DIM) -> np.ndarray:
    vecs = np.stack([token_vector(t, dim) for t in surface.split(" ")])
    if mode == "mean":
        out = vecs.mean(axis=0)
    elif mode == "min":
        out = vecs.min(axis=0)
    elif mode == "max":
        out = vecs.max(axis=0)
    else:
        raise ValueError(mode)
    return out.astype(np.float32)


def alias_rows(dim: int = EMB_DIM) -> list[dict]:
    """Broadcast alias dimension table (FIXTURES.md §4)."""
    rows = []
    for e in gazetteer():
        for surf in e.surfaces:
            rows.append({
                "tag_type": e.tag_type,
                "surface": surf,
                "canonical_id": e.canonical_id,
                "emb_mean": pooled_embedding(surf, "mean", dim).tolist(),
                "emb_min": pooled_embedding(surf, "min", dim).tolist(),
                "emb_max": pooled_embedding(surf, "max", dim).tolist(),
            })
    return rows


def gold_sentences_dataframe(spark, n_pages: int, seed: int = SEED,
                             arc_frac: float = 0.0):
    """(url, page_idx, sent_id, tokens, gold_tags) for en pages — gold
    IOBES tags assembled from the by-construction mentions. The shared
    input of the trainer tests and the kg_trained_prf driver query."""
    pages_rows, gold_mentions, _ = generate_pages(n_pages, seed, arc_frac)
    gold: dict[tuple, tuple] = {}
    idx: dict[str, int] = {}
    for i, p in enumerate(pages_rows):
        if p["lang"] != "en":
            continue
        idx[p["url"]] = i
        for sid, line in enumerate(p["text"].split("\n")):
            toks = line.split()
            if toks:
                gold[(p["url"], sid)] = (toks, ["O"] * len(toks))
    for m in gold_mentions:
        entry = gold.get((m["url"], m["sent_id"]))
        if entry is None:
            continue
        _, tags = entry
        s, e, tt = m["start"], m["end"], m["tag_type"]
        if e - s == 1:
            tags[s] = f"S-{tt}"
        else:
            tags[s] = f"B-{tt}"
            for i in range(s + 1, e - 1):
                tags[i] = f"I-{tt}"
            tags[e - 1] = f"E-{tt}"
    rows = [(u, idx[u], sid, toks, tags)
            for (u, sid), (toks, tags) in gold.items()]
    return spark.createDataFrame(
        rows, "url string, page_idx int, sent_id int, "
              "tokens array<string>, gold_tags array<string>")


# ------------------------------------------------- adversarial corpus
# Hardened held-out gate for in-engine training (kg_trained_prf): a
# gazetteer echo scores ~0 here — the tag depends on CONTEXT (ambiguous
# surfaces), on char/cap generalization (OOV test-only names), and on
# boundary discipline (adjacent same-type mentions).

# surfaces that are PER in person contexts and LOC in place contexts —
# membership alone cannot resolve them
AMBIGUOUS_SURFACES = ["Lincoln", "Madison", "Jordan",
                      "Hamilton", "Victoria", "Chester"]
# PER surfaces that appear ONLY on pages >= oov_from (held-out split).
# First half: unseen first name + TRAINED surname (realistic OOV — the
# tagger must compose cap/char generalization on the new token with the
# known tail); second half: fully unseen names, the hard tail where only
# capitalization + context carry signal (a frozen random char encoder
# has no name-shape features — the reference's trained char-LSTM would;
# documented encoder gap).
OOV_PER_SURFACES = ["Lisa Johnson", "Marco Rossi", "Priya Miller",
                    "Tomas Garcia", "Nadia Smith", "Oliver Tanaka",
                    "Zara Okafor", "Henrik Vestergaard", "Noor Rahimi",
                    "Aiko Fujimori", "Dmitri Volkov", "Keanu Ramos"]

_AMBIG_PER_CTX = [
    (("",), ("spoke", "at", "the", "conference", ".")),
    (("",), ("signed", "the", "agreement", "on", "Monday", ".")),
]
_AMBIG_LOC_CTX = [
    (("The", "town", "of"), ("hosted", "a", "festival", ".")),
    (("He", "moved", "to"), ("last", "year", ".")),
]


def _adv_sentence(rng: np.random.Generator, ents_by_type, oov: bool):
    """One adversarial sentence → (tokens, [(start, end, type)])."""
    kind = int(rng.integers(0, 4))
    toks: list[str] = []
    ments: list[tuple[int, int, str]] = []

    def put(surface: str, tt: str):
        st = surface.split(" ")
        ments.append((len(toks), len(toks) + len(st), tt))
        toks.extend(st)

    if kind == 0:           # ambiguous surface, context decides the type
        surf = _pick(rng, AMBIGUOUS_SURFACES)
        if rng.random() < 0.5:
            pre, post = _pick(rng, _AMBIG_PER_CTX)
            tt = "PER"
        else:
            pre, post = _pick(rng, _AMBIG_LOC_CTX)
            tt = "LOC"
        toks.extend(t for t in pre if t)
        put(surf, tt)
        toks.extend(post)
    elif kind == 1:         # boundary-adjacent same-type mentions
        if rng.random() < 0.5:
            a = _pick(rng, OOV_PER_SURFACES) if oov else \
                _pick(rng, _pick(rng, ents_by_type["PER"]).surfaces)
            b = _pick(rng, _pick(rng, ents_by_type["PER"]).surfaces)
            put(a, "PER")
            put(b, "PER")
            toks.extend(["met", "in"])
            put(_pick(rng, _pick(rng, ents_by_type["LOC"]).surfaces), "LOC")
            toks.append(".")
        else:
            put(_pick(rng, _pick(rng, ents_by_type["ORG"]).surfaces), "ORG")
            put(_pick(rng, _pick(rng, ents_by_type["ORG"]).surfaces), "ORG")
            toks.extend(["announced", "a", "merger", "."])
    elif kind == 2 and oov:  # OOV name in a trained context
        put(_pick(rng, OOV_PER_SURFACES), "PER")
        toks.extend(["works", "for"])
        put(_pick(rng, _pick(rng, ents_by_type["ORG"]).surfaces), "ORG")
        toks.append(".")
    else:                    # regular template sentence
        t, ms, _ = _sentence_from_template(rng, ents_by_type)
        return t, [(s, e, tt) for (s, e, tt, _) in ms]
    return toks, ments


def _iobes(n: int, ments: list[tuple[int, int, str]]) -> list[str]:
    tags = ["O"] * n
    for s, e, tt in ments:
        if e - s == 1:
            tags[s] = f"S-{tt}"
        else:
            tags[s] = f"B-{tt}"
            for i in range(s + 1, e - 1):
                tags[i] = f"I-{tt}"
            tags[e - 1] = f"E-{tt}"
    return tags


def adversarial_sentences_dataframe(spark, n_pages: int, seed: int = SEED,
                                    oov_from: int | None = None):
    """(url, page_idx, sent_id, tokens, gold_tags) adversarial corpus.

    Pages with ``page_idx >= oov_from`` (default: last quarter) draw
    their kind-1/kind-2 person mentions from :data:`OOV_PER_SURFACES`;
    train on the earlier pages and the held-out block measures genuine
    generalization, not memorization. Deterministic in (n_pages, seed).
    """
    if oov_from is None:
        oov_from = (3 * n_pages) // 4
    ents = _ents_by_type()
    rows = []
    for i in range(n_pages):
        rng = np.random.default_rng([seed, 7_000_000 + i])
        n_sent = int(rng.integers(3, 7))
        for sid in range(n_sent):
            if rng.random() < 0.25:
                toks = _pick(rng, _FILLER).split(" ")
                ments: list[tuple[int, int, str]] = []
            else:
                toks, ments = _adv_sentence(rng, ents, i >= oov_from)
            rows.append((f"adv://{i}", i, sid, toks,
                         _iobes(len(toks), ments)))
    return spark.createDataFrame(
        rows, "url string, page_idx int, sent_id int, "
              "tokens array<string>, gold_tags array<string>")


PAGES_SCHEMA_DDL = ("url string, warc_ts timestamp, html binary, "
                    "text string, lang string")


def pages_dataframe(spark, n_pages: int, seed: int = SEED,
                    partitions: int | None = None, distributed: bool = False,
                    arc_frac: float = 0.0):
    """Materialize the synthetic pages corpus as a Spark DataFrame.

    ``distributed=True`` synthesizes pages ON THE EXECUTORS
    (spark.range → mapInPandas over page ids, per-page rng) — no driver
    materialization, the shape a 10^12-row synthetic input needs.
    Driver-side (default) is convenient for small tests. Both produce
    byte-identical rows for the same (n_pages, seed).
    """
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType, TimestampType)

    schema = StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ])

    if distributed:
        import pandas as pd

        n_parts = partitions or spark.sparkContext.defaultParallelism * 2

        def gen(batches):
            ents = _ents_by_type()
            dom_w = _zipf_weights(len(_DOMAINS))
            for pdf in batches:
                pages = [generate_page(int(i), seed, ents, dom_w, arc_frac)[0]
                         for i in pdf["id"]]
                yield pd.DataFrame({
                    "url": [p["url"] for p in pages],
                    "warc_ts": [p["warc_ts"].replace(tzinfo=None) for p in pages],
                    "html": [p["html"] for p in pages],
                    "text": [p["text"] for p in pages],
                    "lang": [p["lang"] for p in pages],
                })

        df = spark.range(0, n_pages, 1, n_parts).mapInPandas(gen, schema)
        return df

    pages, _, _ = generate_pages(n_pages, seed, arc_frac)
    rows = [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in pages]
    df = spark.createDataFrame(rows, schema)
    if partitions:
        df = df.repartition(partitions, "url")
    return df
