"""C4b dependency re-linearization paraphrase — hand-built goldens on
fake parses, reference-replay parity for the merge steps
(paraphrase_model.py:43-59,143-191), determinism, identity filter, and
the Spark operator end-to-end."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from ner_pytorch_spark.operators.paraphrase import (
    OrderProjector, anneal, contract_tree, family_pairs,
    merge_entity_tokens, merge_paren_spans, paraphrase_sentence,
    project_tree, train_projector, tree_paraphrase)


# ---------------------------------------------------------------- merge

def _reference_combine_tag(word_list):
    """Literal replay of paraphrase_model.py:43-59 (combine_tag) for
    differential testing — [[word, tag], ...] in, merged lists out."""
    import re
    import string
    from collections import Counter
    res, tag_list, true_order = [], [], []
    punct_counter = Counter()
    for word in word_list:
        true_order.append(word[0])
        if word[0] in string.punctuation and word[-1] == "O":
            punct_counter[word[0]] += 1
        if res and (word[-1].startswith("I") or word[-1].startswith("E")
                    or re.match(r"'\w+", word[0])):
            res[-1] = res[-1] + " " + word[0]
            tag_list[-1] = tag_list[-1] + " " + word[-1]
        else:
            res.append(word[0])
            tag_list.append(word[-1])
    return res, tag_list, punct_counter


@pytest.mark.parametrize("words,tags", [
    (["John", "Smith", "works", "at", "Acme", "Corp", "."],
     ["B-PER", "E-PER", "O", "O", "B-ORG", "E-ORG", "O"]),
    (["It", "'s", "here", "(", "really", ")", "now"],
     ["O", "O", "O", "O", "O", "O", "O"]),
    (["U.N.", "official", "Ekeus", "heads", "for", "Baghdad", "."],
     ["S-ORG", "O", "S-PER", "O", "O", "S-LOC", "O"]),
])
def test_merge_matches_reference_replay(words, tags):
    texts, tstrs, groups, punct = merge_entity_tokens(words, tags)
    ref_res, ref_tags, ref_punct = _reference_combine_tag(
        [[w, t] for w, t in zip(words, tags)])
    assert texts == ref_res
    assert tstrs == ref_tags
    assert punct == {k: v for k, v in ref_punct.items() if v}
    # groups partition the original indices in order
    flat = [i for g in groups for i in g]
    assert flat == list(range(len(words)))


def test_paren_merge_golden():
    words = ["He", "said", "(", "very", "loudly", ")", "hello"]
    tags = ["O"] * 7
    texts, tstrs, groups, punct = merge_entity_tokens(words, tags)
    t2, g2 = texts, groups
    t2, s2, g2 = merge_paren_spans(texts, tstrs, groups, "(")
    assert t2 == ["He", "said", "( very loudly )", "hello"]
    assert g2[2] == [2, 3, 4, 5]
    assert s2[2] == "O O O O"


def test_nested_unmatched_parens():
    # unmatched right paren is left alone; overlapping spans coalesce
    words = [")", "a", "(", "b", "(", "c", ")", "d", ")", "e"]
    tags = ["O"] * 10
    texts, tstrs, groups, _ = merge_entity_tokens(words, tags)
    t2, s2, g2 = merge_paren_spans(texts, tstrs, groups, "(")
    assert t2 == [")", "a", "( b ( c ) d )", "e"]


# ------------------------------------------------------------- contract

def _chain_arcs(n, root=0):
    """token i heads at i-1 (root heads 0) — a simple spine."""
    return [(i + 1, 0 if i == root else i, "dep" if i else "root",
             "VERB" if i == root else "NOUN") for i in range(n)]


def test_contract_tree_identity_groups():
    # no merging: contraction is the original tree, 0-based
    arcs = [(1, 0, "root", "VERB"), (2, 1, "nsubj", "NOUN"),
            (3, 1, "obj", "NOUN")]
    ch, dep, pos = contract_tree(arcs, [[0], [1], [2]])
    assert ch == {-1: [0], 0: [1, 2]}
    assert dep == ["root", "nsubj", "obj"]
    assert pos == ["VERB", "NOUN", "NOUN"]


def test_contract_tree_merged_span():
    # tokens 1,2 merge; internal arc (2→1) disappears, external head of
    # the group (token1's head = verb 0) carries the label
    arcs = [(1, 0, "root", "VERB"), (2, 1, "nsubj", "PROPN"),
            (3, 2, "flat", "PROPN"), (4, 1, "obj", "NOUN")]
    ch, dep, pos = contract_tree(arcs, [[0], [1, 2], [3]])
    assert ch == {-1: [0], 0: [1, 2]}
    assert dep[1] == "nsubj" and pos[1] == "PROPN"


# ----------------------------------------------------- anneal/projection

def test_anneal_reference_semantics():
    assert anneal(0.8, 1) == 0.8
    assert anneal(0.8, math.inf) == 0.5
    assert anneal(0.8, 0) == 1.0
    assert anneal(0.3, 0) == 0.0
    # t<1 sharpens, t>1 flattens
    assert anneal(0.8, 0.5) > 0.8
    assert 0.5 < anneal(0.8, 4) < 0.8


def test_project_tree_no_shuffle_is_sorted_order():
    ch = {-1: [0], 0: [1, 2], 2: [3]}
    assert project_tree(ch, shuffle=False) == [0, 1, 2, 3]


def test_project_tree_subtree_contiguity():
    # children always linearize adjacent to their subtree
    ch = {-1: [1], 1: [0, 3], 3: [2, 4]}
    for seed in range(20):
        order = project_tree(ch, rng=random.Random(seed))
        assert sorted(order) == [0, 1, 2, 3, 4]
        # subtree of 3 = {2,3,4} must be contiguous
        pos = [order.index(i) for i in (2, 3, 4)]
        assert max(pos) - min(pos) == 2


def test_project_tree_temperature_zero_is_deterministic():
    ch = {-1: [0], 0: [1, 2]}
    # p(l before r) forced: 1 before 0 before 2
    p = {(0, 1): 0.1, (1, 0): 0.9, (0, 2): 0.9, (2, 0): 0.1,
         (1, 2): 0.9, (2, 1): 0.1}
    for seed in range(10):
        order = project_tree(ch, pair2proba=p, temperature=0,
                             rng=random.Random(seed))
        assert order == [1, 0, 2]


# ------------------------------------------------------------ projector

def test_projector_learns_pairwise_order():
    # synthetic grammar: nsubj before parent before obj, always
    rng = np.random.default_rng(0)
    proj = OrderProjector(["nsubj", "obj", "root"], ["NOUN", "VERB"])
    keys, ys = [], []
    for _ in range(400):
        fam = [("nsubj", "NOUN"), ("parent", "VERB"), ("obj", "NOUN")]
        order = [0, 1, 2]  # linear positions match the list order
        for a in range(3):
            for b in range(3):
                if a == b:
                    continue
                keys.append((fam[a][0], fam[a][1], fam[b][0], fam[b][1]))
                ys.append(int(order[a] < order[b]))
    proj.w = proj.fit_local(keys, ys, iters=300)
    p = proj.predict_proba([("nsubj", "NOUN", "parent", "VERB"),
                            ("obj", "NOUN", "parent", "VERB")])
    assert p[0] > 0.9 and p[1] < 0.1


def test_family_pairs_labels_match_linear_order():
    ch = {-1: [1], 1: [0, 2]}
    dep = ["nsubj", "root", "obj"]
    pos = ["NOUN", "VERB", "NOUN"]
    pairs = family_pairs(ch, dep, pos)
    d = {(l, r): y for (_, y, (l, r)) in pairs}
    assert d[(0, 1)] == 1 and d[(1, 0)] == 0 and d[(0, 2)] == 1
    # parent's deprel feature is 'parent'
    key = next(k for k, _, ids in pairs if ids == (1, 0))
    assert key[0] == "parent"


# ------------------------------------------------ sentence-level golden

_WORDS = ["John", "Smith", "visited", "Paris", "last", "summer", "."]
_TAGS = ["B-PER", "E-PER", "O", "S-LOC", "O", "O", "O"]
# verb 'visited' (tok 3) roots; others hang off it
_ARCS = [(1, 3, "nsubj", "PROPN"), (2, 1, "flat", "PROPN"),
         (3, 0, "root", "VERB"), (4, 3, "obj", "PROPN"),
         (5, 6, "amod", "ADJ"), (6, 3, "obl", "NOUN"),
         (7, 3, "punct", "PUNCT")]


def test_paraphrase_sentence_preserves_tokens_and_alignment():
    outs = paraphrase_sentence(_WORDS, _TAGS, _ARCS, n=5, seed=1)
    assert outs  # at least one non-identity variant
    for v, pw, pt in outs:
        assert sorted(pw) == sorted(_WORDS)
        assert len(pw) == len(pt)
        # entity stays contiguous and aligned
        i = pw.index("John")
        assert pw[i + 1] == "Smith"
        assert pt[i] == "B-PER" and pt[i + 1] == "E-PER"
        # trailing period survives in place (pop/re-append)
        assert pw[-1] == "." and pt[-1] == "O"
        assert " ".join(pw) != " ".join(_WORDS)  # O5


def test_paraphrase_sentence_deterministic_given_seed():
    a = paraphrase_sentence(_WORDS, _TAGS, _ARCS, n=3, seed=7)
    b = paraphrase_sentence(_WORDS, _TAGS, _ARCS, n=3, seed=7)
    assert a == b
    c = paraphrase_sentence(_WORDS, _TAGS, _ARCS, n=3, seed=8)
    assert a != c  # different stream (overwhelmingly)


def test_paraphrase_sentence_length_gate():
    assert paraphrase_sentence(_WORDS[:5], _TAGS[:5], _ARCS[:5]) == []


def test_paraphrase_single_supertoken_skipped():
    words = ["Aa", "Bb", "Cc", "Dd", "Ee", "Ff"]
    tags = ["B-ORG", "I-ORG", "I-ORG", "I-ORG", "I-ORG", "E-ORG"]
    arcs = _chain_arcs(6)
    assert paraphrase_sentence(words, tags, arcs, n=3) == []


# --------------------------------------------------------------- spark

def _parsed_df(spark):
    rows = [("u1", 0, _WORDS, _TAGS,
             [{"id": a, "head": h, "deprel": d, "upos": p}
              for a, h, d, p in _ARCS]),
            ("u1", 1, ["short", "one"], ["O", "O"],
             [{"id": 1, "head": 0, "deprel": "root", "upos": "NOUN"},
              {"id": 2, "head": 1, "deprel": "dep", "upos": "NOUN"}])]
    return spark.createDataFrame(
        rows, "url string, sent_id int, tokens array<string>, "
              "pred_tags array<string>, "
              "arcs array<struct<id:int,head:int,deprel:string,upos:string>>")


def test_tree_paraphrase_operator(spark):
    out = tree_paraphrase(_parsed_df(spark), n=3, seed=3).collect()
    assert out  # the 7-token sentence produces variants
    assert all(r["url"] == "u1" and r["sent_id"] == 0 for r in out)
    for r in out:
        assert sorted(r["adv_tokens"]) == sorted(_WORDS)
        assert len(r["adv_tokens"]) == len(r["adv_tags"])
    # executor-side run matches the local function (stable seeding)
    local = paraphrase_sentence(_WORDS, _TAGS, _ARCS, n=3, seed=3)
    got = {(r["variant_id"], tuple(r["adv_tokens"])) for r in out}
    want = {(v, tuple(pw)) for v, pw, _ in local}
    assert got == want


def test_train_projector_and_guided_projection(spark):
    # corpus whose gold order is always nsubj < verb < obj
    rows = []
    for i in range(24):
        w = [f"s{i}", "likes", f"o{i}", "a", "lot", "!"]
        t = ["O"] * 6
        arcs = [{"id": 1, "head": 2, "deprel": "nsubj", "upos": "NOUN"},
                {"id": 2, "head": 0, "deprel": "root", "upos": "VERB"},
                {"id": 3, "head": 2, "deprel": "obj", "upos": "NOUN"},
                {"id": 4, "head": 5, "deprel": "amod", "upos": "ADJ"},
                {"id": 5, "head": 2, "deprel": "obl", "upos": "NOUN"},
                {"id": 6, "head": 2, "deprel": "punct", "upos": "PUNCT"}]
        rows.append(("u", i, w, t, arcs))
    df = spark.createDataFrame(
        rows, "url string, sent_id int, tokens array<string>, "
              "pred_tags array<string>, "
              "arcs array<struct<id:int,head:int,deprel:string,upos:string>>")
    proj = train_projector(df, epochs=1, iters=200)
    p = proj.predict_proba([("nsubj", "NOUN", "parent", "VERB"),
                            ("parent", "VERB", "obj", "NOUN")])
    assert p[0] > 0.8 and p[1] > 0.8
    # temperature 0 + trained projector → deterministic grammar order
    out = tree_paraphrase(df, projector=proj, temperature=0, n=1,
                          seed=0).collect()
    for r in out:
        toks = r["adv_tokens"]
        assert toks.index(toks[0]) < toks.index("likes")


def test_paraphrase_feeds_select_n_filtered(spark):
    # composes with O4 select-n (the --order cascade consumer shape)
    from ner_pytorch_spark.operators.advgen import select_n_filtered
    out = tree_paraphrase(_parsed_df(spark), n=4, seed=3)
    scored = out.withColumn("score", F.size("adv_tokens").cast("double"))
    orig = _parsed_df(spark).select(
        "url", "sent_id", F.size("tokens").cast("double").alias("score"))
    sel = select_n_filtered(scored, orig, n=2, ratio=3.0)
    assert sel.count() <= 2 * out.select("url", "sent_id").distinct().count()


def test_adv_cascade_order_shape(spark):
    # rep,ppdb,para over one entity-bearing sentence; fake parse socket
    from ner_pytorch_spark.operators.advgen import adv_cascade
    tagged = _parsed_df(spark).select("url", "sent_id", "tokens",
                                      "pred_tags").filter("sent_id = 0")
    aliases = [
        {"surface": s, "tag_type": t, "canonical_id": i}
        for i, (s, t) in enumerate([
            ("John Smith", "PER"), ("Jane Doe", "PER"), ("Bob Roe", "PER"),
            ("Paris", "LOC"), ("London", "LOC"), ("Berlin", "LOC")])]
    edges = spark.createDataFrame(
        [("last summer", "this winter")], "phrase string, paraphrase string")

    def parse_fn(df):
        # chain parse: token i heads at token i-1 (sandbox parser socket)
        arc = F.transform(
            "tokens",
            lambda t, i: F.struct(
                (i + 1).alias("id"), i.alias("head"),
                F.when(i == 0, "root").otherwise("dep").alias("deprel"),
                F.when(i == 0, "VERB").otherwise("NOUN").alias("upos")))
        return df.withColumn("arcs", arc.cast(
            "array<struct<id:int,head:int,deprel:string,upos:string>>"))

    out = adv_cascade(tagged, order=("rep", "ppdb", "para"),
                      aliases=aliases, ppdb_edges=edges,
                      parse_fn=parse_fn, n_variants=2, seed=5)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["url"] == "u1"
        assert r["gen_path"].startswith("rep")
        assert "ppdb" in r["gen_path"] and "para" in r["gen_path"]
        assert len(r["adv_tokens"]) == len(r["adv_tags"])
        # rep swapped the entity: John Smith must be gone
        assert "John" not in r["adv_tokens"]


def test_kg_adv_para_matches_frozen_golden(spark):
    """Golden replay (the driver's ★ check for kg_adv_para): the seeded
    paraphrase cascade over sf0.01 must reproduce the committed frozen
    table byte-for-byte (scripts/freeze_adv_para_golden.py verifies the
    output is core-count-invariant before freezing)."""
    import os

    import pandas as pd

    import __spark_entry__ as entrymod

    golden_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "golden_kg_adv_para.parquet")
    if not os.path.exists(golden_path):
        pytest.skip("golden not yet frozen")
    key = ["url", "sent_id", "variant_id"]
    got = (entrymod.queries()["kg_adv_para"](spark, "/root/testdata/sf0.01")
           .toPandas().sort_values(key).reset_index(drop=True))
    want = (pd.read_parquet(golden_path)
            .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)
