"""English Snowball stemmer (Porter2) — pure python, no deps.

The reference's PPDB prefilter drops paraphrase pairs whose stems are
equal (/root/reference/ppdb.py:20,67: ``SnowballStemmer('english')``,
``stemmer.stem(phrase) == stemmer.stem(paraphrase)`` — note it stems
the WHOLE phrase string as one token, spaces and all). Neither nltk
nor DuckDB's fts extension ships in this sandbox, so this is an
independent implementation of the published Snowball English algorithm
(M.F. Porter, snowballstem.org/algorithms/english/stemmer.html),
checked against hand-verified official sample outputs in
``tests/test_stemming.py``.
"""

from __future__ import annotations

_VOWELS = set("aeiouy")
_DOUBLES = {"bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"}
_LI_ENDINGS = set("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = {"inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed"}

_STEP2 = [  # longest-match order; (suffix, replacement)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""),
]
_STEP4 = ["ement", "ance", "ence", "able", "ible", "ment",
          "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
          "al", "er", "ic"]


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _mark_ys(word: str) -> str:
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_vowel(chars[i - 1]):
            chars[i] = "Y"
    return "".join(chars)


def _region_after(word: str, start: int) -> int:
    """Position after the first non-vowel following a vowel, searching
    from ``start`` — the R1/R2 rule."""
    i = start
    n = len(word)
    while i < n and not (word[i] in _VOWELS):
        i += 1
    while i < n and word[i] in _VOWELS:
        i += 1
    return min(i + 1, n) if i < n else n


def _r1(word: str) -> int:
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            return len(pre)
    return _region_after(word, 0)


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        c1, c2, c3 = word[-3], word[-2], word[-1]
        return (c2 in _VOWELS and c3 not in _VOWELS
                and c3 not in "wxY" and c1 not in _VOWELS)
    return False


def snowball_stem(word: str) -> str:
    """Stem one token (or, like the reference, a whole phrase string)."""
    word = word.lower()
    if word.startswith("'"):
        word = word[1:]
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    word = _mark_ys(word)
    r1 = _r1(word)
    r2 = _region_after(word, r1)

    # step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[:-len(suf)]
            break
    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        if any(c in _VOWELS for c in word[:-2]):
            word = word[:-1]
    if word in _EXCEPTIONS2:
        return word
    # step 1b
    suf1b = next((s for s in ("eedly", "ingly", "edly", "eed", "ing", "ed")
                  if word.endswith(s)), None)
    if suf1b in ("eed", "eedly"):
        if len(word) - len(suf1b) >= r1:
            word = word[:-len(suf1b)] + "ee"
    elif suf1b is not None:
        stem = word[:-len(suf1b)]
        if any(c in _VOWELS for c in stem):
            word = stem
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word[-2:] in _DOUBLES:
                word = word[:-1]
            elif r1 >= len(word) and _ends_short_syllable(word):
                word += "e"   # "word is short": R1 null + short syllable
    # step 1c
    if (len(word) > 2 and word[-1] in "yY"
            and word[-2] not in _VOWELS):
        word = word[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[:-len(suf)] + rep
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and len(word) > 3 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if (len(word) - 2 >= r1 and len(word) > 2
                    and word[-3] in _LI_ENDINGS):
                word = word[:-2]
    # step 3
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[:-len(suf)] + rep
            break
    else:
        if word.endswith("ative"):
            if len(word) - 5 >= r2:
                word = word[:-5]
    # step 4
    matched = next((s for s in _STEP4 if word.endswith(s)), None)
    if matched is not None:
        if len(word) - len(matched) >= r2:
            word = word[:-len(matched)]
    elif word.endswith("ion"):
        if (len(word) - 3 >= r2 and len(word) > 3
                and word[-4] in "st"):
            word = word[:-3]
    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
                len(word) - 1 >= r1
                and not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]
    return word.replace("Y", "y")
