"""Per-row scalar text functions (SURVEY §2.2, P1-P6/P9).

All expressed as native Column expressions (JVM-side, whole-stage
codegen) — no Python in the hot path. The pure-Python twins are kept for
the single-process golden re-implementation used by parity tests.

Reference semantics:
  * zero_digits   — /root/reference/utils.py:70-74
  * cap_feature   — /root/reference/loader.py:113-128
  * unicode fold  — /root/reference/loader.py:14-19
  * de-spacing    — /root/reference/gen_adv_pipline.py:187-191
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- columns


def zero_digits(col: Column) -> Column:
    """Digit normalization: every [0-9] → '0' (utils.py:70-74)."""
    return F.regexp_replace(col, "[0-9]", "0")


def cap_feature(col: Column) -> Column:
    """4-way capitalization class (loader.py:113-128).

    0 = all-lower (or caseless), 1 = ALLCAPS, 2 = Initial-cap, 3 = iNNer-cap.
    Order of the when-branches reproduces the reference's if/elif chain.
    """
    return (
        F.when(F.lower(col) == col, F.lit(0))
        .when(F.upper(col) == col, F.lit(1))
        .when(F.substring(col, 1, 1) == F.upper(F.substring(col, 1, 1)), F.lit(2))
        .otherwise(F.lit(3))
    )


def despace_punct(col: Column) -> Column:
    """Remove the space before a lone punctuation char when rendering a
    token list back to a string (gen_adv_pipline.py:187-191)."""
    return F.regexp_replace(col, r" ([^A-Za-z0-9])", r"$1")


def tokenize_ws(col: Column) -> Column:
    """Whitespace tokenizer; empty strings removed (loader.py:36 split())."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


# ------------------------------------------------------- python twins
# Used by tests' single-process golden pipeline; semantics identical to
# the Column versions above (unit-tested against each other).

_DIGIT = re.compile(r"[0-9]")
# Java regex \s is ASCII-only ([ \t\n\x0B\f\r]); python str.split()
# splits on ALL Unicode whitespace (U+00A0, U+2009, …), so the python
# twin must pin the same ASCII class or the fused and staged pipelines
# tokenize non-ASCII-whitespace pages differently.
_WS_ASCII = re.compile(r"[ \t\n\x0B\f\r]+")


def py_tokenize_ws(s: str) -> list[str]:
    """Python twin of :func:`tokenize_ws` — SAME whitespace contract."""
    return [t for t in _WS_ASCII.split(s) if t]


def py_zero_digits(s: str) -> str:
    return _DIGIT.sub("0", s)


def py_cap_feature(s: str) -> int:
    if s.lower() == s:
        return 0
    if s.upper() == s:
        return 1
    if s[:1].upper() == s[:1]:
        return 2
    return 3


_KEEP = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ .,;'-")


def py_unicode_to_ascii(s: str) -> str:
    """NFD-fold + strip combining marks + keep [A-Za-z .,;'-]
    (loader.py:14-19; defined in the reference but never called)."""
    return "".join(
        c for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn" and c in _KEEP
    )
