"""Tag-scheme rewrites: IOB1 → IOB2 → IOBES and back (SURVEY §2.2 P7).

Sequence-local rewrites that need neighbor context, so they operate on a
whole ``array<string>`` tags column. Implemented as pure-Python sequence
functions (unit-tested against hand goldens) wrapped for Spark both ways:

* as a native ``transform``-free pandas UDF over the array column, and
* kept pure for the golden single-process pipeline.

Reference semantics:
  * iob2      — /root/reference/utils.py:77-96 (validity check + IOB1→IOB2)
  * iob_iobes — /root/reference/utils.py:99-121
  * iobes_iob — /root/reference/utils.py:124-142
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def iob2(tags: list[str]) -> list[str]:
    """Validate IOB and convert IOB1 → IOB2 in place semantics.

    Returns the converted list; raises ValueError on malformed tags
    (non-IOB format), mirroring utils.py:77-96 which returns False →
    caller raises (loader.py:52-56).
    """
    out = list(tags)
    for i, tag in enumerate(out):
        if tag == "O":
            continue
        split = tag.split("-")
        if len(split) != 2 or split[0] not in ("I", "B"):
            raise ValueError(f"Invalid IOB tag: {tag!r}")
        if split[0] == "B":
            continue
        # tag is I-*
        if i == 0 or out[i - 1] == "O":
            out[i] = "B" + tag[1:]
        elif out[i - 1][1:] == tag[1:]:
            continue
        else:
            out[i] = "B" + tag[1:]
    return out


def iob_iobes(tags: list[str]) -> list[str]:
    """IOB2 → IOBES (utils.py:99-121)."""
    out = []
    for i, tag in enumerate(tags):
        nxt = tags[i + 1] if i + 1 < len(tags) else "O"
        if tag == "O":
            out.append(tag)
        elif tag.startswith("B-"):
            out.append(tag if nxt.startswith("I-") else tag.replace("B-", "S-"))
        elif tag.startswith("I-"):
            out.append(tag if nxt.startswith("I-") else tag.replace("I-", "E-"))
        else:
            raise ValueError(f"Invalid IOB tag: {tag!r}")
    return out


def iobes_iob(tags: list[str]) -> list[str]:
    """IOBES → IOB2 (utils.py:124-142)."""
    out = []
    for tag in tags:
        head = tag.split("-")[0]
        if head == "B" or head == "I" or tag == "O":
            out.append(tag)
        elif head == "S":
            out.append(tag.replace("S-", "B-"))
        elif head == "E":
            out.append(tag.replace("E-", "I-"))
        else:
            raise ValueError(f"Invalid IOBES tag: {tag!r}")
    return out


def _array_rewrite_udf(fn):
    @F.pandas_udf(ArrayType(StringType()))
    def _udf(tags: pd.Series) -> pd.Series:
        return tags.map(lambda t: fn(list(t)) if t is not None else None)

    return _udf


iob2_udf = _array_rewrite_udf(iob2)
iob_iobes_udf = _array_rewrite_udf(iob_iobes)
iobes_iob_udf = _array_rewrite_udf(iobes_iob)
