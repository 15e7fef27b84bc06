"""IOBES tag set + transition grammar.

Deterministic tag-id assignment (sorted types, fixed prefix order) —
the id order is load-bearing for parity just like the reference's vocab
tie-break (/root/reference/utils.py:59-67). START/STOP occupy the last
two rows/cols of the transition matrix (/root/reference/crf.py:25-34).
"""

from __future__ import annotations

import numpy as np

from .crf import IMPOSSIBLE

ENTITY_TYPES = ("LOC", "MISC", "ORG", "PER")  # sorted, fixed


def iobes_tags(types: tuple[str, ...] = ENTITY_TYPES) -> list[str]:
    return ["O"] + [f"{p}-{t}" for t in types for p in "BIES"]


def tag_to_id(types: tuple[str, ...] = ENTITY_TYPES) -> dict[str, int]:
    return {t: i for i, t in enumerate(iobes_tags(types))}


def grammar_transitions(types: tuple[str, ...] = ENTITY_TYPES) -> np.ndarray:
    """[T+2, T+2] matrix: 0 for IOBES-valid transitions, IMPOSSIBLE else.

    Encodes the IOBES chunk grammar the reference enforces through
    training + the augmented START/STOP rows; used directly by the
    gazetteer-emission tagger and as an additive prior for neural mode.
    """
    tags = iobes_tags(types)
    T = len(tags)
    m = np.full((T + 2, T + 2), IMPOSSIBLE, dtype=np.float32)
    start, stop = T, T + 1

    def pfx(t):
        return t.split("-")[0] if t != "O" else "O"

    def typ(t):
        return t.split("-")[1] if "-" in t else None

    can_open = lambda t: pfx(t) in ("O", "B", "S")   # noqa: E731
    can_close = lambda t: pfx(t) in ("O", "E", "S")  # noqa: E731

    for i, a in enumerate(tags):
        for j, b in enumerate(tags):
            pa, pb = pfx(a), pfx(b)
            ok = False
            if pa in ("O", "E", "S"):
                ok = pb in ("O", "B", "S")
            elif pa in ("B", "I"):
                ok = pb in ("I", "E") and typ(a) == typ(b)
            if ok:
                m[i, j] = 0.0
    for j, b in enumerate(tags):
        if can_open(b):
            m[start, j] = 0.0
    for i, a in enumerate(tags):
        if can_close(a):
            m[i, stop] = 0.0
    return m
