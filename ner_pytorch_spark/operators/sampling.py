"""Deterministic hash sampling — reproducible subsets/splits at 100 TB.

``df.sample``/``sampleBy`` are seeded per-partition RNG draws: the
subset CHANGES whenever partitioning changes, which is useless for a
training corpus that must be re-derivable months later. The web-scale
idiom is hash gating: a row is in the sample iff
``h(key) < fraction·2⁶⁰`` with h = the first 15 md5 hex chars — a pure
function of the KEY, so the subset is stable under repartitioning,
engine-portable (DuckDB parses the same value, driver hash-checked) and
consistent across tables sharing the key (join-compatible samples).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 16 ** 15  # 60-bit hash space


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10) \
        .cast("long")


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         salt: str = "") -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of the space.

    ``salt`` derives INDEPENDENT samples from the same keys (h(salt‖key));
    the same (key, salt, fraction) always selects the same rows, on any
    cluster, any partitioning, any engine.
    """
    key = F.concat(F.lit(salt), F.col(key_col).cast("string")) if salt \
        else F.col(key_col)
    return df.filter(_hash60(key) < int(fraction * _SPACE))


def hash_split(df: DataFrame, key_col: str, weights: dict[str, float],
               salt: str = "", split_col: str = "split") -> DataFrame:
    """Label every row with a split name by hash range — the
    reproducible train/dev/test assignment (loader-independent analogue
    of the reference's fixed file split, /root/reference/loader.py).

    ``weights`` are relative (normalized internally); ranges are
    half-open [lo, hi) over the hash space in the given key order, so
    the splits partition the data exactly and deterministically.
    """
    total = sum(weights.values())
    key = F.concat(F.lit(salt), F.col(key_col).cast("string")) if salt \
        else F.col(key_col)
    h = _hash60(key)
    expr = None
    lo = 0.0
    names = list(weights)
    for name in names[:-1]:
        lo += weights[name] / total
        cond = h < int(lo * _SPACE)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn(split_col, expr)
