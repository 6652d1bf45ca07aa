"""Skew-mitigation join helpers.

AQE's skew-join split (enabled in session.py) handles most hot keys by
splitting oversized shuffle partitions at runtime. ``salted_join`` is the
explicit fallback for the case AQE cannot fix: a shuffle join whose hot
key is so dominant that even a split partition pins one executor — salt
fans the hot key's rows across N sub-keys, and the other side is
replicated N× so every sub-key finds its match.

Use when: the skewed side is a fact table with a few pathological keys
(null-ish defaults, bot users, empty-string buckets) and the other side is
much smaller but still too big to broadcast outright.

Determinism: the salt is xxhash64 of the skewed row's columns mod N — no
RNG, so plans replay identically (required by this repo's oracle harness
and by any retryable task at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``skewed`` with ``other`` on equi-key columns ``on``, fanning
    each skewed key across ``n_salts`` sub-partitions.

    The skewed side gets a deterministic per-row salt; ``other`` is
    replicated once per salt value (explode of a literal range — a narrow
    N× multiplier on the SMALL side only). The shuffle key becomes
    (key, salt), so a key holding 50% of the fact table spreads over
    n_salts reducers instead of one.

    ``salt_cols`` limits which skewed-side columns feed the salt hash —
    required when rows carry non-hashable payloads (arrays), and cheaper
    when one unique id column suffices.
    """
    if not on:
        raise ValueError("salted_join requires at least one key column")
    cols = salt_cols if salt_cols else skewed.columns
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    left = skewed.withColumn(SALT_COL, salt.cast("int"))
    right = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = left.join(right, on=on + [SALT_COL], how=how)
    return joined.drop(SALT_COL)
