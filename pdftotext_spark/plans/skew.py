"""Skew-handling join utilities.

First line of defense is AQE's skew-join splitting (enabled in
``session_confs``). This module provides the *explicit* salting
pattern for the cases AQE cannot fix — e.g. a broadcast-ineligible
dimension joined on a key where one value holds half the fact table:

- the big (skewed) side gets a deterministic per-row salt in
  ``[0, salt)``;
- the small side is replicated once per salt value (``explode``);
- the join key becomes ``(key, salt)`` so the hot key spreads over
  ``salt`` reducers.

Deterministic (xxhash64 of the row's unique columns), so retries and
resumed jobs produce identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    salt_by: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salting pattern.

    ``salt_by``: columns that uniquely-ish identify a big-side row
    (defaults to the join key + all columns hash); they only seed the
    deterministic salt, not the semantics.
    """
    seed_cols = salt_by if salt_by is not None else big.columns
    big_salted = big.withColumn(
        _SALT_COL, F.pmod(F.xxhash64(*seed_cols), F.lit(salt)).cast("int")
    )
    small_replicated = small.withColumn(
        _SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    return big_salted.join(small_replicated, on=on + [_SALT_COL], how=how).drop(
        _SALT_COL
    )
