"""Skew-mitigation utilities (SURVEY.md §4 / 100 TB design point).

AQE's skew-join splitting handles most sort-merge skew automatically
(enabled in session.py). These helpers cover the cases AQE does not:

- ``salted_join``: an extreme hot key on the BUILD side of a shuffled join
  (one key ≫ one task's memory). The big side gets a deterministic salt in
  [0, salts); the small side is replicated once per salt value; the join key
  becomes (key, salt) so the hot key spreads over ``salts`` tasks. Replication
  multiplies the small side by ``salts`` — only use when the small side is
  broadcast-sized but the join must still shuffle (e.g. it feeds a co-
  partitioned downstream op).
- ``salted_count``: two-phase aggregation for a hot GROUP BY key — count to
  (key, salt) partials first, then sum partials per key. Spark's partial
  aggregation already does this for algebraic aggregates; the explicit form
  is for collect_list-style holistic aggregates where map-side combine
  can't shrink the hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], salts: int) -> Column:
    """Deterministic salt in [0, salts): hash of the row's own columns, so
    retries/speculative tasks produce identical salts (rand() would not)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salts)).cast(
        "int"
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the hot-key pressure spread over ``salts``
    buckets. Result is identical to ``big.join(small, key, how)``.

    Only joins that preserve the big side are supported: right/full joins
    would emit every unmatched small-side row once per salt replica."""
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "the small side is replicated per salt, so right/full joins "
            "would duplicate unmatched small-side rows"
        )
    big_s = big.withColumn("_salt", _salt(big.columns, salts))
    salt_values = F.explode(
        F.sequence(F.lit(0), F.lit(salts - 1))
    ).alias("_salt")
    small_s = small.select("*", salt_values)
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, salts: int = 16) -> DataFrame:
    """COUNT(*) per key via (key, salt) partials then a per-key sum —
    the explicit two-phase shape for holistic aggregates on hot keys."""
    return (
        df.withColumn("_salt", _salt(df.columns, salts))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").cast("bigint").alias("n"))
    )
