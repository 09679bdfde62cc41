"""Skew-aware join helpers for hot keys at cluster scale.

No reference analog (the reference delegates physical execution to the
warehouse); this is part of the Spark-native 100 TB design (SCALING.md).
AQE's skew-join split (``spark.sql.adaptive.skewJoin``) handles most
skew transparently, but it only splits *partitions of the already
shuffled* fact side and cannot help when a single join key is hot
enough that every row of that key must still meet every matching row.
Salting fixes that shape:

- ``salted_join``: fact rows get a deterministic salt in ``[0, salt)``,
  the (small) dimension side is replicated ``salt`` times, and the join
  runs on ``(key, salt)`` — a hot key spreads over ``salt`` tasks.
- ``hot_keys``: find keys above a frequency threshold with one cheap
  aggregation, for targeted two-path joins (salt only the hot keys,
  plain join for the long tail).

Salts derive from ``xxhash64`` of a stable row identity (or a
monotonic fallback), never ``rand()`` — results must be deterministic
for retries/speculative tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int, identity: str | None) -> Column:
    if identity is not None:
        return F.pmod(F.xxhash64(F.col(identity)), F.lit(salt))
    return F.pmod(F.spark_partition_id() * 7919 + F.monotonically_increasing_id(), F.lit(salt))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    fact_identity: str | None = None,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on equi-keys with salt-spread hot keys.

    ``dim`` is exploded ``salt``× (keep it the small side); ``fact``
    rows are salted deterministically from ``fact_identity`` (a stable
    unique column) when given.  Result equals ``fact.join(dim, on,
    how)`` for ``how`` in {inner, left}.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_fact = fact.withColumn("__salt", _salt_col(fact, salt, fact_identity))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_fact.join(salted_dim, keys + ["__salt"], how)
    return out.drop("__salt")


def hot_keys(df: DataFrame, key: str | list[str], min_count: int) -> DataFrame:
    """Keys whose row count exceeds ``min_count`` — one partial-agg
    shuffle over just the key columns; feed the result into a targeted
    two-path join (broadcast the hot-key list, union salted + plain)."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > min_count)
    )
