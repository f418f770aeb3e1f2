"""Skew mitigation for joins and aggregations.

AQE's skew-join handling (on by default in session.py) covers
sort-merge joins it can observe; salting is the explicit fallback for
(a) aggregations with a hot key and (b) joins where one key dominates
so badly that even split partitions overwhelm a task. Both helpers are
pure DataFrame transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over
    ``salt_buckets`` partitions.

    left rows get a random salt in [0, buckets); the right side is
    replicated once per salt value (explode of a literal range — cheap
    when right is the smaller/dimension side). Join key becomes
    (key, salt), so one hot key fans across `buckets` reducers.
    Row-level results are identical to a plain join for inner/left/
    semi/anti; right/full would emit each UNMATCHED right row once per
    salt replica, so they are rejected.
    """
    if how in ("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"):
        raise ValueError(
            f"salted_join cannot preserve unmatched right rows (how={how!r}); "
            "salt the other side instead"
        )
    salted_l = left.withColumn(
        "_salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    salted_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_l.join(salted_r, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe aggregation: aggregate on (keys + salt) first, then
    merge partials per key.

    ``aggs`` maps output name -> (col, kind) with kind in
    {"sum", "count", "min", "max"} (the re-aggregatable kinds; avg =
    sum/count composed by the caller). A hot key's rows split across
    ``salt_buckets`` partial groups before the final (tiny) merge.
    """
    salted = df.withColumn("_salt", (F.rand(seed) * salt_buckets).cast("int"))
    partial_exprs, merge_exprs = [], []
    for name, (col, kind) in aggs.items():
        if kind == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{name}"))
            merge_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif kind == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{name}"))
            merge_exprs.append(F.sum(f"_p_{name}").alias(name))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{name}"))
            merge_exprs.append(F.min(f"_p_{name}").alias(name))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{name}"))
            merge_exprs.append(F.max(f"_p_{name}").alias(name))
        else:
            raise ValueError(f"non-mergeable agg kind {kind!r}")
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)
