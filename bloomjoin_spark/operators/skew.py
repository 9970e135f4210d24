"""Explicit skew handling for joins/aggregations on hot keys (the F0
``source`` column holds ~50% of rows in one value — BASELINE.json:6).

Two mechanisms, composable with AQE's skew-join splitting:

- ``salted_join``: replicate the small side ``salts``× and spread the
  big side's rows across salts, so one hot key occupies ``salts``
  reducers instead of one. Result is row-identical to the plain join.
- ``split_hot_join``: route hot keys (detected by sampling or supplied)
  through a broadcast join and the long tail through a normal shuffle
  join — no replication cost on the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skewed_keys(
    df: DataFrame, col: str, min_share: float = 0.01, sample_rows: int = 100_000
) -> list:
    """Keys holding ≥ min_share of a deterministic sample."""
    n_rows = df.count()  # one job, reused for the sampling fraction
    if n_rows == 0:
        return []
    frac = min(1.0, sample_rows / n_rows)
    sample = df.select(col).sample(fraction=frac, seed=42)
    total = sample.count()
    if total == 0:
        return []
    hot = (
        sample.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_share * total)
        .collect()
    )
    return [r[col] for r in hot]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join with the hot-key exchange spread over ``salts``
    reducers. ``small`` is replicated ``salts``×; result is identical
    to ``big.join(small, on, how)``."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_semi", "semi"):
        raise ValueError(
            "salted_join supports inner/left/semi (small side is replicated)"
        )
    salt_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    )
    salt_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast(salt_big.schema["__salt"].dataType))
    spark_how = {"semi": "left_semi"}.get(how, how)
    out = salt_big.join(salt_small, on=keys + ["__salt"], how=spark_how)
    return out.drop("__salt")


def split_hot_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    hot_keys: list | None = None,
    min_share: float = 0.01,
) -> DataFrame:
    """Hot keys → broadcast join; tail → normal join; union. Identical
    result to the plain join for inner/left."""
    if how not in ("inner", "left"):
        raise ValueError("split_hot_join supports inner/left")
    if hot_keys is None:
        hot_keys = skewed_keys(big, on, min_share=min_share)
    if not hot_keys:
        return big.join(small, on=on, how=how)
    is_hot = F.col(on).isin(hot_keys)
    hot_part = big.filter(is_hot).join(
        F.broadcast(small.filter(F.col(on).isin(hot_keys))), on=on, how=how
    )
    tail_part = big.filter(~is_hot | F.col(on).isNull()).join(
        small.filter(~F.col(on).isin(hot_keys)), on=on, how=how
    )
    return hot_part.unionByName(tail_part)


def aqe_skew_configs() -> dict:
    """The AQE knobs this library expects on a real cluster (local
    defaults are fine for tests)."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256MB",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    }
