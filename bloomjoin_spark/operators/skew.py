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
    """Keys holding ≥ min_share of a deterministic sample — ONE Spark
    job, no prior count: the sample is the first ⌈sample_rows/P⌉ rows of
    EVERY partition (early-terminating scan, spanning all partitions so
    clustered/sorted layouts don't bias it), and the share threshold
    applies against the sample total carried alongside the per-key
    counts by a single-partition window over the (≤ sample_rows-sized)
    aggregated counts."""
    from pyspark.sql import Window

    keyed = df.select(col)
    nparts = max(1, keyed.rdd.getNumPartitions())  # metadata, no job
    per = max(16, -(-sample_rows // nparts))

    def head_fn(it):
        taken = 0
        for batch in it:
            if batch.num_rows == 0:
                continue
            take = min(per - taken, batch.num_rows)
            yield batch.slice(0, take)
            taken += take
            if taken >= per:
                return

    dt = dict(df.dtypes)[col]
    sample = keyed.mapInArrow(head_fn, schema=f"{col} {dt}")
    counts = sample.groupBy(col).agg(F.count(F.lit(1)).alias("__cnt"))
    hot = (
        counts.withColumn("__tot", F.sum("__cnt").over(Window.partitionBy()))
        .filter(F.col("__cnt") >= min_share * F.col("__tot"))
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
