"""profile_table: exact counters exact, estimates within bounds, one
row per column, distributed merge path."""

import math

import pytest
from pyspark.sql import Row, functions as F

from bloomjoin_spark.operators import profile_table


def test_profile_exact_counters_and_bounds(spark):
    rows = [
        Row(k=i, s=f"s{i % 7}", v=float(i) if i % 10 else None)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k bigint, s string, v double").repartition(8)
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s", "v"}
    assert prof["k"]["n_rows"] == 1000 and prof["k"]["n_nulls"] == 0
    assert prof["v"]["n_nulls"] == 100
    assert prof["s"]["min_str"] == "s0" and prof["s"]["max_str"] == "s6"
    # HLL within 5σ of 1.04/√m
    rel = 1.04 / math.sqrt(2**14)
    assert abs(prof["k"]["approx_distinct"] - 1000) <= 5 * rel * 1000 + 1
    assert abs(prof["s"]["approx_distinct"] - 7) <= 2
    # quantiles: numeric only; median of 1..999 (nulls dropped) near 500
    assert prof["s"]["p50"] is None
    assert abs(prof["v"]["p50"] - 500) < 50
    assert prof["v"]["p99"] > 900


def test_profile_column_selection_and_validation(spark):
    df = spark.createDataFrame([Row(a=1, b="x")], "a bigint, b string")
    out = profile_table(df, cols=["a"]).collect()
    assert [r["column"] for r in out] == ["a"]
    with pytest.raises(ValueError):
        profile_table(df, cols=["nope"])
    with pytest.raises(ValueError):
        profile_table(df.select(F.array(F.lit(1)).alias("arr")))


def test_profile_all_null_column(spark):
    df = spark.createDataFrame(
        [Row(a=None), Row(a=None)], "a double"
    ).repartition(3)
    r = profile_table(df).collect()[0]
    assert r["n_nulls"] == 2 and r["approx_distinct"] == 0
    assert r["p50"] is None


def test_profile_matches_exact_distinct_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = {r["column"]: r for r in profile_table(docs).collect()}
    for c in ("lang", "source"):
        exact = docs.select(c).distinct().count()
        # tiny cardinalities: HLL is exact-ish here
        assert abs(prof[c]["approx_distinct"] - exact) <= max(1, 0.05 * exact)
        assert prof[c]["n_rows"] == docs.count()


def test_profile_numeric_min_max_are_numeric(spark):
    """min/max must be the NUMERIC extremes stringified — not the
    lexicographic min of stringified values ('10' < '9')."""
    df = spark.createDataFrame([(9,), (10,), (1500,)], "a bigint")
    r = profile_table(df).collect()[0]
    assert r["min_str"] == "9" and r["max_str"] == "1500"


def test_profile_big_int64_distinct_not_collapsed(spark):
    """int64 ids beyond 2^53 must hash as exact integer bits — distinct
    ids that would collide as doubles must count separately."""
    base = 2**60
    df = spark.createDataFrame(
        [(base + i,) for i in range(200)], "a bigint"
    ).repartition(4)
    r = profile_table(df, cols=["a"]).collect()[0]
    assert abs(r["approx_distinct"] - 200) <= 10
