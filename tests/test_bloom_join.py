"""Differential bloom_join tests — every behavioral case compares
bloom_join output against the plain Spark join on the same inputs (the
reference's exact-join-oracle pattern, tests/testthat/test-bloom_join.R)."""

import warnings

import pytest
from pyspark.sql import functions as F

from bloomjoin_spark import bloom_join
from bloomjoin_spark.plans.planner import spark_how

from conftest import assert_df_equal


@pytest.fixture(scope="module")
def xy(spark):
    # F1 fixture: partial overlap (ids 1..100 vs 50..150)
    x = spark.range(1, 101).select(
        F.col("id"), (F.col("id") * 1.5).alias("value_x")
    )
    y = spark.range(50, 151).select(
        F.col("id"), (F.col("id") * 2.0).alias("value_y")
    )
    return x, y


HOWS = ["inner", "left", "right", "full", "semi", "anti"]


@pytest.mark.parametrize("how", HOWS)
def test_identical_to_plain_join(spark, xy, how):
    x, y = xy
    got = bloom_join(x, y, on="id", how=how, force_prefilter=True)
    exp = x.join(y, on="id", how={"semi": "left_semi", "anti": "left_anti"}.get(how, how))
    assert_df_equal(got, exp)


@pytest.mark.parametrize("how", ["inner", "semi", "anti", "left"])
def test_zero_overlap(spark, how):
    x = spark.range(0, 200).withColumn("vx", F.col("id") + 1)
    y = spark.range(500, 700).select(F.col("id"), (F.col("id") - 1).alias("vy"))
    got = bloom_join(x, y, on="id", how=how, force_prefilter=True)
    exp = x.join(y, on="id", how={"semi": "left_semi", "anti": "left_anti"}.get(how, how))
    assert_df_equal(got, exp)


def test_full_overlap(spark):
    x = spark.range(0, 300).withColumn("vx", F.lit("a"))
    y = spark.range(0, 300).withColumn("vy", F.lit("b"))
    got, rep = bloom_join(x, y, on="id", how="inner", force_prefilter=True, return_report=True)
    assert_df_equal(got, x.join(y, "id", "inner"))
    assert rep.used_prefilter


def test_duplicate_keys_cartesian(spark):
    # reference test-bloom_join.R:181-202 — 6×6 duplicate key ⇒ 36 rows
    x = spark.createDataFrame([(1, i) for i in range(6)], "id int, vx int")
    y = spark.createDataFrame([(1, i) for i in range(6)], "id int, vy int")
    got = bloom_join(x, y, on="id", how="inner", force_prefilter=True)
    assert got.count() == 36


def test_string_keys(spark):
    x = spark.createDataFrame(
        [(f"k{i}", i) for i in range(200)] + [("été", -1), ("naïve☃", -2)],
        "k string, vx int",
    )
    y = spark.createDataFrame(
        [(f"k{i}", i * 10) for i in range(100, 300)] + [("été", -10)],
        "k string, vy int",
    )
    got = bloom_join(x, y, on="k", how="inner", force_prefilter=True)
    assert_df_equal(got, x.join(y, "k", "inner"))


def test_composite_keys(spark):
    rows = [(i % 10, f"s{i % 7}", i) for i in range(500)]
    x = spark.createDataFrame(rows, "a int, b string, vx int")
    y = spark.createDataFrame(
        [(i % 10, f"s{i % 5}", i * 2) for i in range(100)], "a int, b string, vy int"
    )
    got = bloom_join(x, y, on=["a", "b"], how="inner", force_prefilter=True)
    assert_df_equal(got, x.join(y, ["a", "b"], "inner"))


def test_renamed_keys(spark):
    # by = c("id_x" = "id_y")
    x = spark.createDataFrame([(i, i * 2) for i in range(100)], "id_x int, vx int")
    y = spark.createDataFrame([(i, i * 3) for i in range(50, 150)], "id_y int, vy int")
    got = bloom_join(x, y, on={"id_x": "id_y"}, how="inner", force_prefilter=True)
    exp = x.join(y, on=x["id_x"] == y["id_y"], how="inner")
    assert_df_equal(got, exp)


def test_cross_type_keys_int_vs_double(spark):
    # reference test-cross-type-keys.R:16-44 — join-equal must survive
    # the prefilter even when storage types differ
    x = spark.range(0, 3000).select(F.col("id").cast("int").alias("k"), F.col("id").alias("vx"))
    y = spark.range(1500, 4500).select(
        F.col("id").cast("double").alias("k"), (F.col("id") * 2).alias("vy")
    )
    for how in ["inner", "left", "semi", "anti"]:
        got = bloom_join(x, y, on="k", how=how, force_prefilter=True)
        exp = x.join(y, on=x["k"] == y["k"], how={"semi": "left_semi", "anti": "left_anti"}.get(how, how))
        if how in ("semi", "anti"):
            exp = x.join(y, on=x["k"] == y["k"], how={"semi": "left_semi", "anti": "left_anti"}[how])
        assert got.count() == exp.count()


def test_cross_type_long_vs_float(spark):
    # long+float joins compare as float in Spark; hash must agree
    x = spark.range(0, 2000).select(F.col("id").alias("k"), F.lit(1).alias("vx"))
    y = spark.range(1000, 3000).select(F.col("id").cast("float").alias("k"), F.lit(2).alias("vy"))
    got = bloom_join(x, y, on={"k": "k"}, how="inner", force_prefilter=True)
    exp = x.join(y, on=x["k"] == y["k"], how="inner")
    assert got.count() == exp.count()


def test_null_keys_all_join_types(spark):
    # nulls never match in Spark joins; prefilter must not change that
    x = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (None, "d"), (5, "e")], "id int, vx string"
    )
    y = spark.createDataFrame(
        [(1, "p"), (None, "q"), (5, "r"), (7, "s")], "id int, vy string"
    )
    for how in HOWS:
        got = bloom_join(x, y, on="id", how=how, force_prefilter=True)
        exp = x.join(y, "id", {"semi": "left_semi", "anti": "left_anti"}.get(how, how))
        assert_df_equal(got, exp)


def test_fpr_invariance_of_results(spark, xy):
    # reference test-bloom_join.R:253-272: result identical for any fpr
    x, y = xy
    exp = x.join(y, "id", "inner")
    for fpp in [1e-4, 0.01, 0.5]:
        got = bloom_join(x, y, on="id", how="inner", fpp=fpp, force_prefilter=True)
        assert_df_equal(got, exp)


def test_auto_by_detection(spark, xy):
    x, y = xy
    got = bloom_join(x, y, how="inner", force_prefilter=True)  # on=None → common col "id"
    assert_df_equal(got, x.join(y, "id", "inner"))


def test_empty_inputs(spark):
    x = spark.createDataFrame([], "id int, vx int")
    y = spark.createDataFrame([(1, 2)], "id int, vy int")
    assert bloom_join(x, y, on="id", how="inner").count() == 0
    assert bloom_join(y, x, on="id", how="inner").count() == 0
    assert bloom_join(y, x, on="id", how="left").count() == 1


def test_unsafe_side_warns_and_overrides(spark, xy):
    # reference test-edge-cases.R:8-44
    x, y = xy
    with pytest.warns(UserWarning, match="unsafe"):
        got, rep = bloom_join(
            x, y, on="id", how="left", prefilter_side="x",
            force_prefilter=True, return_report=True,
        )
    assert rep.override_requested_side
    assert rep.prefilter_side == "y"
    assert_df_equal(got, x.join(y, "id", "left"))


def test_full_join_never_prefiltered(spark, xy):
    x, y = xy
    got, rep = bloom_join(x, y, on="id", how="full", force_prefilter=True, return_report=True)
    assert not rep.used_prefilter
    assert_df_equal(got, x.join(y, "id", "full"))


def test_skip_gates_small_build(spark):
    x = spark.range(0, 50).withColumn("vx", F.lit(1))
    y = spark.range(0, 5).withColumn("vy", F.lit(2))  # 5 < MIN_BUILD_DISTINCT
    with _no_broadcast_gate(spark):
        got, rep = bloom_join(x, y, on="id", how="inner", return_report=True)
    assert not rep.used_prefilter
    assert any("too few distinct" in r for r in rep.skip_reasons)
    assert_df_equal(got, x.join(y, "id", "inner"))


def test_engine_dispatch(spark, xy):
    x, y = xy
    with pytest.raises(NotImplementedError):
        bloom_join(x, y, on="id", engine="fuse")
    with pytest.raises(ValueError):
        bloom_join(x, y, on="id", engine="nope")


def test_auto_engine_prefers_native_without_metrics(spark):
    """auto → native when nothing needs the sketch engine; auto → bloom
    whenever row metrics (default) or checkpointed resume are requested."""
    x = spark.range(0, 8_000).withColumn("vx", F.col("id") * 2)
    y = spark.range(4_000, 4_800).withColumn("vy", F.col("id") * 3)
    _, rep = bloom_join(
        x, y, on="id", force_prefilter=True, collect_metrics=False,
        return_report=True,
    )
    assert rep.engine == "native"
    _, rep2 = bloom_join(x, y, on="id", force_prefilter=True, return_report=True)
    assert rep2.engine == "bloom"


def test_validation_errors(spark, xy):
    x, y = xy
    with pytest.raises(ValueError, match="fpp"):
        bloom_join(x, y, on="id", fpp=1.5)
    with pytest.raises(ValueError, match="join type"):
        bloom_join(x, y, on="id", how="sideways")
    with pytest.raises(ValueError, match="not in x"):
        bloom_join(x, y, on="nope")
    with pytest.raises(TypeError):
        bloom_join("not a df", y, on="id")


def test_report_metadata(spark):
    x = spark.range(0, 5000).withColumn("vx", F.col("id") * 2)
    y = spark.range(0, 500).withColumn("vy", F.col("id") * 3)
    got, rep = bloom_join(x, y, on="id", how="inner", force_prefilter=True, return_report=True)
    n = got.count()  # action → accumulators populated
    assert n == 500
    assert rep.used_prefilter and rep.prefilter_side == "x" and rep.build_side == "y"
    assert rep.filter_bits and rep.filter_bits & (rep.filter_bits - 1) == 0
    assert rep.n_build == 500
    assert rep.build_partitions >= 1
    # public row metrics (reference bloom_metadata filtered/retained/
    # reduction fields): finalize() reads the accumulators after the
    # action. Task-level telemetry may re-evaluate the probe, so the
    # counts bound the logical row counts; the ratio stays exact.
    rep.finalize()
    assert rep.probe_rows_before >= 5000
    assert rep.probe_rows_after <= rep.probe_rows_before
    assert rep.reduction_ratio >= 0.75  # ≥75% filtered before the join


def test_prefilter_actually_reduces(spark):
    # sparse join: reduction must exceed 0.95
    # (reference test-memory-performance.R:276-301)
    x = spark.range(0, 50_000).withColumn("vx", F.lit(1))
    y = spark.range(0, 50).withColumn("vy", F.lit(2))
    got, rep = bloom_join(
        x, y, on="id", how="inner", force_prefilter=True, return_report=True
    )
    assert got.count() == 50
    reduction = rep.finalize().reduction_ratio
    assert reduction > 0.95


import contextlib


@contextlib.contextmanager
def _no_broadcast_gate(spark):
    """Disable BOTH free plan-stats gates (broadcast + probe floor) so a
    test can isolate the gate it actually exercises on small data."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.bloomjoin.minProbeBytes", "0")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.bloomjoin.minProbeBytes")


def test_broadcast_gate_skips_small_build(spark):
    """A build side under autoBroadcastJoinThreshold skips the prefilter
    in auto mode — Catalyst's broadcast-hash join already avoids the
    probe-side shuffle, so the filter passes are pure overhead."""
    x = spark.range(0, 200_000).withColumn("vx", F.col("id"))
    y = spark.range(0, 1000).withColumn("vy", F.col("id"))
    got, rep = bloom_join(x, y, on="id", how="inner", return_report=True)
    assert not rep.used_prefilter
    assert any("autoBroadcastJoinThreshold" in r for r in rep.skip_reasons)
    assert_df_equal(got, x.join(y, "id", "inner"))
    # force_prefilter overrides the gate
    _, rep2 = bloom_join(
        x, y, on="id", how="inner", force_prefilter=True, return_report=True
    )
    assert rep2.used_prefilter


def test_probe_floor_skips_small_probe(spark):
    """Probe side under the plan-stats floor → auto skips the prefilter
    BEFORE any sizing job runs (the reference's probe_rows < 1024 gate,
    R/bloomjoin.R:385-387, on Catalyst's free size signal) — the grid's
    mid cells (200k/100k-row probes) lose 6-7× to naive without this.
    Build side over the broadcast threshold so the floor is the gate
    that fires; explicit min_probe_bytes param and the session conf both
    control it; force_prefilter bypasses it."""
    x = spark.range(0, 50_000).withColumn("vx", F.col("id"))
    y = spark.range(0, 500).withColumn("vy", F.col("id"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got, rep = bloom_join(x, y, on="id", how="inner", return_report=True,
                              min_probe_bytes=1 << 30)
        assert not rep.used_prefilter
        assert any("floor" in r for r in rep.skip_reasons)
        # no sizing aggregation ran: the gate fired on free plan stats
        assert rep.n_build is None
        assert_df_equal(got, x.join(y, "id", "inner"))
        # conf-driven floor (what a cluster operator would set)
        spark.conf.set("spark.bloomjoin.minProbeBytes", "1g")
        _, rep2 = bloom_join(x, y, on="id", how="inner", return_report=True)
        assert not rep2.used_prefilter and any("floor" in r for r in rep2.skip_reasons)
        spark.conf.unset("spark.bloomjoin.minProbeBytes")
        # floor disabled → the prefilter proceeds (other gates off too)
        spark.conf.set("spark.bloomjoin.minProbeBytes", "0")
        _, rep3 = bloom_join(x, y, on="id", how="inner", return_report=True)
        assert rep3.used_prefilter, rep3.skip_reasons
        spark.conf.unset("spark.bloomjoin.minProbeBytes")
        # force_prefilter bypasses the floor like every other gate
        _, rep4 = bloom_join(x, y, on="id", how="inner", return_report=True,
                             force_prefilter=True, min_probe_bytes=1 << 30)
        assert rep4.used_prefilter
        # code-review r4 fix: a SET conf that fails to parse must raise
        # — never silently fall back to the 256 MB default
        spark.conf.set("spark.bloomjoin.minProbeBytes", "lots")
        with pytest.raises(ValueError, match="minProbeBytes"):
            bloom_join(x, y, on="id", how="inner")
        spark.conf.unset("spark.bloomjoin.minProbeBytes")
        # byte-suffix forms parse without the JVM helper
        from bloomjoin_spark.operators.bloom_join import _parse_byte_string

        assert _parse_byte_string("256m") == 256 << 20
        assert _parse_byte_string("2g") == 2 << 30
        assert _parse_byte_string("1024") == 1024
        assert _parse_byte_string("1.5k") == 1536
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sizing_uses_distinct_not_rows(spark):
    """Build side with heavy key duplication must size the filter by
    distinct keys (the reference right-sizes to exact unique count,
    src/BloomFilter.cpp:102-118) — m for 100k rows over 100 distinct
    keys must be far below m for 100k distinct keys."""
    x = spark.range(0, 5000).withColumn("vx", F.col("id"))
    y = spark.range(0, 100_000).select((F.col("id") % 100).alias("id"))
    # pin the filtered side so the BUILD side is the duplicated one
    _, rep = bloom_join(
        x, y, on="id", how="inner", force_prefilter=True, return_report=True,
        prefilter_side="x",
    )
    assert rep.n_build == 100_000
    assert rep.build_distinct_estimate is not None
    assert rep.build_distinct_estimate < 200
    # 100-ish distinct keys at fpp=0.01 needs ~1000 bits, not ~1M
    assert rep.filter_bits < 16_384


def test_selectivity_skip_high_overlap(spark):
    """Full-overlap join: sampled pass rate ≈ 1 ⇒ prefilter skipped,
    result still identical to the plain join (reference cost gate,
    R/bloomjoin.R:300-311). Broadcast gate disabled so the SAMPLED gate
    is what fires."""
    x = spark.range(0, 20_000).withColumn("vx", F.col("id") * 2)
    y = spark.range(0, 20_000).withColumn("vy", F.col("id") * 3)
    with _no_broadcast_gate(spark):
        got, rep = bloom_join(x, y, on="id", how="inner", return_report=True)
    assert not rep.used_prefilter
    assert rep.expected_reduction is not None and rep.expected_reduction <= 0.02
    assert any("expected reduction" in r for r in rep.skip_reasons)
    assert_df_equal(got, x.join(y, "id", "inner"))


def test_selectivity_proceeds_low_overlap(spark):
    """1% overlap: the sampled gate must NOT skip."""
    x = spark.range(0, 50_000).withColumn("vx", F.col("id"))
    y = spark.range(0, 500).withColumn("vy", F.col("id"))
    with _no_broadcast_gate(spark):
        got, rep = bloom_join(x, y, on="id", how="inner", return_report=True)
    assert rep.used_prefilter
    assert rep.expected_reduction is None or rep.expected_reduction > 0.02
    assert_df_equal(got, x.join(y, "id", "inner"))


def test_selectivity_sample_spans_partitions(spark):
    """Clustered probe input: every matching key lives in the FIRST
    partitions — a limit(n)-based sample would measure pass rate ≈ 1
    and wrongly skip the prefilter; the systematic per-partition sample
    must see the true ~6% selectivity and proceed."""
    from pyspark.sql import functions as SF

    # 16 range partitions in order: ids 0..49999; matches are ids < 3000
    # (the first partition), rest are non-matching
    x = spark.range(0, 50_000, 1, 16).withColumn("vx", F.col("id"))
    y = spark.range(0, 3_000).withColumn("vy", F.col("id"))
    with _no_broadcast_gate(spark):
        got, rep = bloom_join(x, y, on="id", how="inner", return_report=True)
    assert rep.used_prefilter, rep.skip_reasons
    assert rep.selectivity_estimate is not None
    assert rep.selectivity_estimate < 0.5  # not fooled into ~1.0
    assert_df_equal(got, x.join(y, "id", "inner"))


def test_wide_table_50_columns(spark):
    """Reference test-edge-cases.R:188-213: 50-column tables survive the
    prefilter with all payload columns intact."""
    import datetime as _dt

    x = spark.range(0, 300)
    for i in range(48):
        x = x.withColumn(f"c{i}", F.col("id") * i)
    y = spark.range(100, 400).withColumn("vy", F.col("id") + 1)
    got = bloom_join(x, y, on="id", how="inner", force_prefilter=True)
    exp = x.join(y, "id", "inner")
    assert len(got.columns) == 50  # id + 48 payload + vy
    assert_df_equal(got, exp)


def test_unicode_and_collision_prone_string_keys(spark):
    """Reference test-edge-cases.R:155-186,215-232."""
    rows = [
        ("héllo wörld", 1), ("日本語キー", 2), ("emoji🙂key", 3),
        ("a" * 200, 4), ("a" * 199 + "b", 5), ("", 6),
        ("key\twith\ttabs", 7), ("key with spaces", 8),
    ]
    x = spark.createDataFrame(rows, "k string, vx int")
    y = spark.createDataFrame(rows[::2], "k string, vy int")
    got = bloom_join(x, y, on="k", how="inner", force_prefilter=True)
    assert_df_equal(got, x.join(y, "k", "inner"))


@pytest.mark.parametrize("fpp", [1e-4, 0.5])
def test_extreme_fpp_result_invariance(spark, xy, fpp):
    """Reference test-edge-cases.R:234-252: results identical at any fpp."""
    x, y = xy
    got = bloom_join(x, y, on="id", how="inner", fpp=fpp, force_prefilter=True)
    assert_df_equal(got, x.join(y, "id", "inner"))


def test_date_vs_timestamp_cross_type_key(spark):
    """Reference test-cross-type-keys.R Date↔POSIXct: joining a date
    column to a timestamp column must not produce false negatives
    (the prefilter hashes through the common cast)."""
    x = spark.sql(
        "SELECT sequence(to_date('2024-01-01'), to_date('2024-03-10')) AS ds"
    ).select(F.explode("ds").alias("d")).withColumn("vx", F.dayofyear("d"))
    y = x.select(F.col("d").cast("timestamp").alias("t")).filter(
        F.dayofmonth("t") <= 10
    ).withColumn("vy", F.lit(1))
    got = bloom_join(x, y, on={"d": "t"}, how="inner", force_prefilter=True)
    exp = x.join(y, x["d"] == y["t"], "inner")
    assert_df_equal(got, exp)
    assert got.count() > 0


def test_auto_side_picks_larger_side(spark):
    """inner+auto: plan-stats drive the side choice — the larger side is
    filtered, the smaller side builds the filter (reference density
    rule, R/bloomjoin.R:367-376)."""
    small = spark.range(0, 2_000).withColumn("vx", F.col("id"))
    big = spark.range(0, 500_000).withColumn("vy", F.col("id"))
    with _no_broadcast_gate(spark):
        got, rep = bloom_join(
            small, big, on="id", how="inner", return_report=True,
            force_prefilter=True,
        )
        assert rep.prefilter_side == "y"
        assert rep.build_side == "x"
        got2, rep2 = bloom_join(
            big, small, on="id", how="inner", return_report=True,
            force_prefilter=True,
        )
        assert rep2.prefilter_side == "x"
        assert rep2.build_side == "y"
    assert_df_equal(got, small.join(big, "id", "inner"))


def test_broadcast_budget_warning(spark, monkeypatch):
    """A filter over the broadcast budget warns instead of silently
    shipping (the reference's 2^40-bit cap, src/BloomFilter.h:94-95,
    as a Spark broadcast concern)."""
    import importlib

    bj = importlib.import_module("bloomjoin_spark.operators.bloom_join")
    monkeypatch.setattr(bj, "_BROADCAST_BUDGET_BYTES", 1024)
    x = spark.range(0, 50_000).withColumn("vx", F.col("id"))
    y = spark.range(0, 20_000).withColumn("vy", F.col("id"))
    with pytest.warns(UserWarning, match="broadcast budget"):
        got = bloom_join(x, y, on="id", how="inner", force_prefilter=True)
        assert got.count() == 20_000


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_native_engine_identical_to_plain_join(spark, how):
    """engine='native' (JVM stat.bloomFilter build + codegen
    BloomFilterMightContain probe) is result-identical to the plain
    join, like the sketch engine."""
    x = spark.range(0, 8_000).withColumn("vx", F.col("id") * 2)
    y = spark.range(4_000, 4_800).withColumn("vy", F.col("id") * 3)
    got, rep = bloom_join(
        x, y, on="id", how=how, engine="native", force_prefilter=True,
        return_report=True,
    )
    assert_df_equal(got, x.join(y, "id", spark_how(how)))
    assert rep.engine == "native" and rep.used_prefilter


def test_native_engine_composite_and_strings(spark):
    x = spark.createDataFrame(
        [(f"d{i}", i % 50, i) for i in range(4_000)], "k string, g int, vx long"
    )
    y = spark.createDataFrame(
        [(f"d{i}", i % 50, -i) for i in range(0, 4_000, 9)], "k string, g int, vy long"
    )
    got = bloom_join(
        x, y, on=["k", "g"], how="inner", engine="native", force_prefilter=True
    )
    assert_df_equal(got, x.join(y, ["k", "g"], "inner"))


def test_native_engine_selectivity_skip(spark):
    """Full overlap + native engine: the sampled gate still fires."""
    x = spark.range(0, 20_000).withColumn("vx", F.col("id"))
    y = spark.range(0, 20_000).withColumn("vy", F.col("id"))
    with _no_broadcast_gate(spark):
        got, rep = bloom_join(
            x, y, on="id", how="inner", engine="native", return_report=True
        )
    assert not rep.used_prefilter
    assert any("expected reduction" in r for r in rep.skip_reasons)
    assert_df_equal(got, x.join(y, "id", "inner"))


def test_native_engine_size_gate_falls_back(spark, monkeypatch):
    """A serialized filter above the plan-literal cap must NOT ship as a
    per-task literal: the native path degrades to the broadcast sketch
    engine with a warning, result unchanged."""
    import importlib

    bj = importlib.import_module("bloomjoin_spark.operators.bloom_join")
    monkeypatch.setattr(bj, "_NATIVE_FILTER_CAP_BYTES", 64)
    monkeypatch.setattr(bj, "_native_fallback_warned", False)
    x = spark.range(0, 8_000).withColumn("vx", F.col("id") * 2)
    y = spark.range(4_000, 4_800).withColumn("vy", F.col("id") * 3)
    with pytest.warns(UserWarning, match="plan-literal cap"):
        got, rep = bloom_join(
            x, y, on="id", how="inner", engine="native", force_prefilter=True,
            return_report=True,
        )
        assert_df_equal(got, x.join(y, "id", "inner"))
    assert rep.engine == "bloom" and rep.used_prefilter
    assert "plan-literal cap" in rep.engine_fallback_reason


def test_native_engine_probe_drift_falls_back(spark, monkeypatch):
    """Private-API drift AFTER a successful build (probe-side Column
    construction raises) also degrades to the sketch engine instead of
    raising out of bloom_join."""
    import importlib

    bj = importlib.import_module("bloomjoin_spark.operators.bloom_join")

    def boom(*a, **kw):
        raise RuntimeError("ExpressionUtils moved")

    monkeypatch.setattr(bj, "_native_might_contain", boom)
    monkeypatch.setattr(bj, "_native_fallback_warned", False)
    x = spark.range(0, 8_000).withColumn("vx", F.col("id") * 2)
    y = spark.range(4_000, 4_800).withColumn("vy", F.col("id") * 3)
    with pytest.warns(UserWarning, match="native bloom engine unavailable"):
        got, rep = bloom_join(
            x, y, on="id", how="inner", engine="native", force_prefilter=True,
            return_report=True,
        )
        assert_df_equal(got, x.join(y, "id", "inner"))
    assert rep.engine == "bloom" and rep.used_prefilter
    assert "ExpressionUtils moved" in rep.engine_fallback_reason


def test_auto_mode_native_fallback_is_observable(spark, monkeypatch):
    """VERDICT r4 #3: engine='auto' degrading to the sketch engine on
    private-API drift must be OBSERVABLE — every affected report carries
    engine_fallback_reason, and the session warns exactly once (not per
    call, not zero times)."""
    import importlib
    import warnings as W

    bj = importlib.import_module("bloomjoin_spark.operators.bloom_join")

    def boom(*a, **kw):
        raise RuntimeError("simulated Spark upgrade drift")

    monkeypatch.setattr(bj, "_native_build_filter", boom)
    monkeypatch.setattr(bj, "_native_fallback_warned", False)
    x = spark.range(0, 8_000).withColumn("vx", F.col("id") * 2)
    y = spark.range(4_000, 4_800).withColumn("vy", F.col("id") * 3)

    # call 1 (auto dispatches native): warns once, reason recorded
    with pytest.warns(UserWarning, match="native bloom engine unavailable"):
        got, rep = bloom_join(
            x, y, on="id", how="inner", force_prefilter=True,
            collect_metrics=False, return_report=True,
        )
        assert_df_equal(got, x.join(y, "id", "inner"))
    assert rep.engine == "bloom" and rep.used_prefilter
    assert "simulated Spark upgrade drift" in rep.engine_fallback_reason

    # call 2: no second warning, but the report still carries the reason
    with W.catch_warnings():
        W.simplefilter("error", UserWarning)
        got2, rep2 = bloom_join(
            x, y, on="id", how="inner", force_prefilter=True,
            collect_metrics=False, return_report=True,
        )
        assert_df_equal(got2, x.join(y, "id", "inner"))
    assert "simulated Spark upgrade drift" in rep2.engine_fallback_reason

    # a successful native run leaves the field None
    monkeypatch.undo()
    _, rep3 = bloom_join(
        x, y, on="id", how="inner", force_prefilter=True,
        collect_metrics=False, return_report=True,
    )
    assert rep3.engine == "native" and rep3.engine_fallback_reason is None


def test_native_engine_rejects_checkpoint(spark):
    x = spark.range(0, 100)
    y = spark.range(0, 10)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        bloom_join(x, y, on="id", engine="native", checkpoint_dir="/tmp/nope")
