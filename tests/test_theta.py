"""Theta (KMV) sketch: merge invariance, exactness below k, estimate /
set-algebra accuracy bounds, serialization, and the Spark build path.

Mirrors the HLL tier's contract (SURVEY.md §2.2 — the reference's
sampling distinct estimator, ``R/bloomjoin.R:223-238``, generalized to
a mergeable aggregate) plus the capability HLL lacks: intersection /
difference cardinalities via set ops on the retained hash sample.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from bloomjoin_spark.hashing import hash_float64
from bloomjoin_spark.sketches import Sketch, ThetaSketch


def _rng_split(data: np.ndarray, seed: int, nparts: int):
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(data))
    return [data[p] for p in np.array_split(idx, nparts)]


keys = st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=400)
splits = st.integers(min_value=1, max_value=7)
seeds = st.integers(min_value=0, max_value=2**31)


@given(keys, splits, seeds)
@settings(max_examples=40, deadline=None)
def test_theta_merge_identical_and_exact_below_k(vals, nparts, seed):
    h = hash_float64(np.array(vals, dtype=np.float64))
    single = ThetaSketch(64)
    single.update_hashes(h)
    merged = None
    for part in _rng_split(h, seed, nparts):
        s = ThetaSketch(64)
        s.update_hashes(part)
        merged = s if merged is None else merged.merge(s)
    # retained set + theta are ORDER-INVARIANT (same k-smallest of the
    # same distinct hash set), so the merged sketch is bit-identical
    assert merged.theta == single.theta
    assert np.array_equal(merged.hashes, single.hashes)
    exact = len(np.unique(h))
    if exact <= 64:
        assert single.theta == 1 << 64
        assert single.estimate() == exact  # exact below k


def test_theta_estimate_and_set_algebra_within_bounds():
    rng = np.random.default_rng(42)
    a = rng.integers(0, 2**64, 200_000, dtype=np.uint64)
    b = np.concatenate(
        [a[:50_000], rng.integers(0, 2**64, 200_000, dtype=np.uint64)]
    )
    a, b = np.unique(a), np.unique(b)
    exact_inter = len(np.intersect1d(a, b))
    exact_union = len(np.union1d(a, b))
    sa = ThetaSketch(4096)
    sa.update_hashes(a)
    sb = ThetaSketch(4096)
    sb.update_hashes(b)
    z = 5
    assert abs(sa.estimate() - len(a)) <= z * len(a) * sa.rel_std_error
    assert abs(sb.estimate() - len(b)) <= z * len(b) * sb.rel_std_error
    u = sa.union(sb)
    assert abs(u.estimate() - exact_union) <= z * exact_union * u.rel_std_error
    bound = sa.error_bound_vs(sb, z=z)
    assert abs(sa.intersect(sb) - exact_inter) <= bound
    assert abs(sa.a_not_b(sb) - (len(a) - exact_inter)) <= bound
    # jaccard of the retained samples tracks the true jaccard
    assert abs(sa.jaccard(sb) - exact_inter / exact_union) <= 0.05


def test_theta_exact_set_ops_below_k():
    a = hash_float64(np.arange(0, 100, dtype=np.float64))
    b = hash_float64(np.arange(60, 160, dtype=np.float64))
    sa = ThetaSketch(4096)
    sa.update_hashes(a)
    sb = ThetaSketch(4096)
    sb.update_hashes(b)
    assert sa.intersect(sb) == 40.0
    assert sa.a_not_b(sb) == 60.0
    assert sa.union(sb).estimate() == 160.0
    assert sa.error_bound_vs(sb) == 0.0  # both exact -> zero bound


def test_theta_serialization_roundtrip():
    rng = np.random.default_rng(3)
    s = ThetaSketch(512)
    s.update_hashes(rng.integers(0, 2**64, 10_000, dtype=np.uint64))
    s.add_null()
    rt = Sketch.from_bytes(s.to_bytes())
    assert isinstance(rt, ThetaSketch)
    assert rt.k == s.k and rt.theta == s.theta and rt.has_null
    assert np.array_equal(rt.hashes, s.hashes)
    # exact (untrimmed) sketch round-trips the full-theta sentinel
    small = ThetaSketch(512)
    small.update_hashes(rng.integers(0, 2**64, 10, dtype=np.uint64))
    rt2 = Sketch.from_bytes(small.to_bytes())
    assert rt2.theta == 1 << 64 and rt2.estimate() == small.estimate()


def test_theta_validation_and_mismatched_k():
    with pytest.raises(ValueError):
        ThetaSketch(k=4)
    a, b = ThetaSketch(64), ThetaSketch(128)
    with pytest.raises(ValueError):
        a.merge(b)
    with pytest.raises(ValueError):
        a.intersect(b)


def test_theta_spark_build_and_source_overlap(spark, sf_dir):
    """End-to-end: build per-source theta sketches over documents words
    via the shared two-phase harness; intersection estimate matches the
    exact distinct overlap (exactly, when vocabulary < k)."""
    from pyspark.sql import functions as F

    from bloomjoin_spark import build_sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(
        F.col("source"),
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    sources = [r["source"] for r in words.select("source").distinct().collect()]
    sources = sorted(sources)[:2]
    sk = {}
    for src in sources:
        res = build_sketch(
            words.filter(F.col("source") == src),
            lambda: ThetaSketch(k=65536),
            cols=["w"],
        )
        sk[src] = res.sketch
    exact = (
        words.filter(F.col("source").isin(sources))
        .groupBy("w")
        .agg(F.countDistinct("source").alias("ns"))
        .filter(F.col("ns") == 2)
        .count()
    )
    est = sk[sources[0]].intersect(sk[sources[1]])
    bound = max(sk[sources[0]].error_bound_vs(sk[sources[1]]), 1e-9)
    assert abs(est - exact) <= bound or est == exact


def test_rel_std_error_zero_while_exact():
    """An untrimmed sketch is exact — its documented RSE is 0, not
    1/sqrt(k-1) (callers build confidence intervals from this)."""
    import numpy as np

    from bloomjoin_spark.sketches.theta import ThetaSketch

    sk = ThetaSketch(4096)
    sk.update_hashes(np.arange(1, 100, dtype=np.uint64))
    assert sk.rel_std_error == 0.0
    big = ThetaSketch(64)
    big.update_hashes(np.random.default_rng(1).integers(
        1, 2**63, size=5000, dtype=np.uint64).astype(np.uint64))
    assert big.rel_std_error > 0.0
