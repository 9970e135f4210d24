"""Property-based merge-invariance tests (hypothesis): the load-bearing
contract of every sketch is that ANY partitioning + merge ordering gives
the same answer as a single-pass build (SURVEY.md §2.2 — mirrors how
rcpp_filter_keys yields one global filter regardless of insertion
order). Pure numpy — no Spark session."""

import numpy as np
from hypothesis import example, given, settings, strategies as st

from bloomjoin_spark.hashing import hash_float64, hash_strings, splitmix64
from bloomjoin_spark.sketches import BloomSketch, CmsSketch, HllSketch, KllSketch, TDigestSketch


def _rng_split(data: np.ndarray, seed: int, nparts: int):
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(data))
    return [data[p] for p in np.array_split(idx, nparts) if len(p) or True]


keys = st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=400)
splits = st.integers(min_value=1, max_value=7)
seeds = st.integers(min_value=0, max_value=2**31)


@given(keys, splits, seeds)
@settings(max_examples=40, deadline=None)
def test_bloom_merge_bit_identical(vals, nparts, seed):
    h = hash_float64(np.array(vals, dtype=np.float64))
    single = BloomSketch(max(len(vals), 16), 0.01)
    single.update_hashes(h)
    merged = None
    for part in _rng_split(h, seed, nparts):
        s = BloomSketch(max(len(vals), 16), 0.01)
        s.update_hashes(part)
        merged = s if merged is None else merged.merge(s)
    assert (merged.words == single.words).all()
    # zero false negatives always
    if len(vals):
        assert merged.contains_hashes(h).all()


@given(keys, splits, seeds)
@settings(max_examples=40, deadline=None)
def test_hll_merge_bit_identical(vals, nparts, seed):
    h = hash_float64(np.array(vals, dtype=np.float64))
    single = HllSketch(12)
    single.update_hashes(h)
    merged = None
    for part in _rng_split(h, seed, nparts):
        s = HllSketch(12)
        s.update_hashes(part)
        merged = s if merged is None else merged.merge(s)
    assert (merged.regs == single.regs).all()
    assert merged.estimate() == single.estimate()


@given(keys, splits, seeds)
@settings(max_examples=40, deadline=None)
def test_cms_merge_table_identical(vals, nparts, seed):
    h = hash_float64(np.array(vals, dtype=np.float64))
    single = CmsSketch(eps=1e-2, delta=1e-2)
    single.update_hashes(h)
    merged = None
    for part in _rng_split(h, seed, nparts):
        s = CmsSketch(eps=1e-2, delta=1e-2)
        s.update_hashes(part)
        merged = s if merged is None else merged.merge(s)
    assert (merged.table == single.table).all()
    assert merged.total == single.total


@given(
    st.lists(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
             min_size=1, max_size=500),
    splits,
    seeds,
)
@settings(max_examples=25, deadline=None)
def test_kll_rank_bound_under_random_merges(vals, nparts, seed):
    v = np.array(vals, dtype=np.float64)
    merged = None
    for part in _rng_split(v, seed, nparts):
        s = KllSketch(200)
        s.update_values(part)
        merged = s if merged is None else merged.merge(s)
    eps = 2.296 / 200**0.9
    srt = np.sort(v)
    n = len(v)
    for q in (0.1, 0.5, 0.9):
        est = float(np.atleast_1d(merged.quantile([q]))[0])
        lo = max(0.0, (np.searchsorted(srt, est, "left")) / n)
        hi = (np.searchsorted(srt, est, "right")) / n
        err = max(0.0, q - hi, lo - q)
        assert err <= eps + 1.0 / n + 1e-9, (q, est, err)


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
             min_size=1, max_size=500),
    splits,
    seeds,
)
@settings(max_examples=25, deadline=None)
# ULP regression (round 5): equal interpolation endpoints must return
# the duplicated value EXACTLY — the convex lerp rounded one ULP low
# and crossed the value's whole rank run
@example(vals=[0.0] * 6 + [999999.9999999999] * 3, nparts=1, seed=0)
def test_tdigest_rank_bound_under_random_merges(vals, nparts, seed):
    v = np.array(vals, dtype=np.float64)
    merged = None
    for part in _rng_split(v, seed, nparts):
        s = TDigestSketch(200.0)
        s.update_values(part)
        merged = s if merged is None else merged.merge(s)
    srt = np.sort(v)
    n = len(v)
    for q in (0.1, 0.5, 0.9):
        est = float(np.atleast_1d(merged.quantile([q]))[0])
        lo = np.searchsorted(srt, est, "left") / n
        hi = np.searchsorted(srt, est, "right") / n
        err = max(0.0, q - hi, lo - q)
        assert err <= 0.05 + 1.0 / n + 1e-9, (q, est, err)


@given(st.lists(st.text(max_size=30), min_size=0, max_size=200))
@settings(max_examples=30, deadline=None)
def test_string_hash_deterministic_and_injective_ish(texts):
    import pandas as pd

    s = pd.Series(texts, dtype=object)
    h1, h2 = hash_strings(s), hash_strings(s)
    assert (h1 == h2).all()
    # distinct strings map to distinct hashes in practice (64-bit)
    uniq = len(set(texts))
    assert len(np.unique(h1)) == uniq or uniq > 100


@given(st.lists(st.integers(min_value=-(2**52), max_value=2**52), max_size=200))
@settings(max_examples=30, deadline=None)
def test_int_double_cross_type_hash_equality(ints):
    a = hash_float64(np.array(ints, dtype=np.float64))
    import pandas as pd

    from bloomjoin_spark.hashing import hash_series

    b = hash_series(pd.Series(ints, dtype="int64"))
    c = hash_series(pd.Series([float(i) for i in ints], dtype="float64"))
    assert (a == b).all() and (b == c).all()


@given(
    texts=st.lists(
        st.text(max_size=40), min_size=1, max_size=60
    ),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_utf8_arrow_kernel_equals_pandas_path(texts, seed):
    """Property: the Arrow utf8 buffer kernel and the pandas hash_strings
    path agree on arbitrary unicode (incl. empty strings, surrogpairs
    arrow rejects are excluded by st.text), any seed."""
    import pandas as pd
    import pyarrow as pa

    from bloomjoin_spark.hashing import hash_strings, hash_utf8_arrow

    a = hash_utf8_arrow(pa.array(texts, type=pa.string()), seed)
    b = hash_strings(pd.Series(texts, dtype=object), seed)
    assert np.array_equal(a, b)


@given(
    vals=st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=400),
    nparts=st.integers(min_value=1, max_value=7),
    seed=st.integers(min_value=0, max_value=999),
)
@settings(max_examples=40, deadline=None)
def test_bloom_sparse_roundtrip_merge_invariant(vals, nparts, seed):
    """Property: serialize→deserialize (sparse OR dense mode, whichever
    the blob chose) at every merge step yields the same final bitset as
    in-memory merging, for any partitioning of the input."""
    from bloomjoin_spark.hashing import hash_int64

    rng = np.random.default_rng(seed)
    arr = np.array(vals, dtype=np.int64)
    parts = np.array_split(arr[rng.permutation(arr.size)], nparts)
    direct = BloomSketch(max(len(vals), 16), 0.01)
    direct.update_hashes(hash_int64(arr))
    acc = None
    for p in parts:
        sk = BloomSketch(max(len(vals), 16), 0.01)
        if p.size:
            sk.update_hashes(hash_int64(p))
        rt = BloomSketch.from_bytes(sk.to_bytes())  # force blob roundtrip
        acc = rt if acc is None else acc.merge(rt)
    assert np.array_equal(acc.words, direct.words)


@given(
    vals=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=500),
)
@settings(max_examples=40, deadline=None)
def test_cms_hll_sparse_roundtrip_exact(vals):
    from bloomjoin_spark.hashing import hash_int64

    h = hash_int64(np.array(vals, dtype=np.int64))
    cms = CmsSketch(eps=1e-3, delta=1e-3)
    cms.update_hashes(h)
    rt = CmsSketch.from_bytes(cms.to_bytes())
    assert np.array_equal(rt.table, cms.table) and rt.total == cms.total
    hll = HllSketch(12)
    hll.update_hashes(h)
    rt2 = HllSketch.from_bytes(hll.to_bytes())
    assert np.array_equal(rt2.regs, hll.regs)


@given(
    st.integers(min_value=0, max_value=2**31),   # data seed
    st.integers(min_value=1, max_value=7),       # nparts
    st.integers(min_value=0, max_value=2**31),   # shuffle seed
    st.integers(min_value=3, max_value=10),      # ell
)
@settings(max_examples=25, deadline=None)
def test_fd_guarantees_under_random_merges(dseed, nparts, mseed, ell):
    """FrequentDirections under ANY partitioning + merge order:
    AtA - BtB stays PSD, its spectral norm stays <= the sketch's own
    certified shrink_mass, shrink_mass <= ||A||F^2/ell, and row/mass
    accounting is exact."""
    from bloomjoin_spark.sketches.fd import FrequentDirectionsSketch

    rng = np.random.default_rng(dseed)
    n, d = int(rng.integers(0, 300)), int(rng.integers(2, 12))
    A = rng.normal(size=(n, d))
    parts = _rng_split(A, mseed, nparts)
    sks = []
    for p in parts:
        s = FrequentDirectionsSketch(ell=ell, dim=d)
        if len(p):
            s.update_matrix(p)
        sks.append(s)
    order = np.random.default_rng(mseed + 1).permutation(len(sks))
    acc = sks[order[0]]
    for i in order[1:]:
        acc = acc.merge(sks[i])
    diff = A.T @ A - acc.gram()
    ev = np.linalg.eigvalsh(diff) if d else np.zeros(0)
    assert ev.size == 0 or ev.min() >= -1e-6
    assert ev.size == 0 or float(np.abs(ev).max()) <= acc.spectral_error_bound() + 1e-6
    assert acc.spectral_error_bound() <= (A * A).sum() / ell + 1e-6
    assert acc.n_rows == n
    assert abs(acc.fro_sq - (A * A).sum()) <= 1e-9 * max((A * A).sum(), 1.0)
