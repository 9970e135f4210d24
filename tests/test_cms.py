"""CMS tests: never undercounts, ε–δ overcount bound, merge = add."""

import numpy as np
import pytest

from bloomjoin_spark.hashing import hash_int64
from bloomjoin_spark.sketches import CmsSketch, Sketch, cms_params


def _zipf_stream(n, vocab, seed=7):
    rng = np.random.default_rng(seed)
    vals = rng.zipf(1.3, size=n).astype(np.int64) % vocab
    return vals


def test_params():
    d, w = cms_params(0.001, 0.01)
    assert w >= np.e / 0.001 and d >= np.log(100)
    with pytest.raises(ValueError):
        cms_params(0, 0.5)


def test_never_undercounts_and_bound():
    vals = _zipf_stream(200_000, 10_000)
    h = hash_int64(vals)
    sk = CmsSketch(eps=1e-3, delta=1e-3)
    sk.update_hashes(h)
    keys, true_counts = np.unique(vals, return_counts=True)
    est = sk.query_hashes(hash_int64(keys))
    assert (est >= true_counts).all()  # structural: min of sums ≥ truth
    # overcount ≤ εN for (almost) all keys; allow the δ tail
    over = est - true_counts
    viol = (over > sk.error_bound()).mean()
    assert viol <= 0.01


def test_weighted_updates():
    keys = np.arange(100, dtype=np.int64)
    h = hash_int64(keys)
    sk = CmsSketch(eps=1e-4, delta=1e-3)
    sk.update_hashes(h, weights=np.full(100, 7, dtype=np.int64))
    est = sk.query_hashes(h)
    assert (est >= 7).all()
    assert sk.total == 700


def test_merge_equals_single_pass_exactly():
    vals = _zipf_stream(50_000, 1000)
    h = hash_int64(vals)
    whole = CmsSketch(eps=1e-3, delta=1e-2)
    whole.update_hashes(h)
    parts = []
    for chunk in np.array_split(h, 7):
        p = CmsSketch(eps=1e-3, delta=1e-2)
        p.update_hashes(chunk)
        parts.append(p)
    acc = parts[3]
    for p in [parts[0], parts[6], parts[1], parts[5], parts[2], parts[4]]:
        acc = acc.merge(p)
    assert np.array_equal(acc.table, whole.table)
    assert acc.total == whole.total


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        CmsSketch(1e-3, 1e-2).merge(CmsSketch(1e-4, 1e-2))


def test_serde_roundtrip():
    sk = CmsSketch(eps=1e-3, delta=1e-2)
    sk.update_hashes(hash_int64(np.arange(1000, dtype=np.int64)))
    back = Sketch.from_bytes(sk.to_bytes())
    assert isinstance(back, CmsSketch)
    assert np.array_equal(back.table, sk.table)
    assert back.total == sk.total


def test_cms_sparse_partial_roundtrip():
    """Low-cardinality partials serialize sparse (nonzero cells), dense
    tables round-trip unchanged; both reconstruct bit-identically."""
    import numpy as np

    from bloomjoin_spark.hashing import hash_int64
    from bloomjoin_spark.sketches.cms import CmsSketch

    sk = CmsSketch(eps=1e-4, delta=1e-3)  # ~1.5 MB dense
    h = hash_int64(np.arange(500, dtype=np.int64))
    sk.update_hashes(h, weights=np.arange(1, 501, dtype=np.int64))
    blob = sk.to_bytes()
    assert len(blob) < sk.table.nbytes // 4
    rt = CmsSketch.from_bytes(blob)
    assert np.array_equal(rt.table, sk.table)
    assert rt.total == sk.total
    # dense regime: many uniques
    big = CmsSketch(eps=1e-3, delta=1e-3)
    big.update_hashes(hash_int64(np.arange(100_000, dtype=np.int64)))
    rt2 = CmsSketch.from_bytes(big.to_bytes())
    assert np.array_equal(rt2.table, big.table)


def test_inner_product_no_int64_overflow():
    """At the documented 100 TB design point the per-row cell-product
    sum exceeds int64; the accumulation must not wrap negative."""
    import numpy as np

    from bloomjoin_spark.sketches.cms import CmsSketch

    a = CmsSketch(0.5, 0.5)  # tiny table so cells get huge counts
    b = CmsSketch(0.5, 0.5)
    w = np.array([2.0**40] * 4)
    h = np.arange(1, 5, dtype=np.uint64)
    for _ in range(4):
        a.update_hashes(h, weights=w)
        b.update_hashes(h, weights=w)
    est = a.inner_product(b)
    assert est > 0  # int64 einsum would have wrapped negative here
