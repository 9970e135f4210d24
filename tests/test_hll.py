"""HLL tests: error bound 1.04/√m, merge-order bit-invariance, serde."""

import numpy as np
import pytest

from bloomjoin_spark.hashing import hash_int64
from bloomjoin_spark.sketches import HllSketch, Sketch


def _h(lo, hi):
    return hash_int64(np.arange(lo, hi, dtype=np.int64))


@pytest.mark.parametrize("n", [100, 10_000, 1_000_000])
def test_estimate_within_bound(n):
    sk = HllSketch(p=14)
    sk.update_hashes(_h(0, n))
    est = sk.estimate()
    # 4σ of the published relative std error
    assert abs(est - n) / n <= 4 * sk.rel_std_error + 1e-9


def test_small_range_linear_counting():
    sk = HllSketch(p=12)
    sk.update_hashes(_h(0, 10))
    assert sk.cardinality() == 10


def test_duplicates_do_not_inflate():
    sk = HllSketch(p=14)
    for _ in range(5):
        sk.update_hashes(_h(0, 1000))
    assert abs(sk.estimate() - 1000) / 1000 <= 4 * sk.rel_std_error


def test_merge_order_bit_invariance():
    # HLL merged estimate must be IDENTICAL under any merge ordering
    chunks = [_h(i * 5000, (i + 1) * 5000) for i in range(8)]
    import itertools

    def build(order):
        parts = []
        for i in order:
            s = HllSketch(p=12)
            s.update_hashes(chunks[i])
            parts.append(s)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.merge(p)
        return acc

    a = build(range(8))
    b = build([7, 3, 0, 5, 1, 6, 2, 4])
    assert np.array_equal(a.regs, b.regs)
    assert a.estimate() == b.estimate()


def test_merge_equals_single_pass():
    whole = HllSketch(p=13)
    whole.update_hashes(_h(0, 50_000))
    half1, half2 = HllSketch(p=13), HllSketch(p=13)
    half1.update_hashes(_h(0, 25_000))
    half2.update_hashes(_h(25_000, 50_000))
    assert np.array_equal(half1.merge(half2).regs, whole.regs)


def test_precision_mismatch_raises():
    with pytest.raises(ValueError):
        HllSketch(p=12).merge(HllSketch(p=14))
    with pytest.raises(ValueError):
        HllSketch(p=3)


def test_serde_roundtrip():
    sk = HllSketch(p=11)
    sk.update_hashes(_h(0, 7777))
    sk.add_null()
    back = Sketch.from_bytes(sk.to_bytes())
    assert isinstance(back, HllSketch)
    assert np.array_equal(back.regs, sk.regs)
    assert back.has_null and back.estimate() == sk.estimate()


def test_hll_sparse_partial_roundtrip():
    import numpy as np

    from bloomjoin_spark.hashing import hash_int64
    from bloomjoin_spark.sketches.hll import HllSketch

    sk = HllSketch(14)
    sk.update_hashes(hash_int64(np.arange(200, dtype=np.int64)))
    blob = sk.to_bytes()
    assert len(blob) < (1 << 14) // 4
    rt = HllSketch.from_bytes(blob)
    assert np.array_equal(rt.regs, sk.regs)
    assert rt.estimate() == sk.estimate()
    big = HllSketch(12)
    big.update_hashes(hash_int64(np.arange(100_000, dtype=np.int64)))
    rt2 = HllSketch.from_bytes(big.to_bytes())
    assert np.array_equal(rt2.regs, big.regs)
