"""HyperLogLog — distinct-count sketch (Flajolet et al. 2007, with the
64-bit-hash variant of Heule et al. 2013 so no large-range correction
is needed).

Generalizes the reference's sampling distinct-count estimator
(``/root/reference/R/bloomjoin.R:223-238``) into a mergeable aggregate:
m = 2^p byte registers, update = max(register, rank), merge =
elementwise max — associative, commutative, idempotent, so the merged
estimate is bit-identical under any merge ordering.

Error: relative std error ≈ 1.04/√m (p=14 → m=16384 → 0.81%).
All register math is vectorized numpy over uint64 hash batches.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch

_U64 = np.uint64


def _floor_log2(x: np.ndarray) -> np.ndarray:
    """Exact vectorized floor(log2(x)) for uint64 (0 → 0)."""
    out = np.zeros(x.shape, dtype=np.uint64)
    y = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        s = _U64(s)
        gt = (y >> s) != 0
        out[gt] += s
        y[gt] >>= s
    return out


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HllSketch(Sketch):
    # HLL2: payload gained a mode byte (dense registers vs sparse
    # pairs); HLL1 (dense-only) still reads via _from_payload_legacy.
    KIND = b"HLL2"
    LEGACY_KINDS = (b"HLL1",)
    CONSUMES = "hashes"
    #: register update is max ⇒ idempotent: the aggregation harness may
    #: dedup each batch before calling update_hashes
    SET_SEMANTICS = True

    def __init__(self, p: int = 14, _regs: np.ndarray | None = None):
        if not (4 <= p <= 18):
            raise ValueError(f"hll precision p must be in [4,18], got {p}")
        self.p = p
        self.m = 1 << p
        self.regs = _regs if _regs is not None else np.zeros(self.m, dtype=np.uint8)
        self.has_null = False

    @property
    def rel_std_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    # -- build ---------------------------------------------------------
    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        h = h.astype(np.uint64, copy=False)
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        rest = h << _U64(self.p)  # low 64-p bits shifted up
        # rank = leading zeros of rest + 1, capped at 64-p+1 (rest==0)
        nlz = np.where(rest == 0, _U64(64 - self.p), _U64(63) - _floor_log2(rest))
        rank = (nlz + _U64(1)).astype(np.uint8)
        np.maximum.at(self.regs, idx, rank)

    def add_null(self) -> None:
        self.has_null = True

    # -- merge ---------------------------------------------------------
    def merge(self, other: "HllSketch") -> "HllSketch":
        if other.p != self.p:
            raise ValueError("cannot merge HLL sketches of different precision")
        np.maximum(self.regs, other.regs, out=self.regs)
        self.has_null |= other.has_null
        return self

    # -- estimate --------------------------------------------------------
    def estimate(self) -> float:
        regs = self.regs.astype(np.float64)
        e = _alpha(self.m) * self.m * self.m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.regs == 0))
        if e <= 2.5 * self.m and zeros > 0:
            return self.m * math.log(self.m / zeros)  # linear counting
        return float(e)

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    # -- serialization ---------------------------------------------------
    # mode 0: dense 2^p byte registers.  mode 1: sparse (int32 index,
    # uint8 rank) pairs for low-cardinality partials — a partition that
    # saw k distinct keys touches ≤ k of the 2^p registers, so its blob
    # ships 5·nnz bytes instead of 2^p.
    def _payload_bytes(self) -> bytes:
        head = struct.pack("<IB", self.p, int(self.has_null))
        nz = np.flatnonzero(self.regs)
        if nz.size * 5 <= self.m // 2:
            return (
                head + b"\x01" + nz.astype(np.int32).tobytes() + self.regs[nz].tobytes()
            )
        return head + b"\x00" + self.regs.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "HllSketch":
        p, has_null = struct.unpack_from("<IB", payload, 0)
        off = struct.calcsize("<IB")
        mode = payload[off]
        off += 1
        if mode == 1:
            body = payload[off:]
            n = len(body) // 5
            idx = np.frombuffer(body, dtype=np.int32, count=n)
            vals = np.frombuffer(body, dtype=np.uint8, offset=n * 4)
            regs = np.zeros(1 << p, dtype=np.uint8)
            regs[idx] = vals
        else:
            regs = np.frombuffer(payload, dtype=np.uint8, offset=off).copy()
        obj = cls(p, _regs=regs)
        obj.has_null = bool(has_null)
        return obj

    @classmethod
    def _from_payload_legacy(cls, payload: bytes) -> "HllSketch":
        """HLL1 blobs exist in TWO layouts: dense-only (header + 2^p
        registers, no mode byte) and the later mode-byte one under the
        same tag (byte-identical to HLL2).  Disambiguate by length:
        dense-no-mode body is exactly 2^p bytes; mode-byte dense is
        2^p+1, and mode-byte sparse (5·nnz+1) can only equal 2^p at
        nnz=(2^p−1)/5 — above the nnz ≤ 2^p/10 threshold at which the
        writer ever picks the sparse form, so it never occurs."""
        p, has_null = struct.unpack_from("<IB", payload, 0)
        off = struct.calcsize("<IB")
        if len(payload) - off != (1 << p):
            return cls._from_payload(payload)  # mode-byte layout, old tag
        regs = np.frombuffer(payload, dtype=np.uint8, offset=off).copy()
        obj = cls(p, _regs=regs)
        obj.has_null = bool(has_null)
        return obj
