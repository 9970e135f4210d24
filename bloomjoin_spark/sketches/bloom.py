"""Bloom filter sketch — the flagship, generalizing the reference's
``BloomFilter`` (``/root/reference/src/BloomFilter.h:15-157``,
``src/BloomFilter.cpp:21-165``) into a mergeable two-phase aggregate.

Parity points (re-derived, not ported — all numpy, no per-row work):

- bit-packed uint64 words, power-of-two size so addressing is a mask,
  not a modulo (reference ``src/BloomFilter.h:98-100``);
- Kirsch–Mitzenmacher double hashing: two 64-bit hashes expand to k
  probe positions, h2 forced odd (``src/BloomFilter.cpp:25-36``,
  ``src/BloomFilter.h:70``);
- sizing: ``m = 2^ceil(log2(-n ln p / ln²2))``, ``k = round(m/n · ln2)``,
  escalate m until the achieved fpr meets the target, hard caps on m
  and k (``src/BloomFilter.h:81-128``);
- explicit null tracking: the build side records "saw a null", a null
  probe matches iff the build had one (``src/BloomFilter.h:148-151``);
- merge = bitwise OR of equal-shaped filters — insertion order and
  partition grouping can never change the final bitset.

Scale notes (100 TB / 1000 executors): the filter is built once from
the *small* side of a join and broadcast; the cap (default 2^33 bits =
1 GiB) is a broadcast-budget guard, stricter than the reference's 2^40
because Spark broadcasts must stay well under driver/executor memory.
The probe is a vectorized gather over the local broadcast copy — no
shuffle, no Python loop.
"""

from __future__ import annotations

import math
import struct
import warnings

import numpy as np

from ..hashing import splitmix64
from .base import Sketch

_U64 = np.uint64
_LN2 = math.log(2.0)

#: broadcast-budget cap (bits). 2^33 bits = 1 GiB of filter.
MAX_BITS = 1 << 33
MAX_K = 64

_SEED1 = 0xA076_1D64_78BD_642F
_SEED2 = 0xE703_7ED1_A0B4_28DB


def bloom_sizing(n: int, p: float) -> tuple[int, int]:
    """(m_bits, k) for n expected distinct keys at target fpr p.

    Same closed form + escalation loop as the reference
    (``src/BloomFilter.h:81-128``): integer-k rounding can overshoot the
    target, so grow m (power-of-two steps) until the achieved fpr
    ``(1 - exp(-k n / m))^k`` meets p, stopping at the cap.
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"fpp must be in (0,1), got {p}")
    n = max(int(n), 1)
    m_ideal = -n * math.log(p) / (_LN2 * _LN2)
    m = 1 << max(6, math.ceil(math.log2(max(m_ideal, 1.0))))
    m = min(m, MAX_BITS)
    while True:
        k = max(1, min(MAX_K, round((m / n) * _LN2)))
        achieved = (1.0 - math.exp(-k * n / m)) ** k
        if achieved <= p or m >= MAX_BITS:
            break
        m <<= 1
    if achieved > p:
        warnings.warn(
            f"bloom filter cannot reach fpp={p:g} for n={n} under the "
            f"{MAX_BITS} bit broadcast cap; achieved ≈ {achieved:.3g}",
            stacklevel=2,
        )
    return m, k


def bloom_params(n: int, p: float = 0.01) -> dict:
    """Report (m, k, bytes, bits/key, achieved fpr) — must call the SAME
    sizing code the filter uses (the reference fixed exactly that drift,
    ``/root/reference/R/params.R:8-14``)."""
    m, k = bloom_sizing(n, p)
    achieved = (1.0 - math.exp(-k * max(n, 1) / m)) ** k
    return {
        "n": n,
        "target_fpr": p,
        "m_bits": m,
        "k": k,
        "size_bytes": m // 8,
        "bits_per_key": m / max(n, 1),
        "achieved_fpr": achieved,
        "target_met": achieved <= p,
    }


def format_bloom_params(params: dict) -> str:
    """Human-readable report for a ``bloom_params`` dict (parity with
    the reference's ``print.bloom_params``, ``R/params.R:79-90``)."""
    mib = params["size_bytes"] / (1 << 20)
    return "\n".join(
        [
            "Bloom filter for a target false positive rate",
            f"  n (expected keys): {params['n']:,}",
            f"  target FPR:        {params['target_fpr']:.3g}",
            f"  total bits (m):    {params['m_bits']:,}",
            f"  total bytes:       {params['size_bytes']:,} ({mib:.3g} MiB)",
            f"  bits per key:      {params['bits_per_key']:.4g}",
            f"  hashes (k):        {params['k']}",
            f"  achieved FPR:      {params['achieved_fpr']:.4g}",
            f"  target met:        {params['target_met']}",
        ]
    )


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _popcount(words: np.ndarray) -> int:
    return int(_POP8[words.view(np.uint8)].sum(dtype=np.int64))


def _probe_matrix(h: np.ndarray, k: int, mask: np.uint64) -> np.ndarray:
    """(len(h), k) uint64 probe positions via KM double hashing."""
    with np.errstate(over="ignore"):
        h1 = splitmix64(h ^ _U64(_SEED1))
        h2 = splitmix64(h ^ _U64(_SEED2)) | _U64(1)  # odd → full-cycle stride
        ks = np.arange(k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) & mask


class BloomSketch(Sketch):
    # BLM2: payload gained a mode byte (dense bitmap vs sparse hash
    # list).  BLM1 (dense-only, no mode byte) still deserializes via
    # _from_payload_legacy so pre-upgrade checkpoint_dir partials resume.
    KIND = b"BLM2"
    LEGACY_KINDS = (b"BLM1",)
    CONSUMES = "hashes"
    #: membership insert is idempotent (update_hashes dedups anyway)
    SET_SEMANTICS = True

    def __init__(self, n: int, fpp: float = 0.01, _words: np.ndarray | None = None):
        self.n_hint = int(n)
        self.fpp = float(fpp)
        self.m, self.k = bloom_sizing(n, fpp)
        self.mask = _U64(self.m - 1)
        self._words = (
            _words
            if _words is not None
            else np.zeros(self.m // 64, dtype=np.uint64)
        )
        self.has_null = False
        self.n_added = 0
        # retained key hashes for SPARSE serialization: a per-partition
        # partial of a large filter holds few keys relative to m, so
        # shipping 8·n bytes of hashes beats m/8 bytes of bitmap — at
        # 100k partitions × a 1 GiB-cap filter that is the difference
        # between collecting terabytes of partial bitmaps and megabytes
        # of hash lists. Dropped (None) once past the breakeven n = m/64.
        self._sparse: list[np.ndarray] | None = []

    # -- build ---------------------------------------------------------
    @property
    def words(self) -> np.ndarray:
        """Dense bitmap — densified LAZILY: a sketch deserialized from a
        sparse partial carries only its hash list until first probed, so
        tree-merging sparse partials is list concatenation, never a
        per-partial m/8-byte allocation + scatter."""
        if self._words is None:
            self._words = np.zeros(self.m // 64, dtype=np.uint64)
            if self._sparse:
                self._set_bits(np.concatenate(self._sparse))
        return self._words

    def _set_bits(self, h: np.ndarray) -> None:
        # positions are computed ONE PROBE AT A TIME into a reused
        # n-sized buffer instead of materializing the (n, k) matrix —
        # three k·n·8-byte temporaries per insert batch meant ~550 MB of
        # FRESH allocations for a 1M-key densify, and first-touch page
        # faults on this class of (oversubscribed) host run at ~50 MB/s:
        # measured 27 s for the matrix form vs 0.3 s for this loop, with
        # identical positions
        with np.errstate(over="ignore"):
            h1 = splitmix64(h.astype(np.uint64, copy=False) ^ _U64(_SEED1))
            h2 = splitmix64(h.astype(np.uint64, copy=False) ^ _U64(_SEED2)) | _U64(1)
        p = np.empty_like(h1)
        if self.m <= (1 << 28) and h.size * self.k >= 4096:
            # duplicate-safe scatter-STORE into a bool plane + packbits:
            # O(n) stores + O(m/8) pack, ~30× faster than the unbuffered
            # np.bitwise_or.at scatter (measured 1.7s → 0.06s for 6M
            # probe positions into a 2^23-bit filter)
            bools = np.zeros(self.m, dtype=bool)
            with np.errstate(over="ignore"):
                for i in range(self.k):
                    np.multiply(h2, _U64(i), out=p)
                    np.add(p, h1, out=p)
                    np.bitwise_and(p, self.mask, out=p)
                    bools[p] = True
            packed = np.packbits(bools, bitorder="little")
            np.bitwise_or(self._words, packed.view(np.uint64), out=self._words)
            return
        bit = np.empty_like(h1)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                np.multiply(h2, _U64(i), out=p)
                np.add(p, h1, out=p)
                np.bitwise_and(p, self.mask, out=p)
                np.left_shift(_U64(1), np.bitwise_and(p, _U64(63)), out=bit)
                np.right_shift(p, _U64(6), out=p)
                np.bitwise_or.at(self._words, p, bit)

    def update_hashes(self, h: np.ndarray) -> None:
        """Insert a batch of canonical uint64 hashes (dedup first — the
        reference sorts+uniques before insert, src/BloomFilter.cpp:111-114)."""
        if h.size == 0:
            return
        h = np.unique(h.astype(np.uint64, copy=False))
        self.words  # ensure dense before scatter
        self._set_bits(h)
        self.n_added += int(h.size)
        if self._sparse is not None:
            if self.n_added <= self.m // 64:
                self._sparse.append(h)
            else:
                self._sparse = None

    def add_null(self) -> None:
        self.has_null = True

    def seal(self) -> "BloomSketch":
        """Densify and drop the retained hash list — call before
        broadcasting so executors receive only the m/8-byte bitmap,
        not bitmap + hash list."""
        self.words
        self._sparse = None
        return self

    # -- probe ---------------------------------------------------------
    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool array, True = maybe present.

        Batched SHORT-CIRCUIT (the vector analog of the reference's
        per-key early exit, src/BloomFilter.cpp:39-51): probe i only
        tests the keys still alive after probe i−1, so for non-members
        the expected gather work is n/(1−fill) ≈ 2n instead of k·n —
        the probe is the per-row hot path of bloom_join, this is ~4×
        less memory traffic at fill ≈ 0.5."""
        if h.size == 0:
            return np.empty(0, dtype=bool)
        words = self.words
        hh = h.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h1 = splitmix64(hh ^ _U64(_SEED1))
            h2 = splitmix64(hh ^ _U64(_SEED2)) | _U64(1)
        alive = np.arange(h.size)
        for i in range(self.k):
            with np.errstate(over="ignore"):
                p = (h1[alive] + _U64(i) * h2[alive]) & self.mask
            hit = (words[p >> _U64(6)] >> (p & _U64(63))) & _U64(1)
            alive = alive[hit.astype(bool)]
            if alive.size == 0:
                break
        out = np.zeros(h.size, dtype=bool)
        out[alive] = True
        return out

    # -- merge ---------------------------------------------------------
    def merge(self, other: "BloomSketch") -> "BloomSketch":
        if other.m != self.m or other.k != self.k:
            raise ValueError("cannot OR-merge differently sized bloom filters")
        self.has_null |= other.has_null
        self.n_added += other.n_added
        both_sparse = self._sparse is not None and other._sparse is not None
        if both_sparse and self._words is None and other._words is None:
            # sparse ∪ sparse: pool hash lists; densify only on demand
            self._sparse = self._sparse + other._sparse
            return self
        np.bitwise_or(self.words, other.words, out=self._words)
        if both_sparse and self.n_added <= self.m // 64:
            self._sparse = self._sparse + other._sparse
        else:
            self._sparse = None
        return self

    # -- introspection ---------------------------------------------------
    def fill_ratio(self) -> float:
        return _popcount(self.words) / self.m

    def observed_fpr(self) -> float:
        """fpr implied by the actual fill ratio: fill^k."""
        return self.fill_ratio() ** self.k

    # -- serialization ---------------------------------------------------
    # payload = header + mode byte + body.  mode 0: dense bitmap words
    # (m/8 bytes); mode 1: sparse unique-hash list (8·n bytes) — chosen
    # whenever the retained hash list is still under the breakeven
    # n = m/64, so partial blobs of large filters stay tiny.
    def _payload_bytes(self) -> bytes:
        head = struct.pack(
            "<QIdBq", self.m, self.k, self.fpp, int(self.has_null), self.n_added
        )
        if self._sparse is not None:
            hs = (
                np.unique(np.concatenate(self._sparse))
                if self._sparse
                else np.empty(0, dtype=np.uint64)
            )
            if hs.size <= self.m // 64:
                return head + b"\x01" + hs.tobytes()
        return head + b"\x00" + self.words.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "BloomSketch":
        m, k, fpp, has_null, n_added = struct.unpack_from("<QIdBq", payload, 0)
        off = struct.calcsize("<QIdBq")
        mode = payload[off]
        off += 1
        obj = cls.__new__(cls)
        obj.n_hint = n_added
        obj.fpp = fpp
        obj.m, obj.k = m, k
        obj.mask = _U64(m - 1)
        obj.has_null = bool(has_null)
        obj.n_added = n_added
        if mode == 1:
            h = np.frombuffer(payload, dtype=np.uint64, offset=off).copy()
            obj._words = None  # lazy: densify on first probe/dense merge
            obj._sparse = [h] if h.size else []
        else:
            obj._words = np.frombuffer(payload, dtype=np.uint64, offset=off).copy()
            obj._sparse = None
        return obj

    @classmethod
    def _from_payload_legacy(cls, payload: bytes) -> "BloomSketch":
        """BLM1 blobs exist in TWO layouts: the original dense-only one
        (header + words, no mode byte) and the later one that added the
        mode byte WITHOUT bumping the tag — byte-identical to the BLM2
        payload.  Disambiguate by length: the dense-no-mode body is
        exactly m/8 bytes (a multiple of 8); with the mode byte a dense
        body is m/8+1 and a sparse body is 8·n+1 — neither can equal
        m/8."""
        m, k, fpp, has_null, n_added = struct.unpack_from("<QIdBq", payload, 0)
        off = struct.calcsize("<QIdBq")
        if len(payload) - off != m // 8:
            return cls._from_payload(payload)  # mode-byte layout, old tag
        obj = cls.__new__(cls)
        obj.n_hint = n_added
        obj.fpp = fpp
        obj.m, obj.k = m, k
        obj.mask = _U64(m - 1)
        obj.has_null = bool(has_null)
        obj.n_added = n_added
        obj._words = np.frombuffer(payload, dtype=np.uint64, offset=off).copy()
        obj._sparse = None
        return obj

    @classmethod
    def empty_like(cls, proto: "BloomSketch") -> "BloomSketch":
        obj = cls.__new__(cls)
        obj.n_hint, obj.fpp, obj.m, obj.k = proto.n_hint, proto.fpp, proto.m, proto.k
        obj.mask = _U64(proto.m - 1)
        obj._words = np.zeros(proto.m // 64, dtype=np.uint64)
        obj.has_null = False
        obj.n_added = 0
        obj._sparse = []
        return obj
