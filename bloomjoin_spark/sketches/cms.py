"""Count–min sketch (Cormode & Muthukrishnan 2005) — per-key frequency
over massive streams; here: per-token frequency over ``tokens`` arrays.

d×w int64 counter matrix; update adds (optionally weighted) counts at
one position per row, merge = elementwise add (associative/commutative),
point query = min over the d rows.

Guarantee: est ≥ true, and est ≤ true + εN with probability ≥ 1−δ
for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉ (N = total added weight).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..hashing import splitmix64
from .base import Sketch

_U64 = np.uint64
_ROW_SEED = 0x5851F42D4C957F2D


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    if not (0 < eps < 1) or not (0 < delta < 1):
        raise ValueError("eps and delta must be in (0,1)")
    w = math.ceil(math.e / eps)
    d = math.ceil(math.log(1.0 / delta))
    return d, w


class CmsSketch(Sketch):
    # CMS2: payload gained a mode byte (dense table vs sparse pairs);
    # CMS1 (dense-only) still reads via _from_payload_legacy.
    KIND = b"CMS2"
    LEGACY_KINDS = (b"CMS1",)
    CONSUMES = "hashes"
    #: the aggregation harness may pre-aggregate a batch to
    #: (unique hash, count) and call update_hashes(u, weights=c) —
    #: far less scatter work on zipf-ish token streams
    SUPPORTS_WEIGHTS = True

    def __init__(
        self,
        eps: float = 1e-4,
        delta: float = 1e-3,
        _table: np.ndarray | None = None,
    ):
        self.eps = float(eps)
        self.delta = float(delta)
        self.d, self.w = cms_params(eps, delta)
        self.table = (
            _table if _table is not None else np.zeros((self.d, self.w), dtype=np.int64)
        )
        self.total = 0  # N: total added weight
        self.has_null = False

    # -- row-position hashing (shared by update and query) -------------
    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(d, len(h)) int64 column positions."""
        h = h.astype(np.uint64, copy=False)
        out = np.empty((self.d, h.size), dtype=np.int64)
        for i in range(self.d):
            seed = _U64((_ROW_SEED * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
            out[i] = (splitmix64(h ^ seed) % _U64(self.w)).astype(np.int64)
        return out

    # -- build ---------------------------------------------------------
    def update_hashes(self, h: np.ndarray, weights: np.ndarray | None = None) -> None:
        if h.size == 0:
            return
        pos = self._positions(h)
        # bincount (buffered, contiguous) beats np.add.at (unbuffered
        # scatter) by ~10× at these widths; w*8B is a few hundred KB
        if weights is None:
            for i in range(self.d):
                self.table[i] += np.bincount(pos[i], minlength=self.w)
            self.total += int(h.size)
        else:
            w = weights.astype(np.float64, copy=False)
            for i in range(self.d):
                self.table[i] += np.bincount(
                    pos[i], weights=w, minlength=self.w
                ).astype(np.int64)
            self.total += int(w.sum())

    def add_null(self) -> None:
        self.has_null = True

    # -- merge ---------------------------------------------------------
    def merge(self, other: "CmsSketch") -> "CmsSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("cannot merge CMS of different shapes")
        self.table += other.table
        self.total += other.total
        self.has_null |= other.has_null
        return self

    # -- query ---------------------------------------------------------
    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        """Point-query estimates (int64) for a batch of key hashes."""
        if h.size == 0:
            return np.empty(0, dtype=np.int64)
        pos = self._positions(h)
        ests = np.empty((self.d, h.size), dtype=np.int64)
        for i in range(self.d):
            ests[i] = self.table[i][pos[i]]
        return ests.min(axis=0)

    def error_bound(self) -> float:
        """εN — the additive overcount bound (prob ≥ 1−δ)."""
        return self.eps * self.total

    def inner_product(self, other: "CmsSketch") -> int:
        """Estimate ⟨a, b⟩ = Σ_k f_a(k)·f_b(k) — for key-frequency
        sketches this IS the inner-join cardinality |A ⋈ B|.

        Row position hashing is deterministic and shared (same
        ``_ROW_SEED`` schedule), so two same-shape sketches align
        cell-for-cell: estimate = min_i ⟨table_a[i], table_b[i]⟩.
        Guarantees (Cormode–Muthukrishnan §4.2): never an
        UNDERestimate (every cell sum dominates the true product), and
        the overcount is ≤ ε·N_a·N_b with probability ≥ 1−δ —
        ``inner_product_bound`` returns that additive bound."""
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("cannot inner-product CMS of different shapes")
        # accumulate in float64: at the design scale (two 10^12-row
        # sides, eps=1e-5) a row's cell-product sum is ~N_a·N_b/w ≈
        # 7e18 > int64 max — int accumulation would wrap negative and
        # silently break the never-undercount guarantee.  float64's
        # 2^53 mantissa is far inside the ε-bound noise at any scale
        # where the sum exceeds it.
        dots = np.einsum(
            "ij,ij->i", self.table, other.table, dtype=np.float64
        )
        return int(dots.min())

    def inner_product_bound(self, other: "CmsSketch") -> float:
        """ε·N_a·N_b — additive overcount bound for ``inner_product``
        (prob ≥ 1−δ)."""
        return self.eps * self.total * other.total

    # -- serialization ---------------------------------------------------
    # mode 0: dense d×w int64 table.  mode 1: sparse (flat index, count)
    # pairs — a per-partition partial of a wide CMS (ε=1e-4 ⇒ ~1.5 MB
    # dense) touches ≤ d·uniques cells; when the nonzeros fit in half
    # the dense bytes the blob ships sparse.  Read directly off the
    # table at serialization time — no build-path bookkeeping.
    def _payload_bytes(self) -> bytes:
        head = struct.pack(
            "<ddqB", self.eps, self.delta, self.total, int(self.has_null)
        )
        flat = self.table.ravel()
        nz = np.flatnonzero(flat)
        if nz.size * 16 <= self.table.nbytes // 2:
            return (
                head + b"\x01" + nz.astype(np.int64).tobytes() + flat[nz].tobytes()
            )
        return head + b"\x00" + self.table.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "CmsSketch":
        eps, delta, total, has_null = struct.unpack_from("<ddqB", payload, 0)
        off = struct.calcsize("<ddqB")
        mode = payload[off]
        off += 1
        obj = cls(eps, delta)
        if mode == 1:
            pairs = np.frombuffer(payload, dtype=np.int64, offset=off)
            n = pairs.size // 2
            flat = obj.table.ravel()
            flat[pairs[:n]] = pairs[n:]
        else:
            obj.table = (
                np.frombuffer(payload, dtype=np.int64, offset=off)
                .reshape(obj.d, obj.w)
                .copy()
            )
        obj.total = total
        obj.has_null = bool(has_null)
        return obj

    @classmethod
    def _from_payload_legacy(cls, payload: bytes) -> "CmsSketch":
        """CMS1 blobs exist in TWO layouts: dense-only (header + d×w
        table, no mode byte) and the later mode-byte one under the same
        tag (byte-identical to CMS2).  Disambiguate by length: the
        dense-no-mode body is exactly d·w·8 bytes (multiple of 8); with
        the mode byte, dense is d·w·8+1 and sparse is 16·nnz+1 (odd)."""
        eps, delta, total, has_null = struct.unpack_from("<ddqB", payload, 0)
        off = struct.calcsize("<ddqB")
        obj = cls(eps, delta)
        if len(payload) - off != obj.table.nbytes:
            return cls._from_payload(payload)  # mode-byte layout, old tag
        obj.table = (
            np.frombuffer(payload, dtype=np.int64, offset=off)
            .reshape(obj.d, obj.w)
            .copy()
        )
        obj.total = total
        obj.has_null = bool(has_null)
        return obj
