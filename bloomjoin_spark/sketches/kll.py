"""KLL quantile sketch (Karnin, Lang & Liberty 2016) — worst-case
guaranteed rank error, complementing t-digest's tail accuracy.

Compactor stack: level h holds items each representing 2^h originals;
a full level sorts, keeps alternating items (random even/odd offset),
and promotes half to level h+1. Capacity of level h (from the top) is
⌈k·c^(H−h)⌉ with c=2/3. Rank error ≈ O(1/k) with high probability.

Randomness: a counter-based PCG64 stream seeded from a fixed constant
plus a per-sketch compaction counter — deterministic for a fixed
insertion/merge sequence, unbiased across compactions (SURVEY.md
"hard parts": tests assert bound compliance under permuted merges,
not bit-equality).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch

_C = 2.0 / 3.0
_SEED = 0x5EED0F11  # fixed base seed


class KllSketch(Sketch):
    KIND = b"KLL1"
    CONSUMES = "values"

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be ≥ 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.count = 0
        self.has_null = False
        self._compactions = 0
        self.vmin = np.inf
        self.vmax = -np.inf

    # -- capacities ------------------------------------------------------
    def _cap(self, h: int) -> int:
        depth = len(self.levels) - 1 - h  # 0 for the top level
        return max(2, math.ceil(self.k * (_C**depth)))

    # -- build ---------------------------------------------------------
    def update_values(self, v: np.ndarray) -> None:
        if np.issubdtype(v.dtype, np.floating):
            v = v[~np.isnan(v)]
        if v.size == 0:
            return
        v = v.astype(np.float64, copy=False)
        self.count += int(v.size)
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact_all()

    def add_null(self) -> None:
        self.has_null = True

    def _compact_all(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size > self._cap(h):
                self._compact_level(h)
            h += 1

    def _compact_level(self, h: int) -> None:
        items = np.sort(self.levels[h])
        if items.size < 2:
            return
        rng = np.random.Generator(
            np.random.PCG64(_SEED + 1000003 * self._compactions + h)
        )
        self._compactions += 1
        offset = int(rng.integers(0, 2))
        # promoted items double their weight; an unpaired boundary item
        # stays at this level so total weight stays exact
        if items.size % 2 == 1:
            if offset == 0:
                promoted = items[0:-1:2]
                self.levels[h] = items[-1:].copy()
            else:
                promoted = items[1::2]
                self.levels[h] = items[:1].copy()
        else:
            promoted = items[offset::2]
            self.levels[h] = np.empty(0, dtype=np.float64)
        if h + 1 >= len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # -- merge ---------------------------------------------------------
    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches of different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, arr in enumerate(other.levels):
            if arr.size:
                self.levels[h] = np.concatenate([self.levels[h], arr])
        self.count += other.count
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self.has_null |= other.has_null
        self._compactions += other._compactions + 1
        self._compact_all()
        return self

    # -- query ---------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, arr in enumerate(self.levels):
            if arr.size:
                vals.append(arr)
                wts.append(np.full(arr.size, float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted_items()
        if v.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        targets = np.clip(qs, 0, 1) * cum[-1]
        idx = np.minimum(np.searchsorted(cum, targets, side="left"), v.size - 1)
        out = v[idx]
        out[qs <= 0.0] = self.vmin
        out[qs >= 1.0] = self.vmax
        return float(out[0]) if scalar else out

    def rank(self, x: float) -> float:
        v, w = self._weighted_items()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        j = np.searchsorted(v, x, side="right")
        return float((cum[j - 1] if j > 0 else 0.0) / cum[-1])

    def epsilon(self) -> float:
        """Published high-probability rank-error bound ≈ 2.296/k^0.9
        (KLL paper, constant per the Apache DataSketches calibration)."""
        return 2.296 / (self.k**0.9)

    # -- serialization ---------------------------------------------------
    def _payload_bytes(self) -> bytes:
        head = struct.pack(
            "<iqddBqi",
            self.k,
            self.count,
            self.vmin,
            self.vmax,
            int(self.has_null),
            self._compactions,
            len(self.levels),
        )
        parts = [head]
        for arr in self.levels:
            parts.append(struct.pack("<q", arr.size))
            parts.append(arr.astype(np.float64).tobytes())
        return b"".join(parts)

    @classmethod
    def _from_payload(cls, payload: bytes) -> "KllSketch":
        k, count, vmin, vmax, has_null, compactions, nlev = struct.unpack_from(
            "<iqddBqi", payload, 0
        )
        off = struct.calcsize("<iqddBqi")
        obj = cls(k)
        obj.levels = []
        for _ in range(nlev):
            (n,) = struct.unpack_from("<q", payload, off)
            off += 8
            obj.levels.append(np.frombuffer(payload, np.float64, count=n, offset=off).copy())
            off += 8 * n
        obj.count, obj.vmin, obj.vmax = count, vmin, vmax
        obj.has_null = bool(has_null)
        obj._compactions = compactions
        return obj
