"""Theta (KMV) sketch — distinct counting WITH set algebra.

Fills the one gap the HLL tier leaves: HLL unions exactly (register
max) but cannot intersect, so "how many doc_ids appear in BOTH source
A and source B" needs either an exact wide shuffle or inclusion-
exclusion (whose error explodes when |A∩B| ≪ |A∪B|).  The theta
sketch (Dasgupta, Lang, Rhodes, Thorup — "A Framework for Estimating
Stream Expression Cardinalities", and the Apache DataSketches theta
family) keeps the k smallest distinct 64-bit hashes plus a threshold
θ; because the retained set is a uniform sample of the distinct keys
below θ, set EXPRESSIONS (A∩B, A\\B, unions of many sketches) evaluate
by plain set operations on the retained hashes, each yielding an
unbiased |S|/θ estimate.

Extends the reference's distinct-count estimator
(``/root/reference/R/bloomjoin.R:223-238``) the same way the HLL tier
does — as a mergeable two-phase aggregate (``base.py`` protocol):

- update: keep hashes < θ, dedup, trim to the k smallest; after a
  trim, θ becomes the (k+1)-th smallest value seen.
- merge: θ = min(θ_a, θ_b); union retained sets below θ; re-trim.
  Associative + commutative + idempotent, so partials merge in any
  tree order with identical results (pinned by pytest permutations).
- estimate: |retained| / (θ / 2^64); EXACT (θ still 2^64) until more
  than k distinct keys are seen.

Error: for a full sketch the union/estimate RSE ≈ 1/√(k−1) (k=4096 →
1.56%).  Intersection error scales with the UNION size: the retained
intersection count is a Binomial(n_∩, θ_frac) draw, so the absolute
error of ``intersect`` is bounded by the union-scale term
√(n_union)·/√k — callers pin ``|est − exact| ≤ z·union_est/√(k−1)``
(see ``error_bound_vs``).

All batch math is vectorized numpy over uint64 hash arrays; blobs are
the sorted retained hashes (8·n bytes, ≤ 8k + header ≈ 32 KiB at
k=4096), far below the tree-merge fan-in budget.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import Sketch

_U64 = np.uint64
_FULL_THETA = 1 << 64  # exclusive upper bound: "nothing trimmed yet"


class ThetaSketch(Sketch):
    KIND = b"THE1"
    CONSUMES = "hashes"
    #: retained-set membership is idempotent: the harness may dedup
    #: each batch before calling update_hashes
    SET_SEMANTICS = True

    def __init__(self, k: int = 4096, _hashes: np.ndarray | None = None,
                 _theta: int = _FULL_THETA):
        if not (16 <= k <= 1 << 26):
            raise ValueError(f"theta sketch k must be in [16, 2^26], got {k}")
        self.k = k
        self.theta = int(_theta)  # exclusive; python int (2^64 doesn't fit u64)
        self.hashes = (
            _hashes if _hashes is not None else np.empty(0, dtype=np.uint64)
        )  # sorted ascending, all < theta, distinct
        self.has_null = False

    # -- error model ---------------------------------------------------
    @property
    def rel_std_error(self) -> float:
        """RSE of estimate()/union once the sketch has trimmed;
        0.0 while it is still exact (θ untouched — every hash kept)."""
        if self.theta == _FULL_THETA:
            return 0.0
        return 1.0 / math.sqrt(self.k - 1)

    def error_bound_vs(self, other: "ThetaSketch", z: float = 5.0) -> float:
        """Absolute z-sigma bound for intersect/a_not_b estimates: the
        retained sample lives at the UNION's scale, so the bound is
        z · n_union / √(k−1) (0 when both sketches are still exact)."""
        if self.theta == _FULL_THETA and other.theta == _FULL_THETA:
            return 0.0
        union = ThetaSketch(self.k, _hashes=self.hashes.copy(),
                            _theta=self.theta).merge(other)
        return z * union.estimate() * union.rel_std_error

    # -- build ---------------------------------------------------------
    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        h = h.astype(np.uint64, copy=False)
        if self.theta < _FULL_THETA:
            h = h[h < _U64(self.theta)]
            if h.size == 0:
                return
        self._absorb(h)

    def add_null(self) -> None:
        self.has_null = True

    def _absorb(self, h: np.ndarray) -> None:
        """Union pre-filtered candidate hashes into the retained set,
        trimming to the k smallest and tightening theta."""
        cand = np.union1d(self.hashes, h)  # sorted + distinct
        if cand.size > self.k:
            # (k+1)-th smallest becomes the new exclusive threshold
            self.theta = int(cand[self.k])
            cand = cand[: self.k]
        self.hashes = cand

    # -- merge ---------------------------------------------------------
    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError("cannot merge theta sketches of different k")
        theta = min(self.theta, other.theta)
        mine = self.hashes
        theirs = other.hashes
        if theta < _FULL_THETA:
            t = _U64(theta)
            mine = mine[mine < t]
            theirs = theirs[theirs < t]
        self.theta = theta
        self.hashes = mine
        self._absorb(theirs)
        self.has_null |= other.has_null
        return self

    # -- estimate ------------------------------------------------------
    def _theta_frac(self) -> float:
        return self.theta / float(_FULL_THETA)

    def estimate(self) -> float:
        if self.theta == _FULL_THETA:
            return float(self.hashes.size)  # exact below k distinct
        return self.hashes.size / self._theta_frac()

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    # -- set algebra (final-sketch side) -------------------------------
    def _common_theta_sets(self, other: "ThetaSketch"):
        if other.k != self.k:
            raise ValueError("theta set ops need equal k")
        theta = min(self.theta, other.theta)
        a, b = self.hashes, other.hashes
        if theta < _FULL_THETA:
            t = _U64(theta)
            a = a[a < t]
            b = b[b < t]
        return theta, a, b

    def intersect(self, other: "ThetaSketch") -> float:
        """Estimated |A ∩ B| (exact while both sketches are exact)."""
        theta, a, b = self._common_theta_sets(other)
        n = np.intersect1d(a, b, assume_unique=True).size
        return float(n) if theta == _FULL_THETA else n * float(_FULL_THETA) / theta

    def a_not_b(self, other: "ThetaSketch") -> float:
        """Estimated |A \\ B|."""
        theta, a, b = self._common_theta_sets(other)
        n = np.setdiff1d(a, b, assume_unique=True).size
        return float(n) if theta == _FULL_THETA else n * float(_FULL_THETA) / theta

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        """Non-mutating union (merge copies)."""
        out = ThetaSketch(self.k, _hashes=self.hashes.copy(), _theta=self.theta)
        out.has_null = self.has_null
        return out.merge(other)

    def jaccard(self, other: "ThetaSketch") -> float:
        theta, a, b = self._common_theta_sets(other)
        inter = np.intersect1d(a, b, assume_unique=True).size
        un = a.size + b.size - inter
        return inter / un if un else 0.0

    # -- serialization -------------------------------------------------
    # payload: <I k> <B has_null> <B theta_full> <Q theta_low> then the
    # sorted retained hashes.  theta = 2^64 can't ride a u64, so it is
    # carried as (theta_full=1, theta_low ignored).
    def _payload_bytes(self) -> bytes:
        full = int(self.theta == _FULL_THETA)
        low = 0 if full else self.theta
        head = struct.pack("<IBBQ", self.k, int(self.has_null), full, low)
        return head + self.hashes.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "ThetaSketch":
        k, has_null, full, low = struct.unpack_from("<IBBQ", payload, 0)
        off = struct.calcsize("<IBBQ")
        hashes = np.frombuffer(payload, dtype=np.uint64, offset=off).copy()
        obj = cls(k, _hashes=hashes, _theta=_FULL_THETA if full else low)
        obj.has_null = bool(has_null)
        return obj
