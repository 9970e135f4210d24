"""Frequent Directions matrix sketch (Liberty, "Simple and
deterministic matrix sketching", KDD 2013; Ghashami, Liberty, Phillips
& Woodruff, SIAM J. Comput. 2016 — including the mergeability proof).

The eighth sketch of the suite, and the first MATRIX-valued one: a
deterministic low-rank summary of a tall n×d matrix (n embedding rows,
d ≤ a few hundred dims) in O(ℓ·d) memory.  ``B`` is an ℓ×d matrix such
that, after any stream of row batches and any merge tree,

    0  ⪯  AᵀA − BᵀB  ⪯  δ·I        (PSD ordering)

where ``δ = shrink_mass`` is tracked exactly and is itself bounded by
``‖A‖F² / (ℓ − k)`` after removing the best rank-k part (the GLPW
guarantee, ``k < ℓ``).  That makes one-pass distributed PCA / spectral
mass profiling possible at 10^12-row scale: each partition sketches its
rows, the KB-scale blobs merge associatively through the same two-phase
harness as Bloom/HLL/CMS (``CONSUMES = "vectors"`` lane), and the
principal directions come from one final ℓ×d SVD on the driver.

Exactness mode mirrors the other sketches: while fewer than 2ℓ distinct
rows have been absorbed the buffer never shrinks, so ``BᵀB == AᵀA``
exactly (shrink_mass 0) — the mode the oracle row pins.

Merge = row concatenation + one shrink cycle; shrink masses add, so the
error bound composes across any merge ordering (SJC'16 Thm 3.1 — the
same mergeable-summaries contract every other sketch here satisfies).

No counterpart in the reference (its scope is the Bloom prefilter);
this extends the suite for the training-pipeline profile (embedding
drift, spectral mass per source, one-pass PCA before IVF training).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch


class FrequentDirectionsSketch(Sketch):
    KIND = b"FDS1"
    CONSUMES = "vectors"

    def __init__(self, ell: int, dim: int):
        if ell < 2:
            raise ValueError(f"ell must be >= 2, got {ell}")
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        self.ell = int(ell)
        self.dim = int(dim)
        self.n_rows = 0
        #: exact ‖A‖F² of everything absorbed (float64 running sum)
        self.fro_sq = 0.0
        #: exact cumulative shrink mass δ: ‖AᵀA − BᵀB‖₂ ≤ δ
        self.shrink_mass = 0.0
        # buffer holds up to 2ℓ rows; shrink compresses back to ℓ
        self._buf = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
        self._n_buf = 0

    # -- build ---------------------------------------------------------
    def update_matrix(self, m: np.ndarray) -> None:
        """Absorb a batch of rows (2-D float array, shape (n, dim)).
        Non-finite rows are rejected (they would poison the SVD)."""
        if m.ndim != 2 or m.shape[1] != self.dim:
            raise ValueError(
                f"expected shape (n, {self.dim}), got {m.shape}"
            )
        if m.shape[0] == 0:
            return
        m = np.ascontiguousarray(m, dtype=np.float64)
        if not np.isfinite(m).all():
            raise ValueError(
                "FrequentDirectionsSketch rows must be finite (got "
                "NaN/inf); filter or impute upstream"
            )
        self.fro_sq += float((m * m).sum())
        self.n_rows += int(m.shape[0])
        self._absorb_rows(m)

    def _absorb_rows(self, rows: np.ndarray) -> None:
        """Fill the buffer chunk-by-chunk, shrinking whenever it reaches
        2ℓ rows — the one buffering loop both ``update_matrix`` and
        ``merge`` go through (a shrink-trigger change cannot diverge
        between build and merge paths)."""
        pos = 0
        while pos < rows.shape[0]:
            take = min(2 * self.ell - self._n_buf, rows.shape[0] - pos)
            self._buf[self._n_buf : self._n_buf + take] = rows[pos : pos + take]
            self._n_buf += take
            pos += take
            if self._n_buf >= 2 * self.ell:
                self._shrink()

    def _shrink(self) -> None:
        """One FD shrink cycle (called when the buffer reaches 2ℓ rows):
        SVD the buffer; if its rank fits in ℓ−1 rows the factorization
        is kept EXACTLY (δ = 0 — happens whenever dim < ℓ); otherwise
        subtract δ = σ_ℓ² from every retained direction
        (soft-threshold) and keep the ≤ ℓ−1 surviving rows.
        ``shrink_mass`` accumulates δ as the spectral-error
        certificate: ‖AᵀA − BᵀB‖₂ ≤ Σδ after any stream/merge order."""
        _, s, vt = np.linalg.svd(self._buf[: self._n_buf], full_matrices=False)
        if s.size < self.ell:
            # rank < ℓ (e.g. dim < ℓ): exact re-compression, no error
            self._buf[:] = 0.0
            self._buf[: s.size] = s[:, None] * vt
            self._n_buf = int(s.size)
            return
        delta = float(s[self.ell - 1] ** 2)
        keep = self.ell - 1
        s_shrunk = np.sqrt(np.maximum(s[:keep] ** 2 - delta, 0.0))
        self._buf[:] = 0.0
        self._buf[:keep] = s_shrunk[:, None] * vt[:keep]
        self._n_buf = keep
        self.shrink_mass += delta

    # -- query ---------------------------------------------------------
    def gram(self) -> np.ndarray:
        """BᵀB — the d×d Gram estimate.  AᵀA − BᵀB is PSD with spectral
        norm ≤ ``shrink_mass``."""
        b = self._buf[: self._n_buf]
        return b.T @ b

    def directions(self, k: int | None = None):
        """Top-k (singular_value², right-singular-vector rows) of the
        sketch — the estimated principal directions.  One ℓ×d SVD."""
        _, s, vt = np.linalg.svd(self._buf[: self._n_buf], full_matrices=False)
        k = min(k if k is not None else self.ell, s.size)
        return s[:k] ** 2, vt[:k]

    def spectral_error_bound(self) -> float:
        """Certified upper bound on ‖AᵀA − BᵀB‖₂ (exact running δ)."""
        return self.shrink_mass

    @property
    def is_exact(self) -> bool:
        """True while no shrink has happened: BᵀB == AᵀA exactly."""
        return self.shrink_mass == 0.0

    # -- merge ---------------------------------------------------------
    def merge(self, other: "FrequentDirectionsSketch") -> "FrequentDirectionsSketch":
        if other.ell != self.ell or other.dim != self.dim:
            raise ValueError(
                "cannot merge FrequentDirectionsSketch with different "
                f"(ell, dim): ({self.ell},{self.dim}) vs "
                f"({other.ell},{other.dim})"
            )
        self.fro_sq += other.fro_sq
        self.n_rows += other.n_rows
        self.shrink_mass += other.shrink_mass
        # copy: other's buffer must not alias ours during the fill loop
        self._absorb_rows(other._buf[: other._n_buf].copy())
        return self

    # -- serialization -------------------------------------------------
    def _payload_bytes(self) -> bytes:
        head = struct.pack(
            "<IIqddI",
            self.ell,
            self.dim,
            self.n_rows,
            self.fro_sq,
            self.shrink_mass,
            self._n_buf,
        )
        return head + self._buf[: self._n_buf].tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "FrequentDirectionsSketch":
        ell, dim, n_rows, fro_sq, shrink_mass, n_buf = struct.unpack_from(
            "<IIqddI", payload, 0
        )
        off = struct.calcsize("<IIqddI")
        obj = cls(ell, dim)
        obj.n_rows = n_rows
        obj.fro_sq = fro_sq
        obj.shrink_mass = shrink_mass
        obj._n_buf = n_buf
        rows = np.frombuffer(payload, dtype=np.float64, offset=off).reshape(
            n_buf, dim
        )
        obj._buf[:n_buf] = rows
        return obj
