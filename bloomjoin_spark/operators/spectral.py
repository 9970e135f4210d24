"""One-pass distributed spectral analysis of embedding columns via the
Frequent Directions matrix sketch (``sketches/fd.py``).

At 10^12-row scale the exact Gram matrix AᵀA is a d×d reduce of n·d²
flops — computable, but every variant (PCA before IVF training,
per-source embedding-drift monitoring, spectral mass profiling) re-pays
the full pass.  The FD sketch is the mergeable-summary form: each
partition compresses its rows into an ℓ×d matrix, the KB-scale blobs
ride the SAME two-phase harness as every other sketch here (tree merge,
checkpoint resume, grouped variant, sketch store), and the result
certifies its own error: 0 ⪯ AᵀA − BᵀB ⪯ δ·I with δ tracked exactly
(``spectral_error_bound()``), δ ≤ ‖A‖F²/(ℓ−k) by the GLPW bound.

Plan shape (docs/PLANS.md §30): one ``mapInArrow`` scan — the embedding
list column flattens zero-copy to an (n, d) float64 matrix per batch,
no numpy object per row — then the standard blob tree merge.  The only
driver-side state is ℓ×d floats.

No counterpart in the reference (scope = Bloom prefilter); public
algorithm: Liberty KDD'13, Ghashami-Liberty-Phillips-Woodruff SJC'16.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..aggregate import BuildResult, build_sketch, grouped_sketch_estimates
from ..sketches.fd import FrequentDirectionsSketch

__all__ = [
    "fd_sketch",
    "grouped_spectral_mass",
    "spectral_profile",
]


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Infer the embedding dimension from one row (tiny limit-1 job;
    pass ``dim`` explicitly to skip it)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).filter("d > 0").first()
    if row is None:
        raise ValueError(
            f"cannot infer dim: no non-empty vectors in {vec_col!r}"
        )
    return int(row["d"])


def fd_sketch(
    df: DataFrame,
    vec_col: str,
    ell: int = 128,
    dim: int | None = None,
    fanin: int = 64,
    checkpoint_dir: str | None = None,
) -> BuildResult:
    """Build one FrequentDirections sketch over an ``array<float>``
    column, fully distributed (same harness as ``build_sketch``:
    per-partition partials, tree merge, optional checkpointed resume).

    Exactness mode: while the total row count stays under 2ℓ the sketch
    never shrinks and ``gram()`` equals AᵀA exactly — at any scale the
    result carries its own certified spectral error bound."""
    d = dim if dim is not None else _vec_dim(df, vec_col)
    return build_sketch(
        df,
        lambda: FrequentDirectionsSketch(ell, d),
        cols=[vec_col],
        fanin=fanin,
        checkpoint_dir=checkpoint_dir,
    )


def grouped_spectral_mass(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    ell: int = 128,
    dim: int | None = None,
) -> DataFrame:
    """Per-group RETAINED spectral mass (trace of BᵀB) in one pass —
    the embedding-drift monitoring primitive: a source whose spectral
    mass distribution shifts between snapshots changed its embedding
    geometry.  Same contract as ``grouped_sketch_estimates``: one scan,
    blob-only shuffle, no per-group state on the driver.  With ℓ above
    the per-group row count the mass is EXACT (= Σ‖v‖² per group)."""
    d = dim if dim is not None else _vec_dim(df, vec_col)
    return grouped_sketch_estimates(
        df,
        lambda: FrequentDirectionsSketch(ell, d),
        group_col,
        cols=[vec_col],
        extract=lambda s: float(np.trace(s.gram())),
    )


def spectral_profile(result: BuildResult, k: int = 16) -> dict:
    """Driver-side summary of a built FD sketch: top-k singular values²
    of the sketch, cumulative mass fractions, and the certified error
    bound — the input to 'how many PCA components before IVF training'."""
    sk = result.sketch
    sv2, _ = sk.directions(k)
    total = float(sk.fro_sq)
    cum = np.cumsum(sv2) / total if total > 0 else np.zeros_like(sv2)
    return {
        "n_rows": int(sk.n_rows),
        "dim": int(sk.dim),
        "ell": int(sk.ell),
        "fro_sq": total,
        "sv2": [float(v) for v in sv2],
        "cum_mass_frac": [float(v) for v in cum],
        "spectral_error_bound": float(sk.spectral_error_bound()),
        "is_exact": bool(sk.is_exact),
    }
