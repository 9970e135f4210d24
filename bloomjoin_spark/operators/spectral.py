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
    "pca_project",
    "spectral_drift",
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


def pca_project(
    df: DataFrame,
    vec_col: str,
    sketch: FrequentDirectionsSketch | BuildResult,
    k: int,
    out_col: str = "pca",
) -> DataFrame:
    """Project an ``array<float>`` column onto the top-``k`` principal
    directions of a built FD sketch — the dimensionality-reduction step
    before IVF/PQ training, as ONE ``mapInArrow`` stage: the vector
    column flattens zero-copy to an (n, d) matrix, one BLAS matmul with
    the k×d direction matrix (closure-shipped — k·d floats, KBs), and
    the (n, k) result re-wraps as a list column.  No shuffle, no
    per-row Python; NULL vectors project to NULL.

    The sketch certifies the projection quality: the captured spectral
    mass of the top-k directions is within ``spectral_error_bound()``
    of the true top-k mass (FD's PSD sandwich), so 'how much variance
    k components keep' is answerable without an exact pass."""
    import pyarrow as pa

    sk = sketch.sketch if isinstance(sketch, BuildResult) else sketch
    _, vt = sk.directions(k)
    if vt.shape[0] < k:
        raise ValueError(
            f"sketch holds only {vt.shape[0]} directions, asked for {k}"
        )
    v = np.ascontiguousarray(vt, dtype=np.float64)  # (k, d)
    dim = sk.dim
    in_cols = df.columns
    if out_col in in_cols:
        raise ValueError(f"output column {out_col!r} already exists")
    vec_idx = in_cols.index(vec_col)
    out_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    out_schema = f"{out_fields}, `{out_col}` array<double>"

    def project(it):
        for batch in it:
            col = batch.column(vec_idx)
            lens = pa.compute.list_value_length(col).fill_null(-1).to_numpy(
                zero_copy_only=False
            )
            valid = pa.compute.is_valid(col).to_numpy(zero_copy_only=False)
            mask_np = valid & (lens == dim)
            bad = valid & ~mask_np
            if bad.any():
                raise ValueError(
                    f"vector column rows must have length {dim} "
                    "(found a non-null row of different length)"
                )
            # project only the valid rows; re-expand with nulls after
            flat = col.drop_null().flatten().to_numpy(zero_copy_only=False)
            m = flat.astype(np.float64, copy=False).reshape(-1, dim)
            proj = m @ v.T  # (n_valid, k)
            n = len(col)
            offsets = np.zeros(n + 1, dtype=np.int32)
            offsets[1:] = np.cumsum(np.where(mask_np, k, 0)).astype(np.int32)
            out = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(proj.reshape(-1), pa.float64()),
                mask=pa.array(~mask_np),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [out],
                names=list(batch.schema.names) + [out_col],
            )

    return df.mapInArrow(project, schema=out_schema)


def spectral_drift(
    a: FrequentDirectionsSketch | BuildResult,
    b: FrequentDirectionsSketch | BuildResult,
) -> dict:
    """Certified drift between two embedding populations from their FD
    sketches alone (two snapshots, two sources, train vs incoming):
    the measured distance is ``d = ‖Ga/na − Gb/nb‖₂`` on the per-row
    normalized Gram estimates, and because each sketch certifies
    ``0 ⪯ AᵀA − BᵀB ⪯ δ·I``, the TRUE normalized Gram distance lies in
    ``[max(0, d − c), d + c]`` with certificate ``c = δa/na + δb/nb``
    (triangle inequality) — a drift alarm that can be trusted without
    any exact pass over either population.  Driver-side only: inputs
    are two ℓ×d states."""
    sa = a.sketch if isinstance(a, BuildResult) else a
    sb = b.sketch if isinstance(b, BuildResult) else b
    if sa.dim != sb.dim:
        raise ValueError(
            f"cannot compare sketches of different dim: {sa.dim} vs {sb.dim}"
        )
    if sa.n_rows == 0 or sb.n_rows == 0:
        raise ValueError("both sketches must have ingested rows")
    ga = sa.gram() / sa.n_rows
    gb = sb.gram() / sb.n_rows
    d = float(np.abs(np.linalg.eigvalsh(ga - gb)).max())
    cert = float(
        sa.spectral_error_bound() / sa.n_rows
        + sb.spectral_error_bound() / sb.n_rows
    )
    return {
        "spectral_distance": d,
        "certificate": cert,
        "true_distance_lower": max(0.0, d - cert),
        "true_distance_upper": d + cert,
        "n_rows_a": int(sa.n_rows),
        "n_rows_b": int(sb.n_rows),
    }


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
