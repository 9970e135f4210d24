"""Thin user-facing wrappers over the two-phase sketch harness —
the ``approx_*`` verbs a reference user reaches for first."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..aggregate import build_sketch
from ..hashing import hash_series
from ..sketches import CmsSketch, HllSketch, KllSketch, TDigestSketch


def approx_distinct(
    df: DataFrame,
    cols: list[str] | str,
    p: int = 14,
    token_col: str | None = None,
    **kw,
) -> int:
    """HLL distinct count of a key (or of all token ids when
    ``token_col`` is given). Error ≈ 1.04/√2^p."""
    res = build_sketch(
        df,
        lambda: HllSketch(p=p),
        cols=None if token_col else cols,
        token_col=token_col,
        **kw,
    )
    return res.sketch.cardinality()


def approx_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    method: str = "tdigest",
    token_col: str | None = None,
    **kw,
) -> list[float]:
    """t-digest (tail-accurate) or KLL (worst-case bound) quantiles."""
    if method not in ("tdigest", "kll"):
        raise ValueError("method must be 'tdigest' or 'kll'")
    compression = kw.pop("compression", 200.0)
    k = kw.pop("k", 200)
    factory = (
        (lambda: TDigestSketch(compression))
        if method == "tdigest"
        else (lambda: KllSketch(k))
    )
    res = build_sketch(
        df, factory, cols=None if token_col else [col], token_col=token_col, **kw
    )
    return [float(v) for v in np.atleast_1d(res.sketch.quantile(qs))]


def token_frequencies(
    df: DataFrame,
    keys,
    cols: list[str] | str | None = None,
    token_col: str | None = None,
    eps: float = 1e-4,
    delta: float = 1e-3,
    **kw,
) -> dict:
    """CMS point-frequency estimates for ``keys`` (est ≥ true,
    ≤ true + εN w.p. 1−δ). Returns {key: estimate}."""
    res = build_sketch(
        df, lambda: CmsSketch(eps, delta), cols=cols, token_col=token_col, **kw
    )
    s = pd.Series(keys)
    est = res.sketch.query_hashes(hash_series(s))
    return dict(zip(list(keys), [int(e) for e in est]))
