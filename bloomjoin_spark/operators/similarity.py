"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the baseline. The scoring
  expression is pure JVM (``zip_with`` + ``aggregate``), the query set
  is broadcast, and ranking is a window per query id. At scale this is
  one scan of the corpus per query batch — no shuffle of vectors except
  the final top-k-per-query exchange (k rows per partition after the
  partial window).
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH: 64 sign
  bits per vector (one vectorized matmul per Arrow batch), banded into
  bucket keys; candidates come from bucket equi-joins (shuffles only
  (band, bucket, id)), then exact cosine re-ranks candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PLANE_SEED = 0x7F4A7C159E3779B9


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_sim_col(a, b):
    """Exact cosine similarity between two array<float/double> columns
    (JVM-side; 0.0 when either norm is 0)."""
    dot = _dot(a, b)
    na = F.sqrt(_dot(a, a))
    nb = F.sqrt(_dot(b, b))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force top-k: (query_id, vec_id, sim, rank).
    ``queries`` must have (query_id, embedding); it is broadcast.
    Deterministic tie-break: (sim desc, vec_id asc). Self-matches
    (same id) are not excluded — filter upstream if undesired."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
    )
    scored = corpus.select(id_col, vec_col).crossJoin(q).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        F.round(
            cosine_sim_col(
                F.col(vec_col).cast("array<double>"),
                F.col("__qvec").cast("array<double>"),
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _planes(dim: int, nbits: int) -> np.ndarray:
    """Deterministic gaussian hyperplanes via counter-based Box-Muller."""
    from ..hashing import splitmix64

    n = dim * nbits
    c = np.arange(2 * n, dtype=np.uint64)
    u = splitmix64(c ^ np.uint64(_PLANE_SEED)).astype(np.float64) / 2.0**64
    u1 = np.clip(u[:n], 1e-12, 1.0)
    u2 = u[n:]
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return g.reshape(dim, nbits)


def add_lsh_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    nbits: int = 64,
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Pack sign(V·P) into one int64 per row — one numpy matmul per
    Arrow batch, planes generated deterministically per process."""

    def sig(it):
        planes = None
        powers = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))
        for pdf in it:
            vecs = pdf[vec_col]
            n = len(pdf)
            out = np.zeros(n, dtype=np.int64)
            ok = vecs.map(lambda v: v is not None and len(v) > 0).to_numpy(dtype=bool)
            if ok.any():
                V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[ok]])
                if planes is None:
                    planes = _planes(V.shape[1], nbits)
                bits = (V @ planes) > 0
                out[ok] = (bits.astype(np.uint64) * powers[None, :]).sum(
                    axis=1, dtype=np.uint64
                ).view(np.int64)
            res = pdf.copy()
            res[out_col] = out
            yield res

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} bigint"
    return df.mapInPandas(sig, schema=schema)


def _band_structs(sig_col: str, bands: int, width: int, mask: int):
    """array of (band, bucket) structs; shifts are plain-int so the
    whole expression stays codegen-friendly."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(sig_col), i * width)
                .bitwiseAND(F.lit(mask).cast("bigint"))
                .alias("bucket"),
            )
            for i in range(bands)
        ]
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nbits: int = 64,
    bands: int = 8,
) -> DataFrame:
    """Approximate top-k: LSH-bucket candidates (≥1 identical band),
    exact cosine re-rank. Recall grows with ``bands``."""
    width = nbits // bands
    mask = (1 << width) - 1

    def banded(df, idc, vcol, sig_col):
        sig = add_lsh_signature(df.select(idc, vcol), vec_col=vcol, nbits=nbits,
                                out_col=sig_col)
        exploded = sig.select(
            idc,
            vcol,
            F.explode(_band_structs(sig_col, bands, width, mask)).alias("bb"),
        ).select(idc, vcol, "bb.band", "bb.bucket")
        return exploded

    c = banded(corpus, id_col, vec_col, "__csig")
    qq = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    q = banded(qq, "__qid", "__qvec", "__qsig")
    cand = (
        c.join(F.broadcast(q), on=["band", "bucket"])
        .select("__qid", id_col, vec_col, "__qvec")
        .dropDuplicates(["__qid", id_col])
    )
    scored = cand.select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        F.round(
            cosine_sim_col(
                F.col(vec_col).cast("array<double>"),
                F.col("__qvec").cast("array<double>"),
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 64,
    bands: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH candidates → exact cosine ≥
    threshold. (id_a < id_b, sim)."""
    width = nbits // bands
    mask = (1 << width) - 1
    sig = add_lsh_signature(df.select(id_col, vec_col), vec_col, nbits, "__sig")
    exploded = sig.select(
        id_col,
        vec_col,
        F.explode(_band_structs("__sig", bands, width, mask)).alias("bb"),
    ).select(id_col, vec_col, "bb.band", "bb.bucket")
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.round(
            cosine_sim_col(
                F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")
            ),
            6,
        ).alias("sim"),
    ).filter(F.col("sim") >= threshold)
