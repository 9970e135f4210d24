"""Deduplication for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Scale shape (100 TB): everything is expressed as DataFrame ops whose
shuffles are on *short keys* (hashes/buckets), never on document text:

- exact: groupBy(md5(text)) — one shuffle of 16-byte keys;
- MinHash/LSH: signatures via one vectorized pandas UDF (flat numpy
  ``minimum.reduceat`` over Arrow batches), then shingle→band→bucket
  explode + groupBy bucket — candidate generation never compares
  documents pairwise;
- verification: exact Jaccard via JVM ``array_intersect``/``array_union``
  on shingle-hash arrays (no Python);
- duplicate clusters: iterative min-label propagation (small-diameter
  dup clusters converge in 2-3 joins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..hashing import splitmix64

_U64 = np.uint64
_PERM_SEED = 0x3C6EF372FE94F82A


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per exact content (md5 of lower/trim), choosing the
    smallest id — deterministic, portable to the SQL oracle."""
    fp = F.md5(F.lower(F.trim(F.col(text_col)))).alias("__fp")
    keep = (
        df.select(fp, F.col(id_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# shingling (all JVM-side)
# ---------------------------------------------------------------------------

def with_shingle_hashes(
    df: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "shingles"
) -> DataFrame:
    """Distinct xxhash64 values of word n-grams — the Jaccard domain.
    Pure JVM higher-order functions; short docs (<n words) fall back to
    the whole text as one shingle."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ngrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
    )
    shingles = F.when(F.size(toks) >= n, ngrams).otherwise(
        F.array(F.xxhash64(F.lower(F.trim(F.col(text_col)))))
    )
    return df.withColumn(out_col, F.array_distinct(shingles))


def jaccard_col(a, b):
    """Exact Jaccard between two shingle-hash arrays (JVM)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------

def add_minhash_signature(
    df: DataFrame,
    shingle_col: str = "shingles",
    num_perm: int = 128,
    out_col: str = "minhash",
) -> DataFrame:
    """num_perm minhash values per row. One vectorized pass per Arrow
    batch: flatten all shingle arrays, per permutation apply splitmix64
    with a distinct seed and ``np.minimum.reduceat`` over row offsets."""
    seeds = splitmix64(
        np.arange(1, num_perm + 1, dtype=np.uint64) * _U64(_PERM_SEED)
    )

    def sig(it):
        for pdf in it:
            col = pdf[shingle_col]
            lens = np.array([len(s) if s is not None else 0 for s in col], dtype=np.int64)
            out = np.full((len(pdf), num_perm), np.iinfo(np.int64).max, dtype=np.int64)
            nz = lens > 0
            if nz.any():
                flat = np.concatenate(
                    [np.asarray(s, dtype=np.int64) for s in col[nz]]
                ).view(np.uint64)
                offsets = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
                mins = np.empty((num_perm, offsets.size), dtype=np.uint64)
                for j in range(num_perm):
                    hp = splitmix64(flat ^ seeds[j])
                    mins[j] = np.minimum.reduceat(hp, offsets)
                # store as int64 (same bits) for Spark's long type
                out[nz] = mins.T.view(np.int64)
            res = pdf.drop(columns=[shingle_col]).copy()
            res[out_col] = list(out)
            yield res

    out_schema = ", ".join(
        f"{name} {dtype}"
        for name, dtype in _schema_without(df, shingle_col)
    ) + f", {out_col} array<bigint>"
    return df.mapInPandas(sig, schema=out_schema)


def _schema_without(df: DataFrame, drop: str):
    for f in df.schema.fields:
        if f.name != drop:
            yield f.name, f.dataType.simpleString()


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from LSH banding: two docs
    collide iff some band of their signatures is identical. Shuffles
    only (band, bucket_hash, id) triples."""
    num_perm_col = F.size(F.col(sig_col))
    rows_per_band = F.floor(num_perm_col / bands).cast("int")
    banded = sig_df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col(sig_col),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col(f"a.band") == F.col("b.band"),
                F.col(f"a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 128,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup pairs with exact-Jaccard verification:
    (id_a, id_b, jaccard) where jaccard ≥ threshold.

    The shingle table feeds three consumers (signatures + both sides of
    the verification join) — persist it so shingling runs once."""
    sh = with_shingle_hashes(df, text_col, n).select(id_col, "shingles").persist()
    sigs = add_minhash_signature(sh.select(id_col, "shingles"), "shingles", num_perm)
    cand = lsh_candidate_pairs(sigs, id_col, "minhash", bands)
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard_col(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def dedup_clusters(pairs: DataFrame, id_col_a: str = "id_a", id_col_b: str = "id_b",
                   max_iter: int = 10) -> DataFrame:
    """Connected components over dup pairs via min-label propagation:
    (id, cluster_id=min id in component). Dup clusters have tiny
    diameter, so this converges in 2-3 iterations."""
    edges = pairs.select(
        F.col(id_col_a).alias("src"), F.col(id_col_b).alias("dst")
    )
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        sym.select("src").union(sym.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("label"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels.persist()
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Full near-dup dedup: keep the min-id representative per cluster."""
    pairs = minhash_dedup_pairs(df, text_col, id_col, **kw)
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def add_simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """64-bit SimHash over word hashes (vectorized: bit-unpack token
    hashes per Arrow batch, signed-sum per row via reduceat)."""

    def sim(it):
        for pdf in it:
            texts = pdf[text_col].fillna("")
            toks = texts.str.lower().str.strip().str.split(r"\s+", regex=True)
            lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
            out = np.zeros(len(pdf), dtype=np.int64)
            nz = lens > 0
            if nz.any():
                flat_tokens = np.concatenate([np.asarray(t, dtype=object) for t in toks[nz]])
                h = pd.util.hash_array(flat_tokens.astype(object), categorize=False)
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & _U64(1)).astype(
                    np.int64
                ) * 2 - 1  # ±1 per bit
                offsets = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
                sums = np.add.reduceat(bits, offsets, axis=0)
                packed = (sums > 0).astype(np.uint64)
                vals = np.zeros(packed.shape[0], dtype=np.uint64)
                for j in range(64):
                    vals |= packed[:, j] << _U64(j)
                out[nz] = vals.view(np.int64)
            res = pdf.copy()
            res[out_col] = out
            yield res

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} bigint"
    return df.mapInPandas(sim, schema=schema)


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", sim_col: str = "simhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Banding: with
    4 16-bit bands, ≤3 flipped bits leave ≥1 band identical (pigeonhole),
    so candidate generation is an equi-join on (band, 16-bit chunk)."""
    bands = max_hamming + 1
    width = 64 // bands
    chunks = [
        F.shiftrightunsigned(F.col(sim_col), i * width)
        .bitwiseAND(F.lit((1 << width) - 1).cast("bigint"))
        .alias(f"c{i}")
        for i in range(bands)
    ]
    base = df.select(F.col(id_col), F.col(sim_col), *chunks)
    pairs = None
    for i in range(bands):
        a, b = base.alias("a"), base.alias("b")
        p = a.join(
            b,
            on=[
                F.col(f"a.c{i}") == F.col(f"b.c{i}"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{sim_col}").alias("sh_a"),
            F.col(f"b.{sim_col}").alias("sh_b"),
        )
        pairs = p if pairs is None else pairs.union(p)
    pairs = pairs.distinct()
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
