"""Two-phase distributed sketch aggregation.

Phase 1 (executors): one sketch partial per input partition, built
inside ``mapInPandas`` — Arrow batches in, numpy hashing, zero per-row
Python. Each partial travels as one row ``(partition_id, n_rows,
fingerprint, blob)``.

Phase 2 (tree merge): while more partials remain than ``fanin``, group
them ``pmod(partition_id, ngroups)`` and OR/max/add-merge each group in
``applyInPandas``; final ≤fanin blobs merge on the driver.  This is the
treeAggregate shape — at 100k input partitions the driver never holds
100k blobs (a 1 MiB Bloom partial × 100k = 100 GiB if collected flat).

Lineage / resume: partials can be checkpointed to parquet keyed by
partition id + content fingerprint; a re-run recomputes ONLY missing
partition ids (tasks for done partitions yield without consuming their
input iterator, so the columnar scan for them is never materialized).

Reference analog: ``rcpp_filter_keys`` builds one global filter in one
pass (``/root/reference/src/BloomFilter.cpp:85-165``); merge-order
invariance of our partials is what guarantees the same global sketch.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import NULL_SENTINEL, hash_columns, hash_tokens_flat
from .sketches.base import Sketch

PARTIAL_SCHEMA = (
    "partition_id long, n_partials long, n_rows long, fingerprint long, blob binary"
)


@dataclass
class BuildResult:
    sketch: Sketch
    n_partitions: int
    n_rows: int
    merge_rounds: int


def _extract_hashes(pdf: pd.DataFrame, cols, token_col, prehashed) -> np.ndarray:
    if prehashed:
        # single int64 column already hashed JVM-side (xxhash64)
        return pdf[cols[0]].to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
    if token_col is not None:
        return hash_tokens_flat(pdf[token_col])
    return hash_columns(pdf, list(cols))


def _extract_values(pdf: pd.DataFrame, cols, token_col) -> np.ndarray:
    """float64 value array for quantile sketches (NaN = null)."""
    if token_col is not None:
        chunks = [
            np.asarray(t, dtype=np.float64)
            for t in pdf[token_col]
            if t is not None and len(t)
        ]
        return np.concatenate(chunks) if chunks else np.empty(0, dtype=np.float64)
    return pdf[cols[0]].to_numpy(dtype=np.float64, na_value=np.nan)


def make_partial_fn(
    factory: Callable[[], Sketch],
    cols: list[str] | None = None,
    token_col: str | None = None,
    prehashed: bool = False,
    done_ids: frozenset[int] = frozenset(),
    drop_nulls: bool = True,
):
    """Build the mapInPandas function producing one partial row per
    partition. Top-level so cloudpickle ships only small state."""

    def partial_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        if pid in done_ids:
            # resume fast-path: yield nothing, never consume the scan
            return
        sk = factory()
        consumes = getattr(sk, "CONSUMES", "hashes")
        n = 0
        fp = np.uint64(0)
        for pdf in it:
            if len(pdf) == 0:
                continue
            if consumes == "values":
                v = _extract_values(pdf, cols, token_col)
                nan_mask = np.isnan(v)
                if nan_mask.any():
                    if hasattr(sk, "add_null"):
                        sk.add_null()
                    v = v[~nan_mask]
                with np.errstate(over="ignore"):
                    fp += v.view(np.uint64).sum(dtype=np.uint64)
                sk.update_values(v)
                n += len(pdf)
                continue
            h = _extract_hashes(pdf, cols, token_col, prehashed)
            if drop_nulls and not prehashed:
                null_mask = h == NULL_SENTINEL
                if null_mask.any():
                    if hasattr(sk, "add_null"):
                        sk.add_null()
                    h = h[~null_mask]
            with np.errstate(over="ignore"):
                fp += h.sum(dtype=np.uint64)
            # pre-aggregate the batch: one shared sort replaces the
            # unbuffered per-element scatter inside the sketch — on
            # zipf-ish token streams uniques ≪ raw count (vocab-bound)
            if getattr(sk, "SET_SEMANTICS", False):
                sk.update_hashes(np.unique(h))
            elif getattr(sk, "SUPPORTS_WEIGHTS", False):
                hu, hc = np.unique(h, return_counts=True)
                sk.update_hashes(hu, weights=hc)
            else:
                sk.update_hashes(h)
            n += len(pdf)
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "n_partials": [1],
                "n_rows": [n],
                "fingerprint": [np.int64(fp.astype(np.int64))],
                "blob": [sk.to_bytes()],
            }
        )

    return partial_fn


def _merge_group_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas: merge every partial blob in one tree-merge group."""
    acc: Sketch | None = None
    with np.errstate(over="ignore"):
        fp = np.uint64(0)
        for b, f in zip(pdf["blob"], pdf["fingerprint"]):
            s = Sketch.from_bytes(bytes(b))
            acc = s if acc is None else acc.merge(s)
            fp += np.uint64(np.int64(f).astype(np.uint64))
    return pd.DataFrame(
        {
            "partition_id": [int(pdf["partition_id"].min())],
            "n_partials": [int(pdf["n_partials"].sum())],
            "n_rows": [int(pdf["n_rows"].sum())],
            "fingerprint": [np.int64(fp.astype(np.int64))],
            "blob": [acc.to_bytes()],
        }
    )


def sketch_partials(
    df: DataFrame,
    factory: Callable[[], Sketch],
    cols: list[str] | str | None = None,
    token_col: str | None = None,
    prehashed: bool = False,
    done_ids: frozenset[int] = frozenset(),
) -> DataFrame:
    """Phase 1: DataFrame of one partial row per input partition.

    Projects to only the key/token columns first so the parquet scan
    stays pruned (check ``ReadSchema`` in .explain)."""
    if isinstance(cols, str):
        cols = [cols]
    keep = list(cols) if cols else [token_col]
    fn = make_partial_fn(factory, cols, token_col, prehashed, done_ids)
    return df.select(*keep).mapInPandas(fn, schema=PARTIAL_SCHEMA)


def tree_merge(partials: DataFrame, fanin: int = 64) -> tuple[Sketch, int, int, int]:
    """Phase 2. Returns (sketch, n_partitions, n_rows, rounds).

    The round count is planned from PARTITION METADATA (one partial row
    per input partition), not a count() action — the whole merge tree
    plus the final collect executes as ONE Spark job, so the input is
    scanned exactly once and no persist of the partials is needed.
    Exact partial accounting rides in the ``n_partials`` column."""
    n_parts = max(1, partials.rdd.getNumPartitions())  # metadata, no job
    cur = partials
    rounds = 0
    while n_parts > fanin:
        ngroups = math.ceil(n_parts / fanin)
        cur = (
            cur.withColumn("g", F.pmod(F.col("partition_id"), F.lit(ngroups)))
            .groupBy("g")
            .applyInPandas(_merge_group_fn, schema=PARTIAL_SCHEMA)
        )
        # localCheckpoint would cut lineage on long chains; rounds are few
        n_parts = ngroups
        rounds += 1
    rows = cur.collect()
    if not rows:
        raise ValueError("no partials produced (empty input with 0 partitions?)")
    acc: Sketch | None = None
    n_rows = 0
    orig_parts = 0
    for r in rows:
        s = Sketch.from_bytes(bytes(r["blob"]))
        acc = s if acc is None else acc.merge(s)
        n_rows += r["n_rows"]
        orig_parts += r["n_partials"]
    return acc, orig_parts, n_rows, rounds


def build_sketch(
    df: DataFrame,
    factory: Callable[[], Sketch],
    cols: list[str] | str | None = None,
    token_col: str | None = None,
    prehashed: bool = False,
    fanin: int = 64,
    checkpoint_dir: str | None = None,
) -> BuildResult:
    """One-call build: partials → (checkpoint) → tree merge → Sketch.

    With ``checkpoint_dir``, partials are persisted per partition id and
    a killed job resumes by recomputing only missing ids (north rule:
    per-partition sketch lineage + checkpointed resumability).
    """
    done_ids: frozenset[int] = frozenset()
    spark = df.sparkSession
    existing: DataFrame | None = None
    if checkpoint_dir and _checkpoint_exists(spark, checkpoint_dir):
        existing = spark.read.parquet(checkpoint_dir)
        done_ids = frozenset(
            r["partition_id"] for r in existing.select("partition_id").distinct().collect()
        )
    partials = sketch_partials(df, factory, cols, token_col, prehashed, done_ids)
    if checkpoint_dir:
        if done_ids:
            partials.write.mode("append").parquet(checkpoint_dir)
        else:
            partials.write.mode("overwrite").parquet(checkpoint_dir)
        partials = spark.read.parquet(checkpoint_dir).dropDuplicates(["partition_id"])
    sketch, n_parts, n_rows, rounds = tree_merge(partials, fanin)
    return BuildResult(sketch=sketch, n_partitions=n_parts, n_rows=n_rows, merge_rounds=rounds)


def _checkpoint_exists(spark: SparkSession, path: str) -> bool:
    if path.startswith("file:"):
        path = path[len("file:") :]
    if "://" not in path:
        return os.path.exists(path) and bool(os.listdir(path))
    try:
        spark.read.parquet(path).limit(1).collect()
        return True
    except Exception:
        return False
