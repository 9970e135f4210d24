"""Benchmark decontamination: flag / drop training documents that share
any token n-gram with an evaluation ("benchmark") set.

This is the bloomjoin prefilter thesis (reference ``R/bloomjoin.R`` —
filter-before-shuffle semi-join on high-selectivity keys) applied to
the n-gram membership problem used by LLM training pipelines (GPT-3
appendix C / PaLM-style 8-gram overlap decontamination):

1. the benchmark side's distinct n-grams are small — build a Bloom
   filter over their 64-bit hashes (one treeAggregate / one JVM
   ``stat.bloomFilter`` job, never collected as raw n-grams);
2. the corpus side explodes to (doc_id, n-gram) pairs *inside the scan
   stage* (whole-stage codegen: ``sequence`` + ``transform`` +
   ``slice`` + ``explode`` — no Python, nothing materialized) and the
   Bloom probe drops ~all pairs before anything shuffles;
3. survivors are verified EXACTLY with a join on n-gram equality, so
   the output has no false positives — the Bloom fpr only costs wasted
   verify work, never wrong answers (same contract as ``bloom_join``).

At 100 TB the explode amplification (one row per token position) is
pipelined, not stored; what matters is what crosses the wire, and that
is only the ≈fpp-sized candidate set.  When the benchmark n-gram set
fits under the broadcast threshold Spark turns the verify join into a
broadcast hash join and the whole pipeline is a single scan stage; when
it does not (a large eval suite), the Bloom prefilter is exactly what
keeps the shuffle proportional to true contamination instead of to
corpus size.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..aggregate import build_sketch
from ..sketches.bloom import BloomSketch
from .bloom_join import (
    _NATIVE_FILTER_CAP_BYTES,
    _make_probe_udf,
    _native_build_filter,
    _native_might_contain,
)

_NG = "__bj_ng"
_H = "__bj_ngh"

__all__ = [
    "ngrams_col",
    "words_col",
    "contaminated_docs",
    "decontaminate",
    "DecontamReport",
]


def ngrams_col(arr: Column, n: int) -> Column:
    """All contiguous ``n``-grams of an array column, as
    ``array<array<T>>`` — pure JVM higher-order functions
    (``sequence`` → ``transform`` → ``slice``), inside whole-stage
    codegen.  Documents shorter than ``n`` yield an empty array; a NULL
    input yields an empty array."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # sequence end is clamped to >= 1 so short docs don't build a
    # descending sequence; the size filter then drops the partial slice
    idx = F.sequence(F.lit(1), F.greatest(F.size(arr) - F.lit(n - 1), F.lit(1)))
    return F.filter(
        F.transform(idx, lambda i: F.slice(arr, i, n)),
        lambda g: F.size(g) == n,
    )


def words_col(text: Column) -> Column:
    """Whitespace word array of a text column (empty for blank text) —
    the word-level tokenization the DuckDB oracle mirrors with
    ``string_split_regex(trim(text), '\\s+')``."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


@dataclass
class DecontamReport:
    """What the decontamination pass decided and measured."""

    n: int = 0
    engine: str = ""
    n_bench_ngrams: int = 0
    filter_bits: int = 0
    notes: list[str] = field(default_factory=list)


def _resolve_col(df: DataFrame, col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def contaminated_docs(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    corpus_tokens: Column | str = "tokens",
    bench_tokens: Column | str | None = None,
    id_col: str = "doc_id",
    fpp: float = 0.01,
    engine: str = "auto",
    return_report: bool = False,
):
    """Docs of ``corpus`` sharing ≥1 token ``n``-gram with ``bench``.

    Returns a DataFrame ``(id_col, n_hits)`` where ``n_hits`` is the
    number of DISTINCT benchmark n-grams found in the document —
    EXACT output (Bloom false positives are removed by the verify
    join), deterministic, no sampling.

    ``corpus_tokens`` / ``bench_tokens`` may be a column name or an
    arbitrary Column expression producing an array (e.g.
    ``words_col(F.col("text"))`` for word-level n-grams over raw text).
    ``engine``: ``'native'`` (all-JVM ``stat.bloomFilter`` +
    ``BloomFilterMightContain`` codegen probe), ``'bloom'`` (mergeable
    BloomSketch + vectorized Arrow probe), ``'auto'`` (native, falling
    back to sketch on private-API drift — same contract as
    ``bloom_join`` engine dispatch, ``bloom_join.py:315-326``).
    """
    if engine not in ("auto", "native", "bloom"):
        raise ValueError(f"unknown engine {engine!r}")
    bcol = _resolve_col(bench, bench_tokens if bench_tokens is not None else corpus_tokens)
    ccol = _resolve_col(corpus, corpus_tokens)
    spark = corpus.sparkSession
    report = DecontamReport(n=n)

    # benchmark n-gram set: distinct, consumed three times (sizing
    # count, filter build, verify join) → one lazy materialization point
    bench_ngs = (
        bench.select(F.explode(ngrams_col(bcol, n)).alias(_NG))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_bench = bench_ngs.count()
    report.n_bench_ngrams = n_bench
    out_schema_src = corpus.select(
        F.col(id_col), F.lit(0).cast("bigint").alias("n_hits")
    )
    if n_bench == 0:
        report.engine = "none"
        report.notes.append("benchmark side has no n-grams; nothing to flag")
        empty = out_schema_src.where(F.lit(False))
        return (empty, report) if return_report else empty

    keyed = bench_ngs.withColumn(_H, F.xxhash64(_NG))

    # corpus side: explode n-grams inside the scan stage; only id + the
    # gram leave the generator, so column pruning still reaches parquet
    exploded = corpus.select(
        F.col(id_col), F.explode(ngrams_col(ccol, n)).alias(_NG)
    ).withColumn(_H, F.xxhash64(_NG))

    probe_col: Column | None = None
    if engine in ("auto", "native"):
        try:
            blob = _native_build_filter(
                keyed.select(F.col(_H).alias("__bj_key64")), n_bench, fpp
            )
            if len(blob) > _NATIVE_FILTER_CAP_BYTES:
                # same plan-literal cap as bloom_join: the blob is
                # re-serialized into every task binary; a huge eval
                # suite belongs on the sketch engine (broadcast once)
                raise RuntimeError(
                    f"serialized native filter is {len(blob) >> 20} MiB, above "
                    f"the {_NATIVE_FILTER_CAP_BYTES >> 20} MiB plan-literal cap"
                )
            probe_col = _native_might_contain(spark, blob, F.col(_H))
            report.engine = "native"
            report.filter_bits = len(blob) * 8
        except Exception as ex:  # private-API drift → sketch engine
            if engine == "native":
                warnings.warn(
                    f"native bloom engine unavailable ({ex!r}); falling back "
                    "to the sketch engine",
                    stacklevel=2,
                )
            engine = "bloom"
    if probe_col is None:
        res = build_sketch(
            keyed.select(_H), lambda: BloomSketch(n=n_bench, fpp=fpp), cols=[_H],
            prehashed=True,
        )
        bc = spark.sparkContext.broadcast(res.sketch)
        probe_col = _make_probe_udf(bc)(F.col(_H))
        report.engine = "bloom"
        report.filter_bits = res.sketch.m

    # prefilter, then EXACT verify on n-gram equality (no false
    # positives in the output); Spark/AQE picks broadcast vs shuffle
    # for the verify join based on the benchmark side's actual size.
    # Known plan wart (native engine only): constraint propagation
    # copies the might_contain filter onto the BENCH side of the verify
    # join, where it is a tautology — wasted probes bounded by the
    # (small) benchmark n-gram count, never by corpus size; the sketch
    # engine's probe UDF is asNondeterministic() and is not copied
    hits = exploded.where(probe_col).join(bench_ngs, on=_NG, how="inner")
    out = hits.groupBy(id_col).agg(F.count_distinct(_NG).alias("n_hits"))
    return (out, report) if return_report else out


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    corpus_tokens: Column | str = "tokens",
    bench_tokens: Column | str | None = None,
    id_col: str = "doc_id",
    fpp: float = 0.01,
    engine: str = "auto",
) -> DataFrame:
    """``corpus`` with every contaminated document removed (anti-join
    on the flagged id set — the flagged side is proportional to true
    contamination, so Spark broadcasts it in the common case)."""
    flagged = contaminated_docs(
        corpus,
        bench,
        n=n,
        corpus_tokens=corpus_tokens,
        bench_tokens=bench_tokens,
        id_col=id_col,
        fpp=fpp,
        engine=engine,
    ).select(id_col)
    return corpus.join(flagged, on=id_col, how="left_anti")
