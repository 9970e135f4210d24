"""Corpus-composition monitoring: per-group token histograms and
distribution divergence vs the whole corpus.

A training-mix pipeline needs to see when one source's token
distribution drifts from the corpus (mixture re-weighting, corruption
upstream, a crawler gone wrong).  KL(source ‖ corpus) is exact here —
token supports of a source are a subset of the corpus support, so no
smoothing is needed — and every arithmetic step is SQL-portable.

Scale shape: one explode inside the scan stage, one partial-aggregated
``groupBy (group, token)`` shuffle (the only corpus-sized exchange),
then everything is vocabulary-sized: per-group totals, the corpus
histogram (broadcast), and the per-group divergence sum.  Vocabulary
is bounded (tokenizers: 32k-256k ids), so the post-shuffle work is
independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["token_counts", "group_token_divergence"]


def _tok(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_counts(
    df: DataFrame,
    tokens: Column | str = "tokens",
    group_col: str | None = None,
) -> DataFrame:
    """Histogram of token values: ``(token, n)`` — or
    ``(group, token, n)`` with ``group_col``.  One explode + one
    partial-aggregated groupBy."""
    keys = ([group_col] if group_col else []) + ["token"]
    return (
        df.select(*( [group_col] if group_col else [] ),
                  F.explode(_tok(tokens)).alias("token"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def group_token_divergence(
    df: DataFrame,
    group_col: str = "source",
    tokens: Column | str = "tokens",
) -> DataFrame:
    """Per group: token mass, distinct tokens, and exact
    KL(group ‖ corpus) over the token distribution, in nats —
    ``(group_col, n_tokens, n_distinct_tokens, kl_vs_corpus)``.

    KL needs no smoothing because every group token occurs in the
    corpus distribution by construction (q > 0 wherever p > 0).  The
    divergence is rounded to 6 decimals: the value itself is exact up
    to float summation order (~1e-12 relative), so the rounding is
    engine-portable."""
    per = token_counts(df, tokens, group_col)
    totals = per.groupBy(group_col).agg(F.sum("n").alias("gn"))
    corpus = per.groupBy("token").agg(F.sum("n").alias("cn"))
    corpus_total = corpus.agg(F.sum("cn").alias("ct"))
    joined = (
        per.join(F.broadcast(corpus), "token")
        .join(totals, group_col)
        .crossJoin(F.broadcast(corpus_total))
    )
    p = F.col("n") / F.col("gn")
    q = F.col("cn") / F.col("ct")
    term = p * F.log(p / q)
    return (
        joined.groupBy(group_col)
        .agg(
            F.first("gn").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.round(F.sum(term), 6).alias("kl_vs_corpus"),
        )
    )
