"""End-to-end sketch suite over the synthesized north-rule token table:
distributed build via the two-phase harness, estimates vs Spark-exact
aggregates within published bounds."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomjoin_spark import (
    CmsSketch,
    HllSketch,
    KllSketch,
    TDigestSketch,
    build_sketch,
)
from bloomjoin_spark.datagen import lookup_table, token_table
from bloomjoin_spark.hashing import hash_int64, hash_strings


@pytest.fixture(scope="module")
def tokens_df(spark):
    df = token_table(spark, 20_000, vocab=5_000, max_tok=64, num_partitions=8)
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


def test_datagen_deterministic_across_partitionings(spark):
    a = token_table(spark, 2_000, vocab=100, max_tok=16, num_partitions=3)
    b = token_table(spark, 2_000, vocab=100, max_tok=16, num_partitions=11)
    ra = sorted(map(str, a.collect()))
    rb = sorted(map(str, b.collect()))
    assert ra == rb


def test_datagen_schema_and_skew(tokens_df):
    assert dict(tokens_df.dtypes) == {
        "doc_id": "string",
        "tokens": "array<int>",
        "n_tok": "int",
        "source": "string",
    }
    counts = {r["source"]: r["cnt"] for r in
              tokens_df.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    hot = counts["source_00"] / sum(counts.values())
    assert 0.45 <= hot <= 0.55  # one hot source ≈ 50% of rows
    # n_tok == len(tokens) invariant
    bad = tokens_df.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


def test_hll_distinct_docid(spark, tokens_df):
    res = build_sketch(tokens_df, lambda: HllSketch(p=14), cols=["doc_id"])
    exact = tokens_df.select(F.countDistinct("doc_id")).first()[0]
    est = res.sketch.estimate()
    assert abs(est - exact) / exact <= 4 * res.sketch.rel_std_error


def test_hll_distinct_tokens_explode_free(spark, tokens_df):
    res = build_sketch(tokens_df, lambda: HllSketch(p=14), token_col="tokens")
    exact = tokens_df.select(F.explode("tokens").alias("t")).select(
        F.countDistinct("t")
    ).first()[0]
    est = res.sketch.estimate()
    assert abs(est - exact) / exact <= 4 * res.sketch.rel_std_error


def test_cms_token_frequencies(spark, tokens_df):
    res = build_sketch(
        tokens_df, lambda: CmsSketch(eps=1e-3, delta=1e-3), token_col="tokens"
    )
    sk = res.sketch
    exact = (
        tokens_df.select(F.explode("tokens").alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(50)
        .collect()
    )
    keys = np.array([r["t"] for r in exact], dtype=np.int64)
    true = np.array([r["cnt"] for r in exact], dtype=np.int64)
    # token ids hash as canonical numeric — same as hash_series on int32
    import pandas as pd

    from bloomjoin_spark.hashing import hash_series

    est = sk.query_hashes(hash_series(pd.Series(keys, dtype="int64")))
    assert (est >= true).all()
    assert (est - true <= sk.error_bound()).mean() >= 0.98


def test_tdigest_ntok_quantiles(spark, tokens_df):
    res = build_sketch(tokens_df, lambda: TDigestSketch(200), cols=["n_tok"])
    qs = [0.1, 0.5, 0.9, 0.99]
    est = res.sketch.quantile(qs)
    exact = tokens_df.select(
        F.percentile_approx("n_tok", qs, 100000).alias("q")
    ).first()["q"]
    vals = [r["n_tok"] for r in tokens_df.select("n_tok").collect()]
    svals = np.sort(np.array(vals))
    for q, e in zip(qs, est):
        left = np.searchsorted(svals, e, "left") / svals.size
        right = np.searchsorted(svals, e, "right") / svals.size
        assert max(0.0, q - right, left - q) <= 0.02, (q, e, exact)


def test_kll_ntok_quantiles(spark, tokens_df):
    res = build_sketch(tokens_df, lambda: KllSketch(k=200), cols=["n_tok"])
    sk = res.sketch
    assert sk.count == 20_000
    vals = np.sort(
        np.array([r["n_tok"] for r in tokens_df.select("n_tok").collect()])
    )
    for q in [0.05, 0.5, 0.95]:
        e = sk.quantile(q)
        left = np.searchsorted(vals, e, "left") / vals.size
        right = np.searchsorted(vals, e, "right") / vals.size
        assert max(0.0, q - right, left - q) <= sk.epsilon()


def test_lookup_table_overlap(spark):
    lk = lookup_table(spark, n_x=10_000, n_y=2_000, overlap=0.25)
    hits = lk.filter(F.col("doc_id").startswith("doc_")).count()
    assert 0.18 <= hits / 2000 <= 0.32
