"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship bloom_join on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query; sketch-estimate
queries return exact values + bound-check booleans so the oracle can
pin them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Bloom-prefiltered join of lineitem against a
    high-selectivity part subset, exactly equal to the plain join."""
    from bloomjoin_spark import bloom_join

    sf = "/root/testdata/sf0.001"
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = (
        _t(spark, sf, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return bloom_join(
        li, part, on={"l_partkey": "p_partkey"}, how="inner", force_prefilter=True
    )


# ---------------------------------------------------------------------------
# queries — each callable (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def _bloom_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    return bloom_join(
        li, part, on={"l_partkey": "p_partkey"}, how="inner", force_prefilter=True
    )


def _bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    hot = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 500).select("doc_id")
    return bloom_join(docs, hot, on="doc_id", how="semi", force_prefilter=True)


def _bloom_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    hot = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 500).select("doc_id")
    return bloom_join(docs, hot, on="doc_id", how="anti", force_prefilter=True)


def _bloom_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(F.col("c_custkey"), F.col("c_name"))
    )
    return bloom_join(
        ords, cust, on={"o_custkey": "c_custkey"}, how="left", force_prefilter=True
    )


def _bloom_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import bloom_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
    )
    return bloom_join(
        li, pairs, on={"l_partkey": "pk", "l_suppkey": "sk"}, how="inner",
        force_prefilter=True,
    )


# ---------------------------------------------------------------------------
# sketch-verification queries: each returns EXACT values (pinned by the
# DuckDB oracle) alongside within_bound booleans that pin the sketch
# estimate to its published error bound
# ---------------------------------------------------------------------------

def _hll_distinct_docid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import HllSketch, build_sketch

    docs = _t(spark, sf_dir, "documents")
    res = build_sketch(docs, lambda: HllSketch(p=14), cols=["doc_id"])
    exact = docs.select(F.countDistinct("doc_id").alias("d")).first()["d"]
    est = res.sketch.estimate()
    ok = abs(est - exact) / max(exact, 1) <= 4 * res.sketch.rel_std_error
    return spark.createDataFrame(
        [(int(exact), bool(ok))], "exact_distinct bigint, within_bound boolean"
    )


def _hll_distinct_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomjoin_spark import HllSketch, build_sketch

    li = _t(spark, sf_dir, "lineitem")
    res = build_sketch(li, lambda: HllSketch(p=14), cols=["l_partkey"])
    exact = li.select(F.countDistinct("l_partkey").alias("d")).first()["d"]
    est = res.sketch.estimate()
    ok = abs(est - exact) / max(exact, 1) <= 4 * res.sketch.rel_std_error
    return spark.createDataFrame(
        [(int(exact), bool(ok))], "exact_distinct bigint, within_bound boolean"
    )


def _cms_partkey_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from bloomjoin_spark import CmsSketch, build_sketch
    from bloomjoin_spark.hashing import hash_series

    li = _t(spark, sf_dir, "lineitem")
    res = build_sketch(li, lambda: CmsSketch(eps=1e-4, delta=1e-3), cols=["l_partkey"])
    sk = res.sketch
    exact = (
        li.filter(F.col("l_partkey") % 100 == 0)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .toPandas()
    )
    est = sk.query_hashes(hash_series(exact["l_partkey"].astype("int64")))
    ok = (est >= exact["exact_cnt"].to_numpy()) & (
        est - exact["exact_cnt"].to_numpy() <= sk.error_bound()
    )
    out = exact.assign(within_bound=ok)
    return spark.createDataFrame(
        out, "l_partkey bigint, exact_cnt bigint, within_bound boolean"
    )


def _quantile_check(spark, df, col, method, bound) -> DataFrame:
    """Shared shape: estimate quantiles, measure TRUE rank error in
    Spark (exact), return (q, within_bound)."""
    from bloomjoin_spark.functions import approx_quantiles

    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    est = approx_quantiles(df, col, qs, method=method)
    n = df.count()
    rows = []
    for q, v in zip(qs, est):
        left = df.filter(F.col(col) < v).count() / n
        right = df.filter(F.col(col) <= v).count() / n
        err = max(0.0, q - right, left - q)
        rows.append((float(q), bool(err <= bound)))
    return spark.createDataFrame(rows, "q double, within_bound boolean")


def _tdigest_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return _quantile_check(spark, li, "l_extendedprice", "tdigest", 0.01)


def _kll_quantiles_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return _quantile_check(spark, docs, "n_chars", "kll", 2.296 / 200**0.9)


def _bloom_fpr_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint build/probe key sets: measured fpr ≤ target (+5σ), zero
    false negatives — the reference's test-fpr-target.R as a query."""
    from bloomjoin_spark import BloomSketch, build_sketch

    orders = _t(spark, sf_dir, "orders")
    build = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
    probe = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey")
    n_build = build.count()
    res = build_sketch(build, lambda: BloomSketch(n_build, 0.01), cols=["o_orderkey"])
    sk = res.sketch
    import numpy as np
    import pandas as pd

    from bloomjoin_spark.hashing import hash_series

    probe_keys = probe.toPandas()["o_orderkey"]
    build_keys = build.toPandas()["o_orderkey"]
    fp = sk.contains_hashes(hash_series(probe_keys)).mean()
    fn = (~sk.contains_hashes(hash_series(build_keys))).sum()
    n_probe = len(probe_keys)
    fpr_ok = fp <= 0.01 + 5 * np.sqrt(0.01 * 0.99 / max(n_probe, 1))
    return spark.createDataFrame(
        [(bool(fpr_ok), int(fn))], "fpr_within_target boolean, false_negatives bigint"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bloom_inner_join": _bloom_inner,
        "bloom_semi_join": _bloom_semi,
        "bloom_anti_join": _bloom_anti,
        "bloom_left_join": _bloom_left,
        "bloom_composite_key_join": _bloom_composite,
        "hll_distinct_docid": _hll_distinct_docid,
        "hll_distinct_partkey": _hll_distinct_partkey,
        "cms_partkey_freq": _cms_partkey_freq,
        "tdigest_quantiles_price": _tdigest_quantiles_price,
        "kll_quantiles_nchars": _kll_quantiles_nchars,
        "bloom_fpr_check": _bloom_fpr_check,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bloom_inner_join": """
            SELECT l.l_orderkey, l.l_partkey, l.l_quantity, p.p_partkey, p.p_name
            FROM lineitem l
            JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey % 10 = 0) p
              ON l.l_partkey = p.p_partkey
        """,
        "bloom_semi_join": """
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d
            WHERE d.doc_id IN (SELECT doc_id FROM documents WHERE n_chars > 500)
        """,
        "bloom_anti_join": """
            SELECT d.doc_id, d.lang
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM documents WHERE n_chars > 500)
        """,
        "bloom_left_join": """
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_custkey, c.c_name
            FROM orders o
            LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 7 = 0) c
              ON o.o_custkey = c.c_custkey
        """,
        "bloom_composite_key_join": """
            SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_extendedprice, p.pk, p.sk
            FROM lineitem l
            JOIN (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                  FROM lineitem WHERE l_quantity > 45) p
              ON l.l_partkey = p.pk AND l.l_suppkey = p.sk
        """,
        "hll_distinct_docid": """
            SELECT count(DISTINCT doc_id) AS exact_distinct, TRUE AS within_bound
            FROM documents
        """,
        "hll_distinct_partkey": """
            SELECT count(DISTINCT l_partkey) AS exact_distinct, TRUE AS within_bound
            FROM lineitem
        """,
        "cms_partkey_freq": """
            SELECT l_partkey, count(*) AS exact_cnt, TRUE AS within_bound
            FROM lineitem WHERE l_partkey % 100 = 0
            GROUP BY l_partkey
        """,
        "tdigest_quantiles_price": """
            SELECT q, TRUE AS within_bound
            FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) AS t(q)
        """,
        "kll_quantiles_nchars": """
            SELECT q, TRUE AS within_bound
            FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) AS t(q)
        """,
        "bloom_fpr_check": """
            SELECT TRUE AS fpr_within_target, 0 AS false_negatives
        """,
    }
