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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bloom_inner_join": _bloom_inner,
        "bloom_semi_join": _bloom_semi,
        "bloom_anti_join": _bloom_anti,
        "bloom_left_join": _bloom_left,
        "bloom_composite_key_join": _bloom_composite,
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
    }
