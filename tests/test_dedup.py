"""Dedup operator tests over the documents table + planted duplicates."""

import pytest
from pyspark.sql import functions as F

from bloomjoin_spark.operators import (
    add_simhash,
    exact_dedup,
    minhash_dedup,
    minhash_dedup_pairs,
    simhash_near_dup_pairs,
    with_shingle_hashes,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def docs_with_dups(docs):
    # plant exact duplicates: copy 20% of docs under shifted ids
    dups = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return docs.unionByName(dups)


def test_exact_dedup_removes_planted_dups(docs, docs_with_dups):
    n_orig = docs.count()
    deduped = exact_dedup(docs_with_dups)
    assert deduped.count() == n_orig
    # survivors are the min-id representatives (originals)
    assert deduped.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_exact_dedup_noop_on_unique(docs):
    assert exact_dedup(docs).count() == docs.count()


def test_shingles_jvm_only(docs):
    sh = with_shingle_hashes(docs, "text", n=3)
    row = sh.select(F.size("shingles").alias("n")).agg(F.min("n"), F.max("n")).first()
    assert row[0] >= 1
    # plan contains no Python evaluation
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_minhash_finds_planted_exact_dups(spark, docs, docs_with_dups):
    # exact dup ⇒ identical signature ⇒ guaranteed candidate in every band
    pairs = minhash_dedup_pairs(
        docs_with_dups, "text", "doc_id", n=3, num_perm=64, bands=8, threshold=0.99
    )
    planted = docs.filter(F.col("doc_id") % 5 == 0).count()
    found = (
        pairs.filter(
            (F.col("id_b") - F.col("id_a") == 1_000_000)
        ).count()
    )
    assert found == planted
    assert pairs.filter(F.col("jaccard") < 0.99).count() == 0


def test_minhash_dedup_end_to_end(docs, docs_with_dups):
    deduped = minhash_dedup(
        docs_with_dups, "text", "doc_id", n=3, num_perm=64, bands=8, threshold=0.99
    )
    # all planted copies removed (min-id representative kept), originals intact
    assert deduped.filter(F.col("doc_id") >= 1_000_000).count() == 0
    assert deduped.count() == docs.count()


def test_simhash_near_dups(spark):
    # identical texts → identical simhash (hamming 0)
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different content about spark and sketches"),
            (4, "the quick brown fox jumps over the lazy cat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = add_simhash(df)
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    assert vals[1] == vals[2]
    pairs = simhash_near_dup_pairs(sh, max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got
