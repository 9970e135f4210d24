"""Text-analysis operator tests (documents table)."""

import pytest
from pyspark.sql import functions as F

from bloomjoin_spark.operators import (
    add_fingerprint,
    add_lang_id,
    add_text_stats,
    bpe_ish_token_count,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_text_stats_jvm_only(docs):
    st = add_text_stats(docs)
    plan = st._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # whole-stage codegen only
    row = st.agg(
        F.min("n_tokens"), F.max("quality_score"), F.min("quality_score")
    ).first()
    assert row[0] >= 1
    assert 0.0 <= row[2] <= row[1] <= 1.0


def test_text_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, ""), (3, "   "), (4, "xyz")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in add_text_stats(df).collect()}
    assert rows[1]["n_tokens"] == 5
    assert rows[1]["stopword_ratio"] == pytest.approx(3 / 5)
    assert rows[2]["n_tokens"] == 0 and rows[3]["n_tokens"] == 0
    assert rows[4]["n_tokens"] == 1 and rows[4]["stopword_ratio"] == 0.0


def test_lang_id_corpus_consistency(docs):
    # the synthetic corpus text is English-ish word soup regardless of
    # its lang LABEL (no textual signal), so the text-based heuristic
    # must consistently answer en/und — never a spurious third language
    pred = add_lang_id(docs)
    langs = {r["lang_pred"] for r in pred.select("lang_pred").distinct().collect()}
    assert langs <= {"en", "und"}


def test_lang_id_basic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "der hund und die katze das ist gut"),
            (3, "le chat et la souris est dans les champs"),
            (4, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["lang_pred"] for r in add_lang_id(df).collect()}
    assert rows[1] == "en" and rows[2] == "de" and rows[3] == "fr"
    assert rows[4] == "und"


def test_fingerprint_stable_and_canonical(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "  hello world  "), (3, "other")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in add_fingerprint(df).collect()}
    assert rows[1]["content_fp"] == rows[2]["content_fp"]
    assert rows[1]["fp64"] == rows[2]["fp64"]
    assert rows[1]["content_fp"] != rows[3]["content_fp"]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [(1, "hello world, 42 times!"), (2, "plain words only")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_tokens_bpe_ish"] for r in bpe_ish_token_count(df).collect()}
    # words(4) + puncts(2: , !) + digit runs(1: 42)
    assert rows[1] == 7
    assert rows[2] == 3


def test_winnowing_fingerprints(spark):
    """MOSS-style winnowing: a document sharing a long substring with
    another shares ≥1 fingerprint; unrelated docs (different token
    vocab) share none; short docs get a whole-text fallback."""
    from bloomjoin_spark.operators import winnowing_fingerprints

    base = " ".join(f"alpha{i}" for i in range(60))
    overlapping = "intro words " + " ".join(f"alpha{i}" for i in range(25, 55)) + " outro"
    unrelated = " ".join(f"beta{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, overlapping), (3, unrelated), (4, "tiny doc")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: set(r["winnow_fps"]) for r in
            winnowing_fingerprints(docs).collect()}
    assert rows[1] & rows[2], "long shared substring must share a fingerprint"
    assert not (rows[1] & rows[3]), "disjoint vocab must not collide"
    assert len(rows[4]) == 1  # whole-text fallback
    # determinism
    again = {r["doc_id"]: set(r["winnow_fps"]) for r in
             winnowing_fingerprints(docs).collect()}
    assert again == rows
