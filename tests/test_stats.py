"""Token histogram / divergence operators."""

import math

import pytest
from pyspark.sql import Row, functions as F

from bloomjoin_spark.operators import group_token_divergence, token_counts


def _toks(spark, rows):
    return spark.createDataFrame(
        [Row(source=s, tokens=t) for s, t in rows],
        "source string, tokens array<int>",
    )


def test_token_counts_plain_and_grouped(spark):
    df = _toks(spark, [("a", [1, 1, 2]), ("b", [2, 3])])
    plain = {(r["token"]): r["n"] for r in token_counts(df).collect()}
    assert plain == {1: 2, 2: 2, 3: 1}
    grouped = {
        (r["source"], r["token"]): r["n"]
        for r in token_counts(df, group_col="source").collect()
    }
    assert grouped == {("a", 1): 2, ("a", 2): 1, ("b", 2): 1, ("b", 3): 1}


def test_divergence_identical_groups_is_zero(spark):
    df = _toks(spark, [("a", [1, 2, 3]), ("b", [1, 2, 3])])
    rows = {r["source"]: r for r in group_token_divergence(df).collect()}
    assert rows["a"]["kl_vs_corpus"] == 0.0
    assert rows["b"]["kl_vs_corpus"] == 0.0
    assert rows["a"]["n_tokens"] == 3
    assert rows["a"]["n_distinct_tokens"] == 3


def test_divergence_exact_value(spark):
    # a: all token 1 (p=1); corpus: q(1)=3/4 → KL(a‖corpus)=ln(4/3)
    df = _toks(spark, [("a", [1, 1]), ("b", [1, 2])])
    rows = {r["source"]: r for r in group_token_divergence(df).collect()}
    assert rows["a"]["kl_vs_corpus"] == pytest.approx(math.log(4 / 3), abs=1e-6)
    # b: p=(1/2,1/2), q=(3/4,1/4) → 0.5 ln(2/3) + 0.5 ln(2)
    assert rows["b"]["kl_vs_corpus"] == pytest.approx(
        0.5 * math.log(2 / 3) + 0.5 * math.log(2), abs=1e-6
    )


def test_divergence_nonnegative_and_skew_ranks(spark):
    # the skewed group (token 9 only) must diverge more than the
    # corpus-like group
    df = _toks(
        spark,
        [("bal", [1, 2, 3, 4]), ("bal", [1, 2, 3, 4]), ("skew", [9, 9, 9, 9])],
    )
    rows = {r["source"]: r["kl_vs_corpus"] for r in group_token_divergence(df).collect()}
    assert all(v >= 0 for v in rows.values())
    assert rows["skew"] > rows["bal"]


def test_divergence_on_word_column(spark):
    # arbitrary Column expressions work (word-level distributions)
    from bloomjoin_spark.operators import words_col

    df = spark.createDataFrame(
        [Row(source="a", text="x x y"), Row(source="b", text="y z")],
        "source string, text string",
    )
    rows = group_token_divergence(df, tokens=words_col(F.col("text"))).collect()
    assert {r["source"] for r in rows} == {"a", "b"}
