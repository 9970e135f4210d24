"""Two-phase aggregation harness tests: partial/merge equivalence,
tree-merge depth, checkpointed resume (north rule: per-partition
lineage + resumability)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomjoin_spark import BloomSketch, build_sketch
from bloomjoin_spark.hashing import hash_int64


def test_distributed_build_equals_local(spark):
    n = 20_000
    df = spark.range(0, n).repartition(8).select(F.col("id").cast("long").alias("k"))
    res = build_sketch(df, factory=lambda: BloomSketch(n, 0.01), cols=["k"])
    assert res.n_rows == n
    assert res.n_partitions == 8
    # zero false negatives through the distributed path
    import pandas as pd

    from bloomjoin_spark.hashing import hash_series

    h = hash_series(pd.Series(np.arange(n, dtype=np.int64)))
    assert res.sketch.contains_hashes(h).all()
    # disjoint probes mostly rejected
    h2 = hash_series(pd.Series(np.arange(n, 2 * n, dtype=np.int64)))
    assert res.sketch.contains_hashes(h2).mean() < 0.02 + 0.01


def test_tree_merge_multiple_rounds(spark):
    n = 5000
    df = spark.range(0, n).repartition(40).select(F.col("id").alias("k"))
    res = build_sketch(df, factory=lambda: BloomSketch(n, 0.01), cols=["k"], fanin=8)
    assert res.n_partitions == 40
    assert res.merge_rounds >= 1
    # same bits as a flat build
    flat = build_sketch(
        df.coalesce(1), factory=lambda: BloomSketch(n, 0.01), cols=["k"], fanin=64
    )
    assert np.array_equal(res.sketch.words, flat.sketch.words)


def test_merge_order_invariance(spark):
    # different partitionings → identical final bitset
    n = 10_000
    base = spark.range(0, n).select(F.col("id").alias("k"))
    a = build_sketch(base.repartition(3), lambda: BloomSketch(n, 0.01), cols=["k"])
    b = build_sketch(base.repartition(17), lambda: BloomSketch(n, 0.01), cols=["k"], fanin=4)
    assert np.array_equal(a.sketch.words, b.sketch.words)


def test_checkpoint_resume(spark, tmp_path):
    n = 8000
    ckpt = str(tmp_path / "sketch_ckpt")
    df = spark.range(0, n).repartition(6).select(F.col("id").alias("k"))
    r1 = build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"], checkpoint_dir=ckpt)
    # resume: all partitions done → no recompute, same sketch
    r2 = build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"], checkpoint_dir=ckpt)
    assert np.array_equal(r1.sketch.words, r2.sketch.words)
    assert r2.n_rows == n
    # lineage rows exist per partition
    lineage = spark.read.parquet(ckpt)
    assert lineage.select("partition_id").distinct().count() == 6
    assert set(lineage.columns) >= {"partition_id", "n_rows", "fingerprint", "blob"}


def test_checkpoint_hash_format_guard(spark, tmp_path):
    """ADVICE r3: resuming a checkpoint written under a different hash
    kernel version must be detected at resume time, not left to a
    docstring — mismatched version raises, a marker-less (pre-stamping)
    checkpoint warns, a same-version resume is silent."""
    import os
    import warnings as W

    import pytest

    from bloomjoin_spark.aggregate import _HASH_FORMAT_MARKER

    n = 2000
    ckpt = str(tmp_path / "fmt_ckpt")
    df = spark.range(0, n).repartition(3).select(F.col("id").alias("k"))
    build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"], checkpoint_dir=ckpt)
    marker = os.path.join(ckpt, _HASH_FORMAT_MARKER)
    assert os.path.exists(marker)

    # same version → silent resume (errors only on OUR warnings; py4j
    # emits unrelated ResourceWarnings during JVM roundtrips)
    with W.catch_warnings():
        W.simplefilter("error", UserWarning)
        build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"], checkpoint_dir=ckpt)

    # version mismatch → refuse
    with open(marker, "w") as f:
        f.write("1")
    with pytest.raises(ValueError, match="hash-format v1"):
        build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"], checkpoint_dir=ckpt)

    # corrupt marker (code-review r4 fix): an EXISTING marker that
    # cannot be parsed must REFUSE the resume, not downgrade to the
    # absence warning — it is an unknown hash-kernel version
    with open(marker, "w") as f:
        f.write("not-a-version")
    with pytest.raises(ValueError, match="cannot be read/parsed"):
        build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"],
                     checkpoint_dir=ckpt)

    # marker missing (pre-upgrade checkpoint) → loud warning, proceeds
    os.remove(marker)
    with pytest.warns(UserWarning, match="no hash-format marker"):
        r = build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"],
                         checkpoint_dir=ckpt)
    assert r.n_rows == n

    # ADVICE r4: resuming an UNMARKED dir must NOT stamp it — the mixed
    # v1+v2 partials would pass the guard silently on every later
    # resume.  The dir stays unmarked and every resume keeps warning.
    assert not os.path.exists(marker)
    with pytest.warns(UserWarning, match="no hash-format marker"):
        build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"],
                     checkpoint_dir=ckpt)
    assert not os.path.exists(marker)

    # Round-5 review: an unmarked dir whose parquet yields ZERO done
    # partition ids is rebuilt in overwrite mode — every partial is
    # current-version afterwards, so the rebuild MUST stamp it (leaving
    # it unmarked would warn spuriously forever and blind the guard to
    # a genuine future mismatch)
    # seed the dir with a zero-row parquet in the lineage schema, no
    # marker — an unmarked v1-era-looking dir that carries nothing
    build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"], checkpoint_dir=ckpt)
    zero = spark.read.parquet(ckpt).limit(0)
    zero.write.mode("overwrite").parquet(ckpt)
    if os.path.exists(marker):  # Spark's overwrite usually removes it
        os.remove(marker)
    with pytest.warns(UserWarning, match="no hash-format marker"):
        r2 = build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"],
                          checkpoint_dir=ckpt)
    assert r2.n_rows == n
    assert os.path.exists(marker)  # pure rebuild → stamped
    # and the next resume is silent again
    with W.catch_warnings():
        W.simplefilter("error", UserWarning)
        build_sketch(df, lambda: BloomSketch(n, 0.01), cols=["k"],
                     checkpoint_dir=ckpt)


def test_token_array_ingestion(spark):
    # build over exploded-free array<int> column
    rows = [(i, list(range(i % 5))) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    res = build_sketch(df, lambda: BloomSketch(10, 0.01), token_col="tokens")
    # token ids 0..3 present, 4+ absent
    import pandas as pd

    from bloomjoin_spark.hashing import hash_series

    present = hash_series(pd.Series([0, 1, 2, 3], dtype="int32"))
    assert res.sketch.contains_hashes(present).all()


def test_null_keys_tracked_not_inserted(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), (None,)], "k string"
    )
    res = build_sketch(df, lambda: BloomSketch(4, 0.01), cols=["k"])
    assert res.sketch.has_null
    assert res.sketch.n_added == 2


def test_build_sketches_single_pass_matches_individual(spark):
    """Multi-sketch one-pass build == per-sketch builds (same estimates),
    covering all four consumer types over one token column."""
    from bloomjoin_spark import (
        CmsSketch,
        HllSketch,
        KllSketch,
        TDigestSketch,
        build_sketch,
        build_sketches,
    )
    from bloomjoin_spark.datagen import token_table

    toks = token_table(spark, 20_000, vocab=2_000, max_tok=32, num_partitions=8)
    multi = build_sketches(
        toks,
        {
            "hll": lambda: HllSketch(12),
            "cms": lambda: CmsSketch(eps=1e-3, delta=1e-3),
            "td": lambda: TDigestSketch(200),
            "kll": lambda: KllSketch(200),
        },
        token_col="tokens",
    )
    single_hll = build_sketch(toks, lambda: HllSketch(12), token_col="tokens")
    single_cms = build_sketch(
        toks, lambda: CmsSketch(eps=1e-3, delta=1e-3), token_col="tokens"
    )
    assert multi["hll"].sketch.estimate() == single_hll.sketch.estimate()
    assert (multi["cms"].sketch.table == single_cms.sketch.table).all()
    assert multi["hll"].n_partitions == 8
    # quantiles of the zipf token distribution: q50 must be small, q ordering holds
    qs = multi["td"].sketch.quantile([0.1, 0.5, 0.9])
    assert qs[0] <= qs[1] <= qs[2]
    kq = multi["kll"].sketch.quantile([0.1, 0.5, 0.9])
    assert kq[0] <= kq[1] <= kq[2]
    assert multi["td"].n_rows == single_hll.n_rows


def test_token_profile_one_pass(spark):
    from bloomjoin_spark.datagen import token_table
    from bloomjoin_spark.functions import token_profile
    from pyspark.sql import functions as F

    toks = token_table(spark, 10_000, vocab=500, max_tok=16, num_partitions=4)
    prof = token_profile(toks, "tokens", top_tokens=[0, 1, 2])
    exact_distinct = (
        toks.select(F.explode("tokens").alias("t")).agg(F.countDistinct("t")).first()[0]
    )
    assert abs(prof["distinct_tokens"] - exact_distinct) / exact_distinct < 0.05
    exact_total = toks.agg(F.sum(F.size("tokens"))).first()[0]
    assert prof["total_tokens"] == exact_total
    assert prof["rows"] == 10_000
    q = prof["token_quantiles_tdigest"]
    assert q[0] <= q[1] <= q[2]
    exact0 = toks.select(F.explode("tokens").alias("t")).filter(F.col("t") == 0).count()
    est0 = prof["token_frequencies"][0]
    assert exact0 <= est0 <= exact0 + 1e-4 * exact_total + 1


def test_build_sketches_checkpoint_resume(spark, tmp_path):
    """Multi-sketch lineage: a second run over a complete checkpoint
    recomputes nothing (resume fast-path yields no new partials) and
    returns identical estimates."""
    from bloomjoin_spark import CmsSketch, HllSketch, build_sketches
    from bloomjoin_spark.datagen import token_table

    ckpt = str(tmp_path / "multi_ckpt")
    toks = token_table(spark, 5_000, vocab=300, max_tok=16, num_partitions=4)
    facts = {
        "hll": lambda: HllSketch(12),
        "cms": lambda: CmsSketch(eps=1e-3, delta=1e-3),
    }
    first = build_sketches(toks, facts, token_col="tokens", checkpoint_dir=ckpt)
    second = build_sketches(toks, facts, token_col="tokens", checkpoint_dir=ckpt)
    assert first["hll"].sketch.estimate() == second["hll"].sketch.estimate()
    assert (first["cms"].sketch.table == second["cms"].sketch.table).all()
    assert second["hll"].n_partitions == 4
    # lineage rows: one per (sketch, partition)
    rows = spark.read.parquet(ckpt)
    assert rows.select("name", "partition_id").distinct().count() == 8


def test_big_int64_keys_arrow_path_matches_query(spark):
    """Regression: the Arrow fast path must hash int64 keys beyond 2^53
    exactly like the query-side hash_series (exact integer bits, not
    doubles). Pre-fix, 2^60+i keys all rounded to the same double:
    CMS point queries returned 0 (undercount-guarantee broken), Bloom
    produced false negatives, HLL collapsed distinct keys."""
    import pandas as pd

    from bloomjoin_spark import CmsSketch, HllSketch
    from bloomjoin_spark.functions import token_frequencies
    from bloomjoin_spark.hashing import hash_series

    base = 1 << 60  # double ulp here is 256: adjacent ints collide as floats
    keys = [base + i for i in range(8)]
    rows = [(k,) for k in keys for _ in range(100)]
    df = spark.createDataFrame(rows, "k long").repartition(4)
    freqs = token_frequencies(df, keys, cols=["k"], eps=1e-3, delta=1e-3)
    for k in keys:
        assert freqs[k] >= 100, f"CMS undercounted exact-int64 key {k}: {freqs[k]}"
    res = build_sketch(df, lambda: BloomSketch(8, 0.01), cols=["k"])
    h = hash_series(pd.Series(keys, dtype="int64"))
    assert res.sketch.contains_hashes(h).all(), "Bloom false negative on big int64"
    hres = build_sketch(df, lambda: HllSketch(14), cols=["k"])
    assert round(hres.sketch.estimate()) == 8


def test_build_sketches_empty_input(spark):
    """Empty input still returns every requested sketch (empty), not a
    missing key."""
    from bloomjoin_spark import HllSketch, build_sketches

    empty = spark.createDataFrame([], "doc_id string, tokens array<int>")
    res = build_sketches(empty, {"hll": lambda: HllSketch(12)}, token_col="tokens")
    assert res["hll"].n_rows == 0
    assert res["hll"].sketch.estimate() == 0.0


def test_string_key_build_arrow_path_matches_query(spark):
    """String keys ride the Arrow utf8 fast path; membership/frequency
    queries hashed via hash_series/hash_strings must agree exactly, and
    nulls are tracked, never inserted."""
    import pandas as pd

    from bloomjoin_spark import CmsSketch, HllSketch
    from bloomjoin_spark.hashing import hash_series

    rows = [(f"doc_{i % 500:05d}",) for i in range(5_000)] + [(None,)] * 3
    df = spark.createDataFrame(rows, "doc_id string").repartition(4)
    res = build_sketch(df, lambda: BloomSketch(500, 0.01), cols=["doc_id"])
    assert res.sketch.has_null
    h = hash_series(pd.Series([f"doc_{i:05d}" for i in range(500)]))
    assert res.sketch.contains_hashes(h).all()
    absent = hash_series(pd.Series([f"nope_{i}" for i in range(2_000)]))
    assert res.sketch.contains_hashes(absent).mean() < 0.03
    hll = build_sketch(df, lambda: HllSketch(14), cols=["doc_id"])
    assert abs(hll.sketch.estimate() - 500) / 500 < 0.05
    cms = build_sketch(df, lambda: CmsSketch(eps=1e-3, delta=1e-3), cols=["doc_id"])
    est = cms.sketch.query_hashes(h)
    assert (est >= 10).all()  # every key appears 10 times


def test_grouped_sketch_estimates_distributed(spark):
    """grouped_sketch_estimates: per-group estimates via a distributed
    blob merge (no driver-side per-group state) — HLL per-group distinct
    within the published bound, CMS per-group totals exact."""
    from pyspark.sql import functions as F

    from bloomjoin_spark import CmsSketch, HllSketch, grouped_sketch_estimates
    from bloomjoin_spark.datagen import token_table

    df = token_table(spark, 20_000, vocab=500, max_tok=8, num_partitions=8)
    got = {
        r["source"]: r
        for r in grouped_sketch_estimates(
            df, lambda: HllSketch(13), "source", cols=["doc_id"]
        ).collect()
    }
    exact = {
        r["source"]: (r["d"], r["n"])
        for r in df.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("d"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    rel = 1.04 / (2 ** (13 / 2))
    for src, (d, n) in exact.items():
        assert got[src]["n_rows"] == n
        assert abs(got[src]["estimate"] - d) / max(d, 1) <= 4 * rel

    cms = {
        r["source"]: r["estimate"]
        for r in grouped_sketch_estimates(
            df, lambda: CmsSketch(eps=1e-3, delta=1e-3), "source", cols=["doc_id"]
        ).collect()
    }
    # CMS has no .estimate(); the merge emits .total — exact row count
    for src, (_, n) in exact.items():
        assert cms[src] == n


def test_grouped_quantiles_via_extract(spark):
    """extract= maps the merged per-group sketch to any scalar — e.g.
    per-source median n_tok from a t-digest, within the digest's rank
    error of the exact median."""
    from bloomjoin_spark import TDigestSketch, grouped_sketch_estimates
    from bloomjoin_spark.datagen import token_table

    df = token_table(spark, 20_000, vocab=500, max_tok=64, num_partitions=8)
    got = {
        r["source"]: r["estimate"]
        for r in grouped_sketch_estimates(
            df, lambda: TDigestSketch(200), "source", cols=["n_tok"],
            extract=lambda s: float(s.quantile(0.5)),
        ).collect()
    }
    exact = {
        r["source"]: r["med"]
        for r in df.groupBy("source")
        .agg(F.expr("percentile(n_tok, 0.5)").alias("med"))
        .collect()
    }
    assert set(got) == set(exact)
    for src in exact:
        assert abs(got[src] - exact[src]) <= max(3.0, 0.05 * exact[src])


# ---------------------------------------------------------------------------
# grouped_topk: per-group heavy hitters, one pass, blob-only shuffle
# ---------------------------------------------------------------------------

def _exact_grouped_topk(df, group_col, item_col, k):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cnt = df.groupBy(group_col, item_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("c").desc(), F.col(item_col).asc()
    )
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, F.col(item_col).alias("item"),
                F.col("c").alias("count_est"), "rank")
    )


def test_grouped_topk_exact_when_capacity_covers_distinct(spark):
    """capacity >= per-group distinct items → SpaceSaving is exact:
    rows equal the groupBy-count + window-rank plan, error == 0."""
    import pyspark.sql.functions as F

    from bloomjoin_spark import grouped_topk

    rows = [
        (g, int(v))
        for g in ("a", "b", "c")
        for i, v in enumerate([7] * 9 + [3] * 5 + [11] * 3 + [2, 5, 6])
    ]
    # skew group b: extra mass on a different item
    rows += [("b", 99)] * 12
    df = spark.createDataFrame(rows, "src string, item_val long").repartition(4)
    got = grouped_topk(df, "src", k=3, capacity=64, cols=["item_val"])
    exp = _exact_grouped_topk(df, "src", "item_val", 3)
    g = {(r["src"], r["item"], r["count_est"], r["rank"]) for r in got.collect()}
    e = {(r["src"], r["item"], r["count_est"], r["rank"]) for r in exp.collect()}
    assert g == e
    assert all(r["error"] == 0 for r in grouped_topk(
        df, "src", k=3, capacity=64, cols=["item_val"]).collect())


def test_grouped_topk_bounds_under_pressure(spark):
    """capacity < distinct: every row keeps the SpaceSaving bracket
    (true ∈ [count_est − error, count_est]) and the dominant item per
    group (freq > 2n/capacity) is guaranteed reported."""
    from bloomjoin_spark import grouped_topk

    rows = []
    for g, hot in (("a", 1000), ("b", 2000)):
        rows += [(g, hot)] * 300                       # dominant
        rows += [(g, i) for i in range(120)]           # long tail
    df = spark.createDataFrame(rows, "src string, item_val long").repartition(5)
    got = grouped_topk(df, "src", k=5, capacity=32, cols=["item_val"])
    rows_out = got.collect()
    true = {(g, v): 0 for g, v in rows}
    for g, v in rows:
        true[(g, v)] += 1
    for r in rows_out:
        t = true.get((r["src"], r["item"]), 0)
        assert r["count_est"] - r["error"] <= t <= r["count_est"]
    top_per_group = {r["src"]: r["item"] for r in rows_out if r["rank"] == 1}
    assert top_per_group == {"a": 1000, "b": 2000}


def test_grouped_topk_token_col_path(spark):
    """Per-group heavy hitters over token ARRAYS (the north-rule
    shape): one pass, no explode."""
    from bloomjoin_spark import grouped_topk

    df = spark.createDataFrame(
        [
            ("s1", [5, 5, 5, 1, 2]),
            ("s1", [5, 9]),
            ("s2", [8, 8, 3]),
            ("s2", [8]),
        ],
        "source string, tokens array<int>",
    )
    got = grouped_topk(df, "source", k=1, token_col="tokens")
    rows = {(r["source"], r["item"], r["count_est"]) for r in got.collect()}
    assert rows == {("s1", 5, 4), ("s2", 8, 3)}


def test_grouped_topk_validation(spark):
    from bloomjoin_spark import grouped_topk

    df = spark.createDataFrame([("a", 1)], "src string, v long")
    with pytest.raises(ValueError, match="k must be"):
        grouped_topk(df, "src", k=0, cols=["v"])
    with pytest.raises(ValueError, match="capacity"):
        grouped_topk(df, "src", k=10, capacity=4, cols=["v"])


def test_grouped_topk_weighted_exact(spark):
    """weight_col: ranking by per-item WEIGHT SUM equals the exact
    groupBy-sum + window-rank plan when capacity covers the domain;
    NULL-weight rows carry no mass."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bloomjoin_spark import grouped_topk

    rows = [
        ("a", 1, 5), ("a", 1, 7), ("a", 2, 100), ("a", 3, 1),
        ("b", 1, 2), ("b", 9, 50), ("b", 9, 9), ("b", 2, 30),
        ("a", 4, None),  # NULL weight: no mass
    ]
    df = spark.createDataFrame(
        rows, "src string, item_val long, w long"
    ).repartition(3)
    got = grouped_topk(df, "src", k=2, capacity=64,
                       cols=["item_val"], weight_col="w")
    cnt = (
        df.filter(F.col("w").isNotNull())
        .groupBy("src", "item_val").agg(F.sum("w").alias("c"))
    )
    win = Window.partitionBy("src").orderBy(
        F.col("c").desc(), F.col("item_val").asc()
    )
    exp = cnt.withColumn("rank", F.row_number().over(win)).filter("rank <= 2")
    g = {(r["src"], r["item"], r["count_est"], r["rank"]) for r in got.collect()}
    e = {(r["src"], r["item_val"], r["c"], r["rank"]) for r in exp.collect()}
    assert g == e
    assert all(r["error"] == 0 for r in got.collect())


def test_grouped_topk_weighted_bracket_under_pressure(spark):
    """capacity < distinct with weights: count_est brackets the true
    weight sum and the dominant-mass item per group is rank 1."""
    from bloomjoin_spark import grouped_topk

    rows = []
    for g, hot in (("a", 1000), ("b", 2000)):
        rows += [(g, hot, 40)] * 30                    # dominant mass
        rows += [(g, i, 1) for i in range(120)]        # long light tail
    df = spark.createDataFrame(
        rows, "src string, item_val long, w long"
    ).repartition(5)
    got = grouped_topk(df, "src", k=5, capacity=32,
                       cols=["item_val"], weight_col="w").collect()
    true: dict = {}
    for g, v, w in rows:
        true[(g, v)] = true.get((g, v), 0) + w
    for r in got:
        t = true.get((r["src"], r["item"]), 0)
        assert r["count_est"] - r["error"] <= t <= r["count_est"]
    assert {r["src"]: r["item"] for r in got if r["rank"] == 1} == {
        "a": 1000, "b": 2000
    }


def test_grouped_topk_weighted_validation(spark):
    from bloomjoin_spark import grouped_topk

    df = spark.createDataFrame(
        [("a", 1, 1.5)], "src string, v long, w double"
    )
    # fractional weights raise inside the task
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="integer-valued|Py4J"):
        grouped_topk(df, "src", k=2, cols=["v"], weight_col="w").collect()
    # weight_col without an item column is rejected up front
    with pytest.raises(ValueError, match="weight_col"):
        grouped_topk(df, "src", k=2, token_col="v", weight_col="w")
