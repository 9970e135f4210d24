"""Similarity search tests (embeddings table)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomjoin_spark.operators import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup_pairs,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_bruteforce_topk_matches_numpy(spark, emb, queries):
    got = cosine_topk(emb, queries, k=5).toPandas()
    # numpy oracle
    pdf = emb.toPandas()
    V = np.stack(pdf["embedding"].map(np.asarray))
    ids = pdf["vec_id"].to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qdf = queries.toPandas()
    for _, qrow in qdf.iterrows():
        qv = np.asarray(qrow["embedding"], dtype=np.float64)
        sims = Vn @ (qv / np.linalg.norm(qv))
        order = np.lexsort((ids, -np.round(sims, 6)))[:5]
        expect = list(ids[order])
        mine = got[got.query_id == qrow["query_id"]].sort_values("rank")["vec_id"].tolist()
        assert mine == expect


def test_topk_self_match_first(emb, queries):
    got = cosine_topk(emb, queries, k=1).toPandas()
    assert (got["vec_id"] == got["query_id"]).all()
    assert (got["sim"] >= 0.999999).all()


def test_ann_lsh_recall(emb, queries):
    exact = cosine_topk(emb, queries, k=10).select("query_id", "vec_id")
    approx = ann_lsh_topk(emb, queries, k=10, bands=16, nbits=64).select(
        "query_id", "vec_id"
    )
    inter = exact.intersect(approx).count()
    recall = inter / exact.count()
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_embedding_near_dup_pairs(spark, emb):
    # plant near-identical vectors
    dup = emb.limit(5).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    both = emb.unionByName(dup)
    pairs = embedding_near_dup_pairs(both, threshold=0.999)
    found = pairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000).count()
    assert found == 5
    assert pairs.filter(F.col("sim") < 0.999).count() == 0


def test_ann_ivf_recall_and_determinism(spark, sf_dir):
    """IVF ANN: recall@10 vs brute-force ≥ 0.5 at small nprobe, exact
    when probing every cell; centroid training is deterministic."""
    import numpy as np

    from bloomjoin_spark.operators import (
        ann_ivf_topk,
        cosine_topk,
        train_ivf_centroids,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=10).select("query_id", "vec_id")
    approx = ann_ivf_topk(emb, queries, k=10, nlist=8, nprobe=3).select(
        "query_id", "vec_id"
    )
    hit = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    assert hit / exact.count() >= 0.5
    # nprobe == nlist → candidate set is the whole corpus → exact result
    full = ann_ivf_topk(emb, queries, k=10, nlist=8, nprobe=8).select(
        "query_id", "vec_id"
    )
    assert exact.exceptAll(full).count() == 0 and full.exceptAll(exact).count() == 0
    c1 = train_ivf_centroids(emb, nlist=8)
    c2 = train_ivf_centroids(emb, nlist=8)
    assert np.array_equal(c1, c2)


def test_embedding_dedup_keeps_min_id(spark):
    """Semantic dedup tier: near-identical vectors collapse to the
    min-id representative; orthogonal vectors survive."""
    from bloomjoin_spark.operators import embedding_dedup

    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):
        v = rng.normal(size=16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        if i % 4 == 0:  # near-dup: tiny perturbation, same direction
            w = v + rng.normal(scale=1e-4, size=16)
            w /= np.linalg.norm(w)
            rows.append((100 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = embedding_dedup(df, threshold=0.999)
    ids = sorted(r.vec_id for r in kept.collect())
    assert all(i < 100 for i in ids)
    assert len(ids) == 20
