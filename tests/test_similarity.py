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


class TestProductQuantization:
    def _books(self, spark, emb):
        from bloomjoin_spark.operators import train_pq_codebooks

        return train_pq_codebooks(emb, m=8, nbits=8, sample=2000, iters=6)

    def test_train_shape_and_determinism(self, spark, emb):
        from bloomjoin_spark.operators import train_pq_codebooks

        b1 = self._books(spark, emb)
        b2 = self._books(spark, emb)
        assert b1.shape == (8, 256, 8)
        np.testing.assert_array_equal(b1, b2)

    def test_train_validation(self, spark, emb):
        from bloomjoin_spark.operators import train_pq_codebooks

        with pytest.raises(ValueError, match="divisible"):
            train_pq_codebooks(emb, m=7)
        with pytest.raises(ValueError, match="nbits"):
            train_pq_codebooks(emb, nbits=9)
        with pytest.raises(ValueError, match="m must"):
            train_pq_codebooks(emb, m=0)

    def test_codes_shape_and_null_handling(self, spark, emb):
        from bloomjoin_spark.operators import add_pq_codes

        books = self._books(spark, emb)
        bad = spark.createDataFrame(
            [(900001, None), (900002, []), (900003, [1.0, 2.0])],
            "vec_id long, embedding array<float>",
        )
        out = add_pq_codes(
            emb.select("vec_id", "embedding").unionByName(bad), books
        ).collect()
        by_id = {r.vec_id: r.pq_code for r in out}
        # null / empty / wrong-dim vectors -> NULL code
        assert by_id[900001] is None and by_id[900002] is None
        assert by_id[900003] is None
        real = [c for i, c in by_id.items() if i < 900000]
        assert all(c is not None and len(c) == 8 for c in real)
        with pytest.raises(ValueError, match="already exists"):
            add_pq_codes(emb.withColumn("pq_code", F.lit(b"")), books)

    def test_exactly_representable_vectors_score_exactly(self, spark):
        """With hand-built codebooks and corpus vectors that ARE
        codeword concatenations (unit norm, so the encode-side
        normalization is a no-op), quantization is lossless: the ADC
        score is the exact cosine, so even shortlist=1 finds the true
        top-1 (self, sim 1.0) for every query."""
        from bloomjoin_spark.operators import ann_pq_topk

        # 2 subspaces × 4 codewords of norm 1/√2: every concatenation
        # is a unit vector and exactly representable
        angles = np.array([0.1, 0.7, 1.6, 2.9])
        cw = np.stack([np.cos(angles), np.sin(angles)], axis=1) / np.sqrt(2)
        books = np.stack([cw, cw[::-1]])  # (m=2, k=4, dsub=2)
        vecs = [
            np.concatenate([books[0, a], books[1, b]])
            for a in range(4) for b in range(4)
        ]
        corpus = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        q = corpus.filter(F.col("vec_id") % 5 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = ann_pq_topk(corpus, q, books, k=1, shortlist=1).collect()
        assert len(got) == 4
        assert all(r.vec_id == r.query_id and r.sim == 1.0 for r in got)

    def test_full_shortlist_is_exact(self, spark, emb, queries):
        """shortlist >= |corpus| makes the re-rank see every vector:
        PQ output == brute-force cosine_topk exactly."""
        from bloomjoin_spark.operators import ann_pq_topk

        books = self._books(spark, emb)
        n = emb.count()
        exact = cosine_topk(emb, queries, k=5).select("query_id", "vec_id", "sim")
        approx = ann_pq_topk(emb, queries, books, k=5, shortlist=n).select(
            "query_id", "vec_id", "sim"
        )
        assert exact.exceptAll(approx).count() == 0
        assert approx.exceptAll(exact).count() == 0

    def test_recall_and_precomputed_codes_path(self, spark, emb, queries):
        from bloomjoin_spark.operators import add_pq_codes, ann_pq_topk

        books = self._books(spark, emb)
        exact = cosine_topk(emb, queries, k=10).select("query_id", "vec_id")
        codes = add_pq_codes(emb.select("vec_id", "embedding"), books).select(
            "vec_id", "pq_code"
        )
        approx = ann_pq_topk(
            emb, queries, books, k=10, codes=codes, shortlist=80
        ).select("query_id", "vec_id")
        hit = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
        assert hit / max(exact.count(), 1) >= 0.5
        with pytest.raises(ValueError, match="shortlist"):
            ann_pq_topk(emb, queries, books, k=10, shortlist=5)

    def test_edge_inputs_and_nonlong_qid(self, spark):
        """Review fixes: int (non-long) query ids must not break the
        Arrow schema; empty / null-vector queries degrade gracefully;
        duplicate ids in a user codes table don't duplicate top-k rows."""
        from bloomjoin_spark.operators import add_pq_codes, ann_pq_topk

        angles = np.array([0.3, 1.1, 2.0, 2.8])
        cw = np.stack([np.cos(angles), np.sin(angles)], axis=1) / np.sqrt(2)
        books = np.stack([cw, cw])
        vecs = [
            np.concatenate([books[0, a], books[1, b]]).tolist()
            for a in range(4) for b in range(4)
        ]
        corpus = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        # int (32-bit) query id
        q_int = spark.createDataFrame(
            [(3, vecs[3])], "query_id int, embedding array<float>"
        )
        got = ann_pq_topk(corpus, q_int, books, k=1, shortlist=1).collect()
        assert got[0].vec_id == 3 and got[0].sim == 1.0
        # empty queries -> empty result with the output schema
        q_empty = q_int.limit(0)
        out = ann_pq_topk(corpus, q_empty, books, k=1)
        assert out.count() == 0
        assert set(out.columns) == {"query_id", "vec_id", "sim", "rank"}
        # a NULL-vector query yields no rows for that query
        q_null = spark.createDataFrame(
            [(9, None), (3, vecs[3])], "query_id int, embedding array<float>"
        )
        got2 = ann_pq_topk(corpus, q_null, books, k=1, shortlist=1).collect()
        assert {r.query_id for r in got2} == {3}
        # duplicated codes rows don't duplicate candidates
        codes = add_pq_codes(corpus, books)
        dup_codes = codes.select("vec_id", "pq_code").unionAll(
            codes.select("vec_id", "pq_code")
        )
        got3 = ann_pq_topk(
            corpus, q_int, books, k=3, codes=dup_codes, shortlist=3
        ).collect()
        ids = [r.vec_id for r in got3]
        assert len(ids) == len(set(ids)) == 3


class TestIvfPq:
    def test_recall_full_probe_exactness_and_pruned_scan(self, spark, emb, queries):
        from bloomjoin_spark.operators import (
            add_ivf_cluster,
            add_pq_codes,
            ann_ivf_pq_topk,
            train_ivf_centroids,
            train_pq_codebooks,
        )

        cents = train_ivf_centroids(emb, nlist=8, sample=2000)
        books = train_pq_codebooks(emb, m=8, nbits=8, sample=2000, iters=6)
        codes = add_pq_codes(
            add_ivf_cluster(
                emb.select("vec_id", "embedding"), cents, out_col="ivf_cell"
            ),
            books,
        ).select("vec_id", "ivf_cell", "pq_code")
        exact = cosine_topk(emb, queries, k=10).select("query_id", "vec_id")
        approx = ann_ivf_pq_topk(
            emb, queries, cents, books, k=10, nprobe=3, codes=codes,
            shortlist=80,
        ).select("query_id", "vec_id")
        hit = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
        assert hit / max(exact.count(), 1) >= 0.5
        # full probe + full shortlist == brute force exactly
        n = emb.count()
        full = ann_ivf_pq_topk(
            emb, queries, cents, books, k=10, nprobe=8, codes=codes,
            shortlist=n,
        ).select("query_id", "vec_id", "sim")
        exact_s = cosine_topk(emb, queries, k=10).select(
            "query_id", "vec_id", "sim"
        )
        assert exact_s.exceptAll(full).count() == 0
        assert full.exceptAll(exact_s).count() == 0
        # a query never surfaces a candidate outside its probed cells:
        # nprobe=1 means every candidate shares the query's own cell
        one = ann_ivf_pq_topk(
            emb, queries, cents, books, k=5, nprobe=1, codes=codes,
        )
        cells = {r.vec_id: r.ivf_cell for r in codes.collect()}
        for r in one.collect():
            assert cells[r.vec_id] == cells[r.query_id]

    def test_edge_validation(self, spark, emb, queries):
        from bloomjoin_spark.operators import (
            ann_ivf_pq_topk,
            train_ivf_centroids,
            train_pq_codebooks,
        )

        cents = train_ivf_centroids(emb, nlist=4, sample=500)
        books = train_pq_codebooks(emb, m=8, nbits=4, sample=500, iters=3)
        with pytest.raises(ValueError, match="nprobe"):
            ann_ivf_pq_topk(emb, queries, cents, books, nprobe=0)
        with pytest.raises(ValueError, match="shortlist"):
            ann_ivf_pq_topk(emb, queries, cents, books, k=10, shortlist=2)
        out = ann_ivf_pq_topk(emb, queries.limit(0), cents, books, k=3)
        assert out.count() == 0
