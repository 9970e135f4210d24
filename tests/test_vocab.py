"""Vocabulary building + document encoding (documents → the
pre-tokenized (doc_id, tokens, n_tok, source) training shape)."""

import pytest
from pyspark.sql import functions as F

from bloomjoin_spark.operators import (
    OOV_ID,
    build_vocab,
    encode_documents,
)


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "a"),
            (2, "the dog sat", "a"),
            (3, "a rare zebra", "b"),
            (4, "", "b"),
            (5, "   ", "b"),
        ],
        "doc_id long, text string, source string",
    )


class TestBuildVocab:
    def test_rank_rule_freq_desc_then_word(self, toy):
        v = {r["word"]: (r["token_id"], r["n"]) for r in build_vocab(toy).collect()}
        # 'the' (3) then 'sat' (2), then count-1 words alphabetically
        assert v["the"] == (1, 3)
        assert v["sat"] == (2, 2)
        ones = sorted(w for w, (_, n) in v.items() if n == 1)
        ids = [v[w][0] for w in ones]
        assert ids == sorted(ids) and ids[0] == 3
        # contiguous, 0 reserved
        all_ids = sorted(tid for tid, _ in v.values())
        assert all_ids == list(range(1, len(v) + 1))

    def test_min_count_and_max_size(self, toy):
        v2 = build_vocab(toy, min_count=2).collect()
        assert {r["word"] for r in v2} == {"the", "sat"}
        top1 = build_vocab(toy, max_size=1).collect()
        assert [(r["token_id"], r["word"]) for r in top1] == [(1, "the")]

    def test_deterministic_across_runs(self, toy):
        a = sorted(map(tuple, build_vocab(toy).collect()))
        b = sorted(map(tuple, build_vocab(toy, num_partitions=3).collect()))
        assert a == b

    def test_validation(self, toy):
        with pytest.raises(ValueError):
            build_vocab(toy, min_count=0)
        with pytest.raises(ValueError):
            build_vocab(toy, max_size=0)


class TestEncodeDocuments:
    def test_round_trip_no_oov(self, spark, toy):
        vocab = build_vocab(toy)
        enc = encode_documents(toy, vocab)
        assert set(enc.columns) == {"doc_id", "source", "tokens", "n_tok"}
        rows = {r["doc_id"]: r for r in enc.collect()}
        assert len(rows) == 5  # rows never dropped
        # decode back through the vocab → original words
        id2w = {r["token_id"]: r["word"] for r in vocab.collect()}
        assert [id2w[t] for t in rows[1]["tokens"]] == (
            "the cat sat on the mat".split()
        )
        assert rows[1]["n_tok"] == 6
        assert rows[4]["tokens"] == [] and rows[4]["n_tok"] == 0
        assert rows[5]["tokens"] == [] and rows[5]["n_tok"] == 0

    def test_oov_mapping_and_drop(self, toy):
        vocab = build_vocab(toy, min_count=2)  # only 'the', 'sat'
        rows = {
            r["doc_id"]: r
            for r in encode_documents(toy, vocab).collect()
        }
        # doc 2 'the dog sat' → [the, OOV, sat]
        the_id, sat_id = 1, 2
        assert rows[2]["tokens"] == [the_id, OOV_ID, sat_id]
        assert rows[3]["tokens"] == [OOV_ID] * 3
        dropped = {
            r["doc_id"]: r
            for r in encode_documents(toy, vocab, drop_oov=True).collect()
        }
        assert dropped[2]["tokens"] == [the_id, sat_id]
        assert dropped[3]["tokens"] == [] and dropped[3]["n_tok"] == 0

    def test_output_types_match_token_table_shape(self, toy):
        enc = encode_documents(toy, build_vocab(toy))
        fields = dict(enc.dtypes)
        assert fields["tokens"] == "array<int>"
        assert fields["n_tok"] == "int"

    def test_collision_guard(self, spark):
        df = spark.createDataFrame(
            [(1, "x", "a", 9)], "doc_id long, text string, source string, n_tok int"
        )
        with pytest.raises(ValueError):
            encode_documents(df, build_vocab(df))

    def test_no_forced_broadcast_and_int_only_shuffle(self, toy):
        # the doc-reassembly exchange must not carry the text column
        enc = encode_documents(toy, build_vocab(toy))
        plan = enc._jdf.queryExecution().executedPlan().toString()
        assert "text" not in plan.split("Exchange hashpartitioning")[-1][:400]

    def test_sf_documents_conservation(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        vocab = build_vocab(docs, min_count=2)
        enc = encode_documents(docs, vocab)
        assert enc.count() == docs.count()
        # total token count == total word count
        n_enc = enc.agg(F.sum("n_tok")).first()[0]
        from bloomjoin_spark.operators.text import words_col

        n_words = docs.select(
            F.size(words_col(F.col("text"))).alias("s")
        ).agg(F.sum("s")).first()[0]
        assert n_enc == n_words


class TestEncodeFeedsDownstream:
    """Cross-operator contract: encode_documents output IS the
    pre-tokenized shape pack_sequences and the token sketches consume."""

    def test_encode_then_pack_conserves_tokens(self, spark, sf_dir):
        from bloomjoin_spark.operators import (
            build_vocab,
            encode_documents,
            pack_sequences,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        enc = encode_documents(docs, build_vocab(docs, min_count=2))
        packs = pack_sequences(enc, max_tokens=512, tokens_col="tokens")
        total_enc = enc.agg(F.sum("n_tok")).first()[0]
        total_pck = packs.agg(F.sum("n_tokens")).first()[0]
        assert total_pck == total_enc
        assert packs.agg(F.max("n_tokens")).first()[0] <= 512

    def test_encode_feeds_token_sketches(self, spark, sf_dir):
        from bloomjoin_spark.aggregate import build_sketch
        from bloomjoin_spark.operators import build_vocab, encode_documents
        from bloomjoin_spark.sketches import HllSketch

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        enc = encode_documents(docs, build_vocab(docs, min_count=2))
        hll = build_sketch(
            enc, lambda: HllSketch(12), token_col="tokens"
        ).sketch
        exact = (
            enc.select(F.explode("tokens").alias("t")).distinct().count()
        )
        assert abs(hll.estimate() - exact) <= 0.05 * exact + 3
