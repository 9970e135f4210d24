"""Per-cell isolation benchmarks for the optimization rounds (guide §1).

``bench.py`` is FROZEN for measurement; this file reproduces individual
headline cells with the same session config and inputs so a single cell
can be timed (min-of-N), explained, and re-timed after a change without
paying the whole-suite wall clock.  Numbers quoted in
OPTIMIZATION_r06.md come from here unless marked as full-suite runs.

Usage:
    python bench_extra.py spd idf            # time selected cells
    python bench_extra.py --repeats 3 spd    # min-of-3
    python bench_extra.py --explain spd      # dump plan to plans/r06/
    python bench_extra.py --list
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (reuses make_spark / datagen constants)
from bench import CPUS, SF_DIR, TOKEN_ROWS, build_token_df, make_spark  # noqa: E402

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _timed_min(fn, repeats):
    best = None
    for _ in range(repeats):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


class Cells:
    """Lazy shared fixtures mirroring bench.run_headline's setup."""

    def __init__(self, spark):
        self.spark = spark
        self._toks = None
        self._lk = None
        self._docs = None
        self._hist = None
        self._batch = None

    @property
    def docs(self):
        if self._docs is None:
            self._docs = self.spark.read.parquet(f"{SF_DIR}/documents.parquet")
        return self._docs

    @property
    def toks(self):
        if self._toks is None:
            self._toks = build_token_df(self.spark, TOKEN_ROWS, CPUS * 2).persist()
            self._toks.count()
        return self._toks

    @property
    def lk(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.datagen import lookup_table

        if self._lk is None:
            self._lk = (
                lookup_table(self.spark, TOKEN_ROWS, TOKEN_ROWS // 3, overlap=0.01,
                             num_partitions=max(2, CPUS // 2))
                .withColumn("payload", F.repeat(F.md5(F.col("doc_id")), 16))
                .persist()
            )
            self._lk.count()
        return self._lk

    def hist_batch(self):
        from pyspark.sql import functions as F

        if self._hist is None:
            n_hist, n_batch = TOKEN_ROWS // 2, TOKEN_ROWS // 20

            def _doc_text(idc):
                return F.concat(F.lit("synthetic corpus document "),
                                idc.cast("string"), F.lit(" "),
                                F.repeat(F.md5(idc.cast("string")), 2))

            self._hist = self.spark.range(0, n_hist, 1, CPUS * 2).select(
                F.col("id").alias("doc_id"), _doc_text(F.col("id")).alias("text")
            ).persist()
            self._hist.count()
            dup_src = (F.col("id") * 13) % n_hist
            self._batch = self.spark.range(n_hist, n_hist + n_batch, 1, CPUS).select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % 10 == 0, _doc_text(dup_src))
                .otherwise(_doc_text(F.col("id"))).alias("text"),
            ).persist()
            self._batch.count()
        return self._hist, self._batch

    # ---- cell bodies (same computation as bench.run_headline) ----

    def cell_spd(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.operators import remove_duplicate_spans, words_col

        docs_w = self.docs.select("doc_id", words_col(F.col("text")).alias("w"))
        return lambda: remove_duplicate_spans(
            docs_w, n=6, tokens_col="w", id_col="doc_id"
        ).agg(F.sum("n_dup_tokens"), F.sum(F.size("w"))).first()

    def cell_idf(self):
        from bloomjoin_spark.operators import incremental_dedup

        hist, batch = self.hist_batch()
        return lambda: incremental_dedup(batch, hist).count()

    def cell_idr(self):
        from bloomjoin_spark.operators import build_history_filter, incremental_dedup

        hist, batch = self.hist_batch()
        hist_bf = build_history_filter(hist, n_hint=TOKEN_ROWS // 2)
        return lambda: incremental_dedup(batch, hist, history_filter=hist_bf).count()

    def cell_dct(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.operators import contaminated_docs

        toks = self.toks
        bench_side = toks.where(
            (F.xxhash64("doc_id") % 1009 == 0) & (F.col("n_tok") >= 12)
        ).select(F.slice("tokens", 3, 8).alias("tokens"))
        return lambda: contaminated_docs(toks, bench_side, n=8).count()

    def cell_dcm(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.operators import contaminated_docs_many

        toks = self.toks
        bench_side = toks.where(
            (F.xxhash64("doc_id") % 1009 == 0) & (F.col("n_tok") >= 12)
        ).select(F.slice("tokens", 3, 8).alias("tokens"))
        bench_b = toks.where(
            (F.xxhash64("doc_id") % 997 == 1) & (F.col("n_tok") >= 14)
        ).select(F.slice("tokens", 5, 8).alias("tokens"))
        return lambda: contaminated_docs_many(
            toks, {"a": bench_side, "b": bench_b}, n=8
        ).count()

    def cell_bkw(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.sources import write_bucketed

        fact = self.toks.select("doc_id", "n_tok", "source")
        dim = (
            self.spark.range(0, TOKEN_ROWS, 10, CPUS)
            .select(F.format_string("doc_%012d", F.col("id")).alias("doc_id"),
                    (F.col("id") % 7).alias("cohort"))
        )

        def run():
            write_bucketed(fact, "bj_bench_fact_b", by="doc_id", buckets=CPUS)
            write_bucketed(dim, "bj_bench_dim_b", by="doc_id", buckets=CPUS)

        return run

    def cell_bkj(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.sources import co_located_join

        self.cell_bkw()()  # ensure tables exist

        def run():
            self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                co_located_join(
                    self.spark, "bj_bench_fact_b", "bj_bench_dim_b", on="doc_id"
                ).groupBy("cohort").agg(
                    F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok")
                ).collect()
            finally:
                self.spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

        return run

    def cell_sti(self):
        import shutil

        from bloomjoin_spark import HllSketch
        from bloomjoin_spark.sketches import CmsSketch
        from bloomjoin_spark.store import append_sketch_snapshot

        store_path = os.path.join(tempfile.gettempdir(), "bj_extra_store")
        shutil.rmtree(store_path, ignore_errors=True)
        facs = {"hll": lambda: HllSketch(14), "cms": lambda: CmsSketch(1e-4, 1e-3)}
        return lambda: append_sketch_snapshot(
            self.toks, facs, store_path, "day1", token_col="tokens")

    def cell_biw(self):
        from bloomjoin_spark.sources import write_bloom_indexed

        idx_path = os.path.join(tempfile.gettempdir(), "bj_extra_bloom_idx")
        return lambda: write_bloom_indexed(
            self.toks, idx_path, key="doc_id", num_files=CPUS)

    def cell_pipe(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark import prepare_corpus

        docs = self.docs

        def run():
            res = prepare_corpus(
                docs,
                minhash={"n": 3, "num_perm": 64, "bands": 8, "threshold": 0.9},
                boilerplate_min_docs=2,
                quality=True,
                scrub=True,
                mixture={"rates": {"src0": 0.5}, "default_rate": 0.8},
                split={"fractions": {"train": 0.9, "val": 0.05, "test": 0.05}},
            )
            return res.docs.groupBy("split").agg(
                F.count(F.lit(1)), F.sum(F.length("text"))
            ).collect()

        return run

    def cell_ngj(self):
        from bloomjoin_spark.operators import ngram_jaccard_pairs

        docs = self.docs
        return lambda: ngram_jaccard_pairs(docs, "text", "doc_id",
                                           threshold=0.8).count()

    def cell_ctn(self):
        from bloomjoin_spark.operators import containment_pairs

        docs = self.docs
        return lambda: containment_pairs(docs, "text", "doc_id",
                                         threshold=0.9).count()

    def cell_mhp(self):
        from bloomjoin_spark.operators import minhash_dedup_pairs

        docs = self.docs
        return lambda: minhash_dedup_pairs(
            docs, "text", "doc_id", num_perm=64, bands=8, threshold=0.8
        ).count()

    def cell_gtk(self):
        from bloomjoin_spark import grouped_topk

        toks = self.toks
        return lambda: grouped_topk(toks, "source", k=10, token_col="tokens").count()

    def cell_bjt(self):
        from bloomjoin_spark import bloom_join

        toks, lk = self.toks, self.lk
        n_lk = lk.count()
        return lambda: bloom_join(
            toks, lk, on="doc_id", how="inner", force_prefilter=True,
            collect_metrics=False, n_hint={"y": n_lk},
        ).count()

    def cell_bjts(self):
        from bloomjoin_spark import bloom_join

        toks, lk = self.toks, self.lk
        n_lk = lk.count()
        return lambda: bloom_join(
            toks, lk, on="doc_id", how="inner", force_prefilter=True,
            collect_metrics=False, engine="bloom", n_hint={"y": n_lk},
        ).count()

    def cell_jsc(self):
        from bloomjoin_spark.operators import estimate_join_size

        toks, lk = self.toks, self.lk
        return lambda: estimate_join_size(toks, lk, on="doc_id", eps=1e-5, delta=0.01)

    def cell_cms(self):
        from bloomjoin_spark import CmsSketch, build_sketch

        toks = self.toks
        return lambda: build_sketch(
            toks, lambda: CmsSketch(eps=1e-4, delta=1e-3), token_col="tokens")

    def cell_dlw(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.operators import dedup_lines_within

        docs = self.docs
        return lambda: dedup_lines_within(docs.select("doc_id", "text"), sep=" ") \
            .agg(F.sum("n_removed_lines"), F.sum(F.length("text"))).collect()

    def cell_wfp(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.operators import winnowing_fingerprints

        docs = self.docs
        return lambda: winnowing_fingerprints(docs).agg(
            F.sum(F.size("winnow_fps"))).first()

    def cell_tng(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.operators import top_ngram_frac

        docs = self.docs
        return lambda: top_ngram_frac(docs, n=2).agg(
            F.sum("top_ngram_char_frac")).first()

    def cell_enc(self):
        from pyspark.sql import functions as F

        from bloomjoin_spark.operators import build_vocab, encode_documents

        docs = self.docs
        return lambda: encode_documents(
            docs, build_vocab(docs, min_count=2)
        ).agg(F.sum("n_tok"), F.count(F.lit(1))).first()


def main():
    args = [a for a in sys.argv[1:]]
    repeats = 2
    explain = False
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    if "--explain" in args:
        explain = True
        args.remove("--explain")
    names = [a for a in args if not a.startswith("-")]
    spark = make_spark(CPUS)
    cells = Cells(spark)
    if "--list" in sys.argv:
        print([m[5:] for m in dir(cells) if m.startswith("cell_")])
        return
    out = {}
    try:
        for name in names:
            fn = getattr(cells, f"cell_{name}")()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            fn()  # warm (parquet footers, python workers)
            out[name] = round(_timed_min(fn, repeats), 3)
            spark.sparkContext.setJobDescription(None)
            print(f"[extra] {name}: {out[name]}s", file=sys.stderr, flush=True)
    finally:
        print(json.dumps(out))
        spark.stop()


if __name__ == "__main__":
    main()
