"""Replicate the reference's benchmark scenario grid
(`/root/reference/inst/bench/bench-bloomjoin.R:56-66`): 8 cells of
(n_probe, n_build, overlap), timing naive join vs forced-prefilter
bloom_join vs AUTO-mode bloom_join (the planner may skip). Prints one
JSON line; paste the table into BENCH.md."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses make_spark + malloc/GC tuning)

GRID = [
    (1_000_000, 10_000, 0.01),
    (1_000_000, 10_000, 0.05),
    (500_000, 5_000, 0.02),
    (500_000, 5_000, 0.10),
    (200_000, 20_000, 0.05),
    (200_000, 20_000, 0.25),
    (100_000, 100_000, 0.10),
    (100_000, 100_000, 0.50),
]


def main():
    from pyspark.sql import functions as F

    from bloomjoin_spark import bloom_join
    from bloomjoin_spark.datagen import lookup_table, token_table

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    # warm full width
    warm = token_table(spark, 64 * 500, vocab=1000, max_tok=8, num_partitions=64)
    bloom_join(warm, warm.select("doc_id").limit(100), on="doc_id",
               force_prefilter=True, collect_metrics=False).count()

    cells = []
    for n_x, n_y, overlap in GRID:
        toks = token_table(spark, n_x, vocab=50_000, max_tok=64,
                           num_partitions=32).persist()
        toks.count()
        lk = (
            lookup_table(spark, n_x, n_y, overlap=overlap, num_partitions=8)
            .withColumn("payload", F.repeat(F.md5(F.col("doc_id")), 16))
            .persist()
        )
        lk.count()

        def t(fn, reps=2):
            best = 1e9
            for _ in range(reps):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            return round(best, 3)

        naive = t(lambda: toks.join(lk, "doc_id", "inner").count())
        forced = t(lambda: bloom_join(
            toks, lk, on="doc_id", how="inner", force_prefilter=True,
            collect_metrics=False).count())
        auto = t(lambda: bloom_join(
            toks, lk, on="doc_id", how="inner", collect_metrics=False).count())
        _, rep = bloom_join(toks, lk, on="doc_id", how="inner",
                            return_report=True, collect_metrics=False)
        surv = toks.join(lk.select("doc_id"), "doc_id", "left_semi").count()
        cells.append({
            "n_probe": n_x, "n_build": n_y, "overlap": overlap,
            "naive_sec": naive, "bloom_forced_sec": forced,
            "bloom_auto_sec": auto,
            "auto_used_prefilter": rep.used_prefilter,
            "auto_skip_reason": (rep.skip_reasons[0].split("—")[0].strip()
                                 if rep.skip_reasons else None),
            "row_reduction": round(1 - surv / n_x, 4),
        })
        toks.unpersist()
        lk.unpersist()
        print(json.dumps(cells[-1]), file=sys.stderr)
    print(json.dumps({"grid": cells}))
    spark.stop()


if __name__ == "__main__":
    main()
