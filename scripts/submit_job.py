"""spark-submit entrypoint: the north rule's deployment shape.

Run the library's scaling-efficiency job (Bloom-prefiltered join +
the full shared-pass sketch suite — the same composition as
``bench.py``'s ``engine_job``) as a REAL submitted application:
``spark-submit --py-files bloomjoin_spark.zip scripts/submit_job.py``
— the package rides to executors as a zip exactly as it would on a
YARN/K8s cluster, not via the driver's local sys.path.

In this sandbox the multi-executor cluster is ``local-cluster[N,
cores, mem]``: N SEPARATE executor JVMs with real socket shuffle and
closure/zip shipping (Spark's own integration tests use the same
master for executor-level behavior).  ``scripts/submit_scaling.py``
drives this file at N and 4N executors for the two-cluster-size
scaling criterion.

Measurement discipline mirrors ``bench.py``'s scaling worker: the
input parquet is read + repartitioned deterministically by doc_id +
persisted, one untimed warm-up pass spins executors/Python workers,
then ``BJ_SUBMIT_REPS`` timed passes report min — so the number is
the ENGINE's throughput, not parquet read or worker cold-start.

Prints ONE JSON line: rows, joined-row aggregate, sketch estimates,
per-rep seconds, min, throughput.
"""

import json
import os
import sys
import time


def engine_job(spark, toks, lk, n_lk: int):
    """Same composition as bench.py engine_job: prefiltered join
    consumed downstream + HLL/CMS/t-digest/KLL over every token id in
    ONE shared pass."""
    from pyspark.sql import functions as F

    from bloomjoin_spark import (
        CmsSketch,
        HllSketch,
        KllSketch,
        TDigestSketch,
        bloom_join,
        build_sketches,
    )

    agg = bloom_join(
        toks, lk, on="doc_id", how="inner", force_prefilter=True,
        collect_metrics=False, n_hint={"y": n_lk},
    ).select(F.sum("n_tok")).first()[0]
    res = build_sketches(
        toks,
        {
            "hll": lambda: HllSketch(14),
            "cms": lambda: CmsSketch(eps=1e-3, delta=1e-3),
            "tdg": lambda: TDigestSketch(),
            "kll": lambda: KllSketch(200),
        },
        token_col="tokens",
    )
    return agg, res


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # --py-files delivers the package to executors; the DRIVER side of
    # a plain `spark-submit scripts/submit_job.py` run needs the repo
    # root too (spark-submit puts the script's own dir on sys.path,
    # not its parent)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    token_rows = int(os.environ.get("BJ_SUBMIT_ROWS", "2000000"))
    reps = int(os.environ.get("BJ_SUBMIT_REPS", "3"))
    data_dir = os.environ.get("BJ_SUBMIT_DATA")  # pre-generated parquet
    spark = SparkSession.builder.appName("bloomjoin_submit_demo").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from bloomjoin_spark.datagen import lookup_table, token_table

    if data_dir:
        toks = spark.read.parquet(os.path.join(data_dir, "tokens"))
        lk = spark.read.parquet(os.path.join(data_dir, "lookup"))
    else:
        toks = token_table(spark, token_rows, num_partitions=64)
        lk = lookup_table(spark, token_rows, token_rows // 50, overlap=0.5,
                          num_partitions=16)

    # identical partitioning at every cluster size (scan splits depend
    # on defaultParallelism; the repartition pins them), cached input
    toks = toks.repartition(64, F.col("doc_id")).persist()
    n = toks.count()
    lk = lk.repartition(16, F.col("doc_id")).persist()
    n_lk = lk.count()

    engine_job(spark, toks, lk, n_lk)  # warm-up, untimed
    runs = []
    agg = hll = cms = None
    for _ in range(reps):
        t0 = time.time()
        agg, res = engine_job(spark, toks, lk, n_lk)
        runs.append(round(time.time() - t0, 3))
        hll = round(res["hll"].sketch.estimate())
        cms = res["cms"].sketch.total

    best = min(runs)
    print(json.dumps({
        "executors": spark.sparkContext.getConf().get("spark.master"),
        "rows": n,
        "joined_ntok_sum": agg,
        "hll_distinct_tokens": hll,
        "cms_total_tokens": cms,
        "runs_sec": runs,
        "elapsed_sec": best,
        "rows_per_sec": int(n / best) if best > 0 else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
