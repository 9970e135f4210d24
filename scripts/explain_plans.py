"""Regenerate the formatted plans cited in docs/PLANS.md."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bloomjoin_spark import bloom_join
    from bloomjoin_spark.aggregate import sketch_partials
    from bloomjoin_spark.operators import add_text_stats
    from bloomjoin_spark.sketches import HllSketch

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    sub = (
        spark.read.parquet(f"{SF}/part.parquet")
        .filter(F.col("p_partkey") % 10 == 0)
        .select("p_partkey", "p_name")
    )
    j = bloom_join(
        li.select("l_orderkey", "l_partkey", "l_quantity"), sub,
        on={"l_partkey": "p_partkey"}, how="inner",
        force_prefilter=True, collect_metrics=False,
    )
    print("===== bloom_join probe+join (forced) =====")
    j.explain("formatted")

    p = sketch_partials(li, lambda: HllSketch(14), cols=["l_partkey"])
    print("===== hll partials over parquet (pruning) =====")
    p.explain("formatted")

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("lang") == "en")
    print("===== text stats with filter pushdown =====")
    add_text_stats(docs).select("doc_id", "n_tokens").explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
