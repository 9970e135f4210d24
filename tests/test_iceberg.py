"""Iceberg integration — the one north-rule noun whose executed path
needs a jar this sandbox cannot install (no network, no
``iceberg-spark-runtime`` on the classpath).

The engine-side code under test (``sources.io.read_table`` catalog-name
path + ``iceberg_session_conf``) is exercised against Spark's built-in
catalog in test_sources.py; THIS file proves the Iceberg-specific
remainder the moment a jar appears: drop
``iceberg-spark-runtime-<spark_ver>_<scala_ver>.jar`` into pyspark's
``jars/`` directory (or $SPARK_HOME/jars) and the test runs — the skip
reason is the jar, not the code."""

from __future__ import annotations

import glob
import os

import pytest


def _find_iceberg_jar() -> str | None:
    roots = []
    if os.environ.get("SPARK_HOME"):
        roots.append(os.environ["SPARK_HOME"])
    try:
        import pyspark

        roots.append(os.path.dirname(pyspark.__file__))
    except ImportError:
        pass
    for root in roots:
        hits = glob.glob(os.path.join(root, "jars", "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


_JAR = _find_iceberg_jar()


@pytest.mark.skipif(
    _JAR is None,
    reason=(
        "iceberg-spark-runtime jar not on the JVM classpath (sandbox has no "
        "network to fetch it); with the jar in pyspark's jars/ dir this "
        "round-trip runs as-is"
    ),
)
def test_iceberg_catalog_round_trip(spark, tmp_path):
    """Write → read_table('ice.db.t') → bloom_join over an Iceberg
    table.  Catalog plugin confs are non-static, so registering the
    catalog on the already-running session works once the jar is on the
    boot classpath (the extensions conf is static and not needed for
    the DataFrame API used here)."""
    from pyspark.sql import functions as F

    from bloomjoin_spark import bloom_join
    from bloomjoin_spark.sources import iceberg_session_conf, read_table

    for k, v in iceberg_session_conf(warehouse=str(tmp_path / "wh")).items():
        if "extensions" not in k:
            spark.conf.set(k, v)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db")
    spark.range(0, 1_000).withColumnRenamed("id", "k").withColumn(
        "v", F.lit(1)
    ).writeTo("ice.db.t").using("iceberg").createOrReplace()

    df = read_table(spark, "ice.db.t")
    assert df.count() == 1_000

    small = spark.range(0, 50).withColumnRenamed("id", "k")
    out = bloom_join(df, small, on="k", how="inner", force_prefilter=True)
    assert out.count() == 50
