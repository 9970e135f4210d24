"""Source-layer tests: catalog-or-path entry point (SURVEY §1.3 —
reference has no scans; the Spark engine's inputs are tables/paths)."""

from conftest import SF_DIR


def test_read_table_path(spark):
    from bloomjoin_spark.sources import read_table

    df = read_table(spark, f"{SF_DIR}/lineitem.parquet")
    assert df.count() > 0
    assert "l_orderkey" in df.columns


def test_tables_dict(spark):
    from bloomjoin_spark.sources import tables

    t = tables(spark, SF_DIR)
    assert set(t) >= {"lineitem", "documents", "embeddings"}
    assert t["documents"].count() > 0


def test_token_table_ref_synthesizes(spark):
    from bloomjoin_spark.sources import token_table_ref

    df = token_table_ref(spark, None, n_rows=500, vocab=50, max_tok=8,
                         num_partitions=2)
    assert df.count() == 500
    assert df.columns == ["doc_id", "tokens", "n_tok", "source"]


def test_read_table_catalog_name(spark, tmp_path):
    """The catalog-NAME path (the one an Iceberg catalog would use):
    saveAsTable into the session catalog, read back via read_table by
    name — same spark.read.table code path as ice.db.tbl."""
    from bloomjoin_spark.sources import read_table

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    df.write.mode("overwrite").saveAsTable("bj_cat_test")
    try:
        got = read_table(spark, "bj_cat_test")
        assert got.count() == 100
        assert got.columns == ["k"]
    finally:
        spark.sql("DROP TABLE IF EXISTS bj_cat_test")


def test_iceberg_session_conf_shape():
    from bloomjoin_spark.sources import iceberg_session_conf

    conf = iceberg_session_conf(catalog="ice", warehouse="/tmp/wh")
    assert conf["spark.sql.catalog.ice"].endswith("SparkCatalog")
    assert conf["spark.sql.catalog.ice.warehouse"] == "/tmp/wh"
    assert "Extensions" in conf["spark.sql.extensions"]
