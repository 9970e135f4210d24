"""Local replica of the driver's correctness gate: run every
queries() entry on Spark at sf0.01 and its oracle_sql() in DuckDB,
compare row count + schema + order-insensitive values."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = sys.argv[1:] or list(qs)
    failed = []
    for name in only:
        fn = qs[name]
        t0 = time.time()
        sdf = fn(spark, SF).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: NO ORACLE — rows={len(sdf)} ({t_spark:.1f}s)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        ok, msg = compare(sdf, odf)
        status = "OK " if ok else "FAIL"
        print(f"{name}: {status} spark_rows={len(sdf)} oracle_rows={len(odf)} "
              f"({t_spark:.1f}s) {msg}")
        if not ok:
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all queries match oracle")


def compare(sdf, odf):
    import pandas as pd

    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return False, f"schema mismatch: {scols} vs {ocols}"
    if len(sdf) != len(odf):
        return False, "row count mismatch"
    a = sdf[scols].copy()
    b = odf[scols].copy()
    for c in scols:
        # normalize: floats rounded, everything to string for sort-hash
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            a[c] = a[c].astype(float).round(6)
            b[c] = b[c].astype(float).round(6)
    ka = sorted(map(tuple, a.astype(str).to_numpy().tolist()))
    kb = sorted(map(tuple, b.astype(str).to_numpy().tolist()))
    if ka != kb:
        diff = next(i for i, (x, y) in enumerate(zip(ka, kb)) if x != y)
        return False, f"values differ at sorted row {diff}: {ka[diff]} vs {kb[diff]}"
    return True, ""


if __name__ == "__main__":
    main()
