"""Two-cluster-size scaling via REAL spark-submit --py-files runs.

The north rule's deployment criterion: the library runs via
``spark-submit --py-files`` on a multi-executor cluster at N and 4N
executors with throughput scaling efficiency >= 0.8.  This sandbox
has no resource manager, so the cluster is ``local-cluster[N, cores,
mem]`` — N SEPARATE executor JVMs (own heaps, socket shuffle, the
zip shipped to each executor's work dir), which exercises everything
a YARN/K8s submit does except the scheduler itself.

Protocol mirrors bench.py's run_scaling: the input parquet is
generated ONCE and shared; each side is one submitted application
that repartitions deterministically, persists, warms up untimed, and
reports min-of-reps (reps inside the app so cold-start is paid once);
1 and 4 executors × 2 cores keeps both endpoints in this guest's
stable ≤8-thread region (see BENCH.md's protocol notes).

Usage:  python scripts/submit_scaling.py [rows] [reps_small] [reps_big]
Prints one JSON line per application plus a final summary line with
efficiency = (T_N / T_4N) / 4.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get(
    "SPARK_SUBMIT",
    os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"),
)


def build_zip(dest_dir: str) -> str:
    """Package bloomjoin_spark/ as the --py-files artifact (exactly
    what a cluster submit ships)."""
    zpath = os.path.join(dest_dir, "bloomjoin_spark.zip")
    pkg = os.path.join(REPO, "bloomjoin_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def gen_data(rows: int, dest_dir: str) -> str:
    """Generate the shared input ONCE (full local width) so both
    cluster sizes read identical parquet.  Same table shapes as
    bench.py's scaling input (lookup = rows/50 keys, 50% overlap)."""
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession
from bloomjoin_spark.datagen import lookup_table, token_table
spark = SparkSession.builder.master("local[*]").getOrCreate()
token_table(spark, {rows}, num_partitions=64).write.mode("overwrite").parquet({dest_dir!r} + "/tokens")
lookup_table(spark, {rows}, {rows} // 50, overlap=0.5, num_partitions=16).write.mode("overwrite").parquet({dest_dir!r} + "/lookup")
spark.stop()
"""
    # cwd=REPO so local[*] python workers resolve bloomjoin_spark for
    # the datagen UDF closures (the submit runs ship the zip instead)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, cwd=REPO)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit("datagen failed")
    return dest_dir


def submit_once(zpath: str, n_exec: int, cores: int, mem_mb: int,
                data_dir: str, reps: int) -> dict:
    env = dict(os.environ)
    env["BJ_SUBMIT_DATA"] = data_dir
    env["BJ_SUBMIT_REPS"] = str(reps)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    proc = subprocess.run(
        [SPARK_SUBMIT,
         "--master", f"local-cluster[{n_exec},{cores},{mem_mb}]",
         "--py-files", zpath,
         "--conf", "spark.sql.shuffle.partitions=32",
         "--conf", "spark.ui.enabled=false",
         os.path.join(REPO, "scripts", "submit_job.py")],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"submit failed at {n_exec} executors")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps_small = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    reps_big = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    tmp = tempfile.mkdtemp(prefix="bj_submit_")
    try:
        zpath = build_zip(tmp)
        data = gen_data(rows, os.path.join(tmp, "data"))
        r1 = submit_once(zpath, 1, 2, 6144, data, reps_small)
        print(json.dumps({"n_exec": 1, **r1}))
        r4 = submit_once(zpath, 4, 2, 6144, data, reps_big)
        print(json.dumps({"n_exec": 4, **r4}))
        t1, t4 = r1["elapsed_sec"], r4["elapsed_sec"]
        print(json.dumps({
            "rows": rows,
            "runs_small": r1["runs_sec"], "runs_big": r4["runs_sec"],
            "sec_small": t1, "sec_big": t4,
            "rows_per_sec_small": int(rows / t1),
            "rows_per_sec_big": int(rows / t4),
            "scaling_efficiency": round(t1 / t4 / 4, 3),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
