"""Deployment-shape pin: the library must run as a REAL submitted
application — ``spark-submit --py-files bloomjoin_spark.zip`` against
a multi-executor master (``local-cluster[2,1,1536]``: two separate
executor JVMs, socket shuffle, the zip shipped to executor work dirs)
— not only via the driver's local sys.path.  This is the north rule's
run-mode; ``scripts/submit_scaling.py`` runs the same harness at N
and 4N executors for the scaling criterion (results in BENCH.md)."""

import json
import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box"
)
def test_submit_py_files_local_cluster(tmp_path):
    from submit_scaling import build_zip

    zpath = build_zip(str(tmp_path))
    env = dict(os.environ)
    env["BJ_SUBMIT_ROWS"] = "20000"
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    proc = subprocess.run(
        [SPARK_SUBMIT,
         "--master", "local-cluster[2,1,1536]",
         "--py-files", zpath,
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         os.path.join(REPO, "scripts", "submit_job.py")],
        capture_output=True, text=True, env=env, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["rows"] == 20000
    assert out["executors"] == "local-cluster[2,1,1536]"
    assert out["hll_distinct_tokens"] > 0
    assert out["joined_ntok_sum"] is not None
