"""Regression: the driver contract must work when the harness imports
__spark_entry__ from OUTSIDE the repo (executors can't see driver sys.path
edits — plans/pipeline.ensure_pyfiles ships the package via addPyFile)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as m
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("cwd-sim")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
n = len(m.entry(spark).collect())
assert n > 0, n
q = m.queries()["extract_roundtrip"](spark, "/root/testdata/sf0.001")
assert q.count() > 0
print("FOREIGN_CWD_OK", n)
spark.stop()
"""


def test_entry_runs_from_foreign_cwd(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),  # NOT the repo
        capture_output=True,
        text=True,
        timeout=300,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert "FOREIGN_CWD_OK" in proc.stdout, proc.stderr[-3000:]
