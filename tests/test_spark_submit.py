"""End-to-end spark-submit --py-files packaging smoke: the deployment path
the north rule requires (zip + jobs/extract_job.py on a fresh JVM)."""

import json
import os
import subprocess
import sys

import pyspark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_roundtrip(spark, corpus_sdf, tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    corpus_sdf.limit(500).write.parquet(in_dir)

    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(ROOT, "jobs", "extract_job.py"),
            "--input", in_dir, "--output", out_dir,
            "--buckets", "4", "--snapshot", "submit-test",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert metrics["rows_out"] == 500
    assert metrics["buckets_completed"] == 4
    out = spark.read.parquet(out_dir + "/data")
    assert out.count() == 500
    assert "clean_text" in out.columns and "spans" in out.columns
