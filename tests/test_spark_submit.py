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


def test_spark_submit_curate_increment_vacuum(spark, corpus_sdf, tmp_path):
    """Deployment-path e2e for the curation CLIs: base curate_job, then
    curate_job --increment (new batch against the shipped corpus), then
    maintain_job vacuum — each on a fresh spark-submit JVM through the
    --py-files zip."""
    import pandas as pd

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from make_pyfiles_zip import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    corpus_sdf.limit(400).write.parquet(in_dir)

    def submit(job, *args):
        proc = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.sql.shuffle.partitions=4",
             "--py-files", zip_path,
             os.path.join(ROOT, "jobs", job), *args],
            capture_output=True, text=True, timeout=400,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(
            [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        )

    m = submit("curate_job.py", "--input", in_dir, "--output", out_dir,
               "--buckets", "4", "--snapshot", "base")
    assert m["curate"]["n_docs"] > 0

    inc_dir = str(tmp_path / "inc")
    novel = ("the observatory logged seventeen meteor trails over the dry "
             "lakebed and cross referenced each against the radio echoes "
             "captured by the northern array during the same interval")
    spark.createDataFrame(pd.DataFrame({
        "conv_id": ["cli_inc"],
        "turn_idx": pd.array([0], dtype="int32"),
        "role": ["user"], "text": [novel],
        "tool": pd.array([None], dtype="string"),
        "ts": pd.to_datetime(["2024-02-01 00:00:00"]),
    })).coalesce(1).write.parquet(inc_dir)
    mi = submit("curate_job.py", "--input", inc_dir, "--output", out_dir,
                "--buckets", "4", "--snapshot", "cli1", "--increment")
    assert mi["curate"]["n_docs"] == 1

    mv = submit("maintain_job.py", "vacuum", "--output", out_dir)
    assert mv["removed"]["curated_incr"] == ["cli1"]
    assert not os.path.exists(f"{out_dir}/curated_incr/snap=cli1")
