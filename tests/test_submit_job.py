"""The north rule's deployment path: the extraction job launched through a
REAL ``spark-submit --py-files <zip>`` (package imported from the zip, not
the working tree), committing through the MERGE sink with sidecars."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_job(spark, tmp_path):
    from deepseek_ocr_rs_spark.sources.transcripts import generate_local

    transcripts, fixtures = generate_local(spark, 6, seed=9, skew_every=0)
    src = str(tmp_path / "in")
    transcripts.write.parquet(src)
    total = transcripts.count()

    # package the library exactly as a cluster submit would
    zip_path = str(tmp_path / "pyfiles.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "deepseek_ocr_rs_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH"
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "extract_job.py"),
            "--input", src, "--output", out_dir,
            "--run-id", "submit-smoke", "--partitions", "4",
        ],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),  # NOT the repo root: imports must come from zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows_written"] == total
    assert summary["quarantined"] == 0

    out = spark.read.parquet(out_dir).drop("bucket")
    assert out.count() == total
    # per-turn text equality vs golden fixtures through the submitted job
    j = out.alias("a").join(fixtures.alias("e"), ["conv_id", "turn_idx"])
    from pyspark.sql import functions as F

    assert j.count() == total
    assert j.where(
        ~F.col("a.text_md").eqNullSafe(F.col("e.text_md"))).count() == 0
    # sidecars landed next to the sink
    assert spark.read.parquet(out_dir + "_metrics").count() > 0
    assert spark.read.parquet(out_dir + "_lineage").count() > 0
