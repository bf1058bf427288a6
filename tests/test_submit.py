"""North-rule launch contract: spark-submit --py-files.

Builds the dist zip, then runs a REAL ``spark-submit --master local[4]
--py-files enpa_spark.zip tools/submit_job.py ingest ...`` from a scratch
cwd so the engine package can only come from the zip — proving the packaged
artifact is complete (no test-only imports, no repo-cwd dependence) and the
CLI window plumbing works under the cluster launcher.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from exposure_notifications_private_analytics_ingestion_spark.model.schema import (  # noqa: E402
    TURNS_SCHEMA,
)
from exposure_notifications_private_analytics_ingestion_spark.sources import (  # noqa: E402
    generate_turns,
)
from tools.build_pyfiles import build  # noqa: E402

SPARK_SUBMIT = shutil.which("spark-submit")


def test_pyfiles_zip_is_complete_and_deterministic(tmp_path):
    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    assert Path(z1).read_bytes() == Path(z2).read_bytes()
    names = zipfile.ZipFile(z1).namelist()
    pkg = "exposure_notifications_private_analytics_ingestion_spark"
    assert f"{pkg}/cli.py" in names
    assert f"{pkg}/streaming/ingest_stream.py" in names
    assert not any("__pycache__" in n or "/tests/" in n for n in names)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_ingest_end_to_end(spark, tmp_path):
    # input: a deterministic hour of transcript turns, written by the
    # session-fixture Spark (the subprocess gets its own JVM)
    pdf = generate_turns(n_convs=200, seed=3, hours=1, dup_frac=0.05)
    spark.createDataFrame(pdf, schema=TURNS_SCHEMA).coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "turns"))
    window_start = int(pdf["ts"].min().timestamp()) // 3600 * 3600

    zip_path = build(str(tmp_path / "enpa_spark.zip"))
    launcher = tmp_path / "submit_job.py"
    shutil.copy(REPO / "tools" / "submit_job.py", launcher)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            str(launcher),
            "ingest",
            "--input", str(tmp_path / "turns"),
            "--output", str(tmp_path / "out"),
            "--window-start", str(window_start),
            "--duration", "3600",
            "--batch-size", "500",
        ],
        cwd=str(tmp_path),  # package resolvable ONLY via the --py-files zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the CLI prints one JSON status line
    status = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            status = json.loads(line)
    assert status is not None and status["window_start"] == window_start

    packets = pd.read_parquet(tmp_path / "out" / "packets")
    headers = pd.read_parquet(tmp_path / "out" / "batch_headers")
    assert len(packets) > 0 and len(headers) > 0
    # exactly-once per (turn, destination) in the submitted run too
    dup = packets.groupby(["conv_id", "turn_idx", "destination"]).size()
    assert int(dup.max()) == 1
