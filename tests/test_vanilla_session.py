"""Regression gate for session-robustness: every registry query must run
under a *vanilla* SparkSession (no confs from our session factory), because
the driver's correctness harness builds one.  Round-1 lesson: Spark 4 infers
parquet timestamps as TIMESTAMP_NTZ by default and 7 queries broke only under
the driver's session (VERDICT.md round 1, "What's wrong" #1).
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from exposure_notifications_private_analytics_ingestion_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vanilla_spark(spark):
    # Reuse the shared JVM but strip the session-level confs our factory set,
    # mimicking the driver's fresh builder.getOrCreate().
    s = spark.newSession()
    for key in (
        "spark.sql.parquet.inferTimestampNTZ.enabled",
        "spark.sql.session.timeZone",
    ):
        s.conf.unset(key)
    return s


def test_every_registry_query_runs_vanilla(vanilla_spark):
    reg = q.registry()
    failures = {}
    for name, (fn, _sql) in reg.items():
        try:
            n = fn(vanilla_spark, SF_DIR).count()
            assert n >= 0
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
    assert not failures, f"queries broken under vanilla session: {failures}"


def test_entry_runs_vanilla(vanilla_spark):
    import __spark_entry__ as entry

    df = entry.entry(vanilla_spark)
    assert df.count() >= 0
