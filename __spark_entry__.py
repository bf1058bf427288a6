"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ingestion pipeline (validate → dedup →
window → batch → packet-split → headers) over the sf0.001 event stream mapped
to transcript turns and returns the batch-header manifest. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus the
training-data pipeline ops (dedup suite, similarity search, text analysis,
multimodal decode), each with a DuckDB oracle.

Exactly 50 entries, core-first: the driver's correctness gate records at
most 50 rows (round 3: 58 registered → 50 checked), so guarded quadratic
baselines and near-duplicate operator variants moved to
``queries.retired_registry()`` — same oracle gate, run by
``tests/test_retired_oracle.py`` instead of the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from exposure_notifications_private_analytics_ingestion_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _q.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _q.registry().items() if sql is not None
    }
