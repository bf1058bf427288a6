"""Oracle certification for the RETIRED registry entries.

The driver's correctness gate records at most 50 rows, so the guarded
quadratic baselines and near-duplicate operator variants were moved out of
the driver-facing ``registry()`` into ``retired_registry()``. This suite
keeps them held to the SAME standard the driver applies — DuckDB oracle
comparison on rows + order-insensitive value hash over name-sorted columns —
at sf0.001, so "retired from the driver budget" never degrades into
"untested".
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from exposure_notifications_private_analytics_ingestion_spark.queries import (  # noqa: E402
    registry,
    retired_registry,
)
from tools.oracle_check import TABLES, norm_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_registry_fits_driver_budget():
    """Exactly 50 driver-checked entries, disjoint from the retired set,
    and every entry SQL-oracled (no rows-only checks left in the budget)."""
    reg, ret = registry(), retired_registry()
    assert len(reg) == 50
    assert len(ret) == 8
    assert not set(reg) & set(ret)
    assert all(sql is not None for _fn, sql in reg.values())
    assert all(sql is not None for _fn, sql in ret.values())


@pytest.mark.parametrize("name", sorted(retired_registry()))
def test_retired_query_matches_oracle(spark, oracle, name):
    fn, sql = retired_registry()[name]
    spdf = fn(spark, SF_DIR).toPandas()
    opdf = oracle.execute(sql).df()
    sn, ss, sh = norm_hash(spdf)
    on, _os, oh = norm_hash(opdf)
    assert sn == on, f"{name}: row count {sn} != oracle {on}"
    assert sh == oh, f"{name}: value hash mismatch (spark schema {ss})"
