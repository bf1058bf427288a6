"""Local stand-in for the driver's correctness gate: run each registry query
in Spark and its oracle SQL in DuckDB, compare row count + order-insensitive
value hash (columns sorted by name, rows sorted, values stringified).

Usage: python tools/oracle_check.py [sf_dir] [query ... | --all]

Checks the driver-facing 50-entry ``registry()`` by default; naming a
retired query (or passing ``--all``) pulls from ``retired_registry()`` too.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_hash(pdf: pd.DataFrame) -> tuple[int, str, str]:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype == object and len(col) and isinstance(col.dropna().iloc[0] if col.notna().any() else None, (bytes, bytearray)):
            pdf[c] = col.map(lambda b: b.hex() if isinstance(b, (bytes, bytearray)) else None)
        elif str(col.dtype).startswith("float"):
            pdf[c] = col.round(6)
    if len(pdf):
        rows = pdf.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values()
    else:
        rows = pd.Series([], dtype=str)
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    schema = ",".join(f"{c}:{pdf[c].dtype}" for c in sorted(pdf.columns))
    return len(pdf), schema, h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from exposure_notifications_private_analytics_ingestion_spark.queries import (
        registry,
        extended_registry,
        retired_registry,
    )

    # Deliberately a VANILLA session (not our session factory): the driver's
    # harness builds one too, so session-dependent behavior must surface here.
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    check_all = "--all" in only
    only -= {"--all"}
    todo = dict(registry())
    if check_all:
        todo.update(retired_registry())
        todo.update(extended_registry())
    elif only:
        full = {**registry(), **retired_registry(), **extended_registry()}
        todo = {n: full[n] for n in only if n in full}

    ok = fail = skip = 0
    for name, (fn, sql) in todo.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            fail += 1
            continue
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(spdf)} rows)")
            skip += 1
            continue
        try:
            opdf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {str(e)[:300]}")
            fail += 1
            continue
        sn, ss, sh = norm_hash(spdf)
        on, os_, oh = norm_hash(opdf)
        if sn == on and sh == oh:
            print(f"OK   {name}: {sn} rows, hash {sh}")
            ok += 1
        else:
            print(f"FAIL {name}: spark({sn},{sh}) vs oracle({on},{oh})")
            print(f"     spark schema:  {ss}")
            print(f"     oracle schema: {os_}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {skip} rows-only")
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
