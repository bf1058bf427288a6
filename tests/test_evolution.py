"""Schema-evolution-tolerant reads (sources/evolution.py): mixed-schema
directories conform to the target schema in batch AND stream, widenings
cast, incompatible changes raise, extras survive on request."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exposure_notifications_private_analytics_ingestion_spark.model.schema import TURNS_SCHEMA
from exposure_notifications_private_analytics_ingestion_spark.sources import generate_turns
from exposure_notifications_private_analytics_ingestion_spark.sources.evolution import (
    SchemaEvolutionError,
    conform,
    conformed_stream_schema,
    read_turns_evolved,
)


def _mixed_dir(spark, tmp_path):
    """v1 files (no `tool`, int16 turn_idx), v2 files (canonical), v3 files
    (extra `model` column) in one directory."""
    path = str(tmp_path / "turns")
    pdf = generate_turns(n_convs=30, seed=3, hours=2, dup_frac=0.0)
    third = len(pdf) // 3

    v1 = pdf.iloc[:third].drop(columns=["tool"]).copy()
    v1["turn_idx"] = v1["turn_idx"].astype("int16")
    s1 = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.ShortType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    spark.createDataFrame(v1, schema=s1).coalesce(1).write.mode("append").parquet(path)

    v2 = pdf.iloc[third : 2 * third]
    spark.createDataFrame(v2, schema=TURNS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)

    v3 = pdf.iloc[2 * third :].copy()
    v3["model"] = "m-1"
    s3 = T.StructType(list(TURNS_SCHEMA.fields) + [T.StructField("model", T.StringType())])
    spark.createDataFrame(v3, schema=s3).coalesce(1).write.mode("append").parquet(path)
    return path, pdf


def test_read_turns_evolved_conforms(spark, tmp_path):
    path, pdf = _mixed_dir(spark, tmp_path)
    out = read_turns_evolved(spark, path)
    assert [f.name for f in out.schema.fields] == [f.name for f in TURNS_SCHEMA.fields]
    assert out.schema["turn_idx"].dataType == T.IntegerType()
    assert out.count() == len(pdf)
    # v1 rows: tool null-filled; v2/v3 rows keep their values
    third = len(pdf) // 3
    assert out.filter(F.col("tool").isNull()).count() == third
    # values survive the conform (spot-check a full column aggregate)
    assert (
        out.agg(F.sum("turn_idx")).collect()[0][0] == int(pdf["turn_idx"].sum())
    )


def test_keep_extra_surfaces_new_columns(spark, tmp_path):
    path, pdf = _mixed_dir(spark, tmp_path)
    out = read_turns_evolved(spark, path, keep_extra=True)
    assert "model" in out.columns
    n_v3 = len(pdf) - 2 * (len(pdf) // 3)
    assert out.filter(F.col("model") == "m-1").count() == n_v3


def test_incompatible_change_raises_with_column_name(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a"], "turn_idx": ["not-an-int"]})
    )
    with pytest.raises(SchemaEvolutionError, match="turn_idx"):
        conform(df)


def test_conform_widens_numerics(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1], "b": [2]})).select(
        F.col("a").cast("short"), F.col("b").cast("float")
    )
    target = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.DoubleType())]
    )
    out = conform(df, target=target)
    assert out.schema["a"].dataType == T.LongType()
    assert out.schema["b"].dataType == T.DoubleType()
    assert out.collect()[0][0] == 1


@pytest.mark.slow
def test_evolved_directory_streams(spark, tmp_path):
    """The conformed schema drives readStream over the mixed directory:
    per-file null-fill/prune is the parquet source's job under an explicit
    schema — every row arrives, v1 rows with tool=NULL."""
    path, pdf = _mixed_dir(spark, tmp_path)
    schema = conformed_stream_schema(spark, path)
    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.schema(schema)
        .parquet(path)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == len(pdf)
    assert got.filter(F.col("tool").isNull()).count() == len(pdf) // 3
