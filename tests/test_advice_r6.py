"""Round-5 ADVICE regressions on the avro-manifest fast path:

1. An EMPTY window run must not clobber the whole ``avro_manifest``
   directory — earlier windows' containers stay readable through the fast
   path afterwards (ADVICE r5 #1).
2. The manifest fast path must only engage when the manifest actually
   describes files under the requested root; a container tree copied
   together with its manifest decodes the COPY (via the directory-scan
   fallback), not the original tree (ADVICE r5 #2).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
    TURNS_SCHEMA,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.ingestion import (
    IngestionOptions,
    run_ingestion,
)
from exposure_notifications_private_analytics_ingestion_spark.sources import (
    generate_turns,
)
from exposure_notifications_private_analytics_ingestion_spark.sources.avro_packets import (
    read_packet_containers,
)

WINDOW = 1704067200  # 2024-01-01T00:00:00Z — matches generate_turns' clock


@pytest.fixture()
def ingested(spark):
    tmp = tempfile.mkdtemp(prefix="enpa-advice6-")
    pdf = generate_turns(n_convs=40, seed=3, hours=2, dup_frac=0.0)
    spark.createDataFrame(pdf, schema=TURNS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/turns")
    run_ingestion(
        spark,
        f"{tmp}/turns",
        f"{tmp}/out",
        IngestionOptions(
            window_start_s=WINDOW,
            duration_s=6 * 3600,
            batch_size=20,
            emit_avro_containers=True,
        ),
    )
    yield spark, tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_empty_window_preserves_prior_manifest(ingested):
    spark, tmp = ingested
    n_before = read_packet_containers(spark, f"{tmp}/out/avro").count()
    assert n_before > 0
    # a later, fully-out-of-window run: zero surviving turns
    run_ingestion(
        spark,
        f"{tmp}/turns",
        f"{tmp}/out",
        IngestionOptions(
            window_start_s=WINDOW + 365 * 86400,
            duration_s=3600,
            batch_size=20,
            emit_avro_containers=True,
        ),
    )
    # the first window's containers are still on disk AND still visible —
    # before the fix the empty run replaced avro_manifest with one empty
    # file and the fast path silently returned zero packets
    assert read_packet_containers(spark, f"{tmp}/out/avro").count() == n_before


def test_copied_tree_decodes_the_copy_not_the_original(ingested):
    spark, tmp = ingested
    n = read_packet_containers(spark, f"{tmp}/out/avro").count()
    copy_root = f"{tmp}/copied"
    shutil.copytree(f"{tmp}/out", copy_root)
    # the copied manifest names the ORIGINAL tree's absolute paths → the
    # reader must fall back to scanning the named path, not decode ghosts
    assert read_packet_containers(spark, f"{copy_root}/avro").count() == n
    # ... and deleting the original must not break reading the copy
    shutil.rmtree(f"{tmp}/out")
    assert read_packet_containers(spark, f"{copy_root}/avro").count() == n
    # the original location is gone: reading it now fails loudly (scan of a
    # missing dir), never silently serves the copy
    with pytest.raises(Exception):
        read_packet_containers(spark, f"{tmp}/out/avro").count()


def test_fast_path_still_engages_in_place(ingested, monkeypatch):
    """The guard must not disable the fast path for the normal in-place
    layout (the 33 s listing win it exists for)."""
    import exposure_notifications_private_analytics_ingestion_spark.sources.avro_packets as ap

    spark, tmp = ingested
    called = {}
    real = ap._read_via_manifest

    def spy(s, m):
        called["manifest"] = m
        return real(s, m)

    monkeypatch.setattr(ap, "_read_via_manifest", spy)
    assert ap.read_packet_containers(spark, f"{tmp}/out/avro").count() > 0
    assert called, "manifest fast path should engage for the writer's own layout"
