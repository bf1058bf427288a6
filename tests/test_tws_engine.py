"""transformWithState engine: runs fully on clusters with protobuf; in this
container the protocol dependency is absent, so we assert the construction
path + the clear gating error, and (when available) engine output equality."""

from __future__ import annotations

import pytest

from exposure_notifications_private_analytics_ingestion_spark.streaming.ingest_stream import (
    StreamOptions,
)
from exposure_notifications_private_analytics_ingestion_spark.streaming.tws_assembler import (
    BatchAssemblyProcessor,
    closed_batches_stream_tws,
    tws_available,
)


def test_processor_emit_contract():
    # pure-python check of the emit path: ids match the uuid5 contract
    import uuid

    from exposure_notifications_private_analytics_ingestion_spark.functions.hashing import (
        NAMESPACE,
    )

    p = BatchAssemblyProcessor(batch_size=2, window_s=3600)
    out = p._new_out()
    entry = (0, {1, 2}, [1, 2], ["a", "b"], [1000, 2000])
    new_entry = p._emit("conv-x", 1704067200, entry, "size", out)
    assert new_entry[0] == 1 and new_entry[2] == []
    assert out["batch_id"][0] == str(uuid.uuid5(NAMESPACE, "conv-x|1704067200|0"))
    assert out["close_reason"] == ["size", "size"]


@pytest.mark.skipif(tws_available(), reason="protobuf present: run the real engine test below instead")
def test_gating_error_without_protobuf(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="protobuf"):
        closed_batches_stream_tws(spark, str(tmp_path), StreamOptions())


@pytest.mark.skipif(not tws_available(), reason="protobuf absent in this container")
def test_engines_agree(spark, tmp_path):
    """On protobuf-equipped clusters: packet-level equality of the two engines."""
    import pandas as pd
    from datetime import datetime, timezone

    from exposure_notifications_private_analytics_ingestion_spark.model.schema import (
        TURNS_SCHEMA,
    )
    from exposure_notifications_private_analytics_ingestion_spark.streaming.ingest_stream import (
        closed_batches_stream,
    )

    JAN = 1704067200
    rows = [
        {"conv_id": "a", "turn_idx": i, "role": "u", "text": f"t{i}", "tool": "",
         "ts": datetime.fromtimestamp(JAN + i, tz=timezone.utc).replace(tzinfo=None)}
        for i in range(23)
    ]
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    inp = str(tmp_path / "in")
    spark.createDataFrame(pdf, schema=TURNS_SCHEMA).write.parquet(inp)
    outs = []
    for name, builder in (("aip", closed_batches_stream), ("tws", closed_batches_stream_tws)):
        q = (
            builder(spark, inp, StreamOptions(batch_size=10))
            .writeStream.format("memory").queryName(f"eq_{name}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(240)
        outs.append(
            spark.sql(
                f"select conv_id, turn_idx, batch_id, batch_ordinal from eq_{name}"
            ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
