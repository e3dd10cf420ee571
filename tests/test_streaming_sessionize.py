"""Stateful streaming sessionization: state must carry an open session
across micro-batches and close it on a gap arriving in a LATER trigger;
windowed counts must match a batch groupBy on the same finite input."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.streaming.sessionize import (
    sessionize_stream,
    windowed_event_counts,
)

EVENT_DDL = "user_id long, event_id long, event_type string, ts timestamp"

T0 = pd.Timestamp("2026-01-01 00:00:00")


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "event_type", "ts"])
    pdf.to_parquet(path, coerce_timestamps="us")


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    s = pd.Timedelta(seconds=1)
    # file 0: user 1 opens a session (2 events, 10 s apart); user 2 one event
    _write(
        d / "f0.parquet",
        [
            (1, 1, "click", T0),
            (1, 2, "click", T0 + 10 * s),
            (2, 3, "view", T0 + 5 * s),
        ],
    )
    # file 1 (NEXT micro-batch): user 1 event 4000 s later -> closes session 1;
    # user 2 event inside the gap -> still open, never emitted
    _write(
        d / "f1.parquet",
        [
            (1, 4, "click", T0 + 4010 * s),
            (2, 5, "view", T0 + 100 * s),
        ],
    )
    return str(d)


def test_session_state_spans_micro_batches(spark, stream_dir, tmp_path):
    stream = (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    sessions = sessionize_stream(stream, gap_s=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM sess_out").toPandas()
    # exactly ONE closed session: user 1's first (2 events, 10 s long),
    # closed by the gap event that arrived in the SECOND micro-batch
    assert len(out) == 1
    row = out.iloc[0]
    t0 = int(T0.timestamp())
    assert (
        row["user_id"],
        row["session_start"],
        row["session_end"],
        row["n_events"],
    ) == (1, t0, t0 + 10, 2)


def test_windowed_counts_match_batch(spark, stream_dir, tmp_path):
    stream = (
        spark.readStream.schema(EVENT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    counts = windowed_event_counts(stream, window="10 minutes", watermark="1 minute")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT window_start, event_type, n FROM win_out")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    batch = spark.read.schema(EVENT_DDL).parquet(stream_dir)
    want = (
        windowed_event_counts(batch.withColumn("ts", F.col("ts")))
        .select("window_start", "event_type", "n")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
