"""Structured Streaming incremental run == batch incremental run."""

import pandas as pd
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.pipeline import Lake, run_incremental
from incremental_entity_extraction_spark.streaming import run_streaming_incremental


def _triples(spark, lake):
    df = spark.read.parquet(lake.path("triples")).toPandas()
    return set(map(tuple, df[["subj", "pred", "obj"]].itertuples(index=False)))


def test_streaming_equals_batch(spark, spark_world, world, cfg, tmp_path):
    # batch reference run
    batch_lake = Lake(str(tmp_path / "batch_lake"))
    run_incremental(
        spark, spark_world["transcripts"], spark_world["entities_kb"],
        batch_lake, cfg, cluster_mode="greedy_replay",
    )
    expected = _triples(spark, batch_lake)

    # stream source: one parquet file per batch_id (arrival order = batch order)
    src = str(tmp_path / "stream_src")
    for b in sorted(world.transcripts["batch_id"].unique()):
        spark_world["transcripts"].filter(F.col("batch_id") == int(b)).coalesce(
            1
        ).write.mode("append").parquet(src)

    stream_lake = Lake(str(tmp_path / "stream_lake"))
    run_streaming_incremental(
        spark, src, spark_world["entities_kb"], stream_lake, cfg,
        cluster_mode="greedy_replay",
    )
    assert _triples(spark, stream_lake) == expected
    assert stream_lake.completed_batches() == set(
        int(b) for b in world.transcripts["batch_id"].unique()
    )
