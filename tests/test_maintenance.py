"""Lake small-file compaction (operators/maintenance.py): content identity,
file-count reduction, idempotency, half-swap recovery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.operators.maintenance import (
    _data_files,
    compact_lake_table,
)
from incremental_entity_extraction_spark.pipeline import Lake


@pytest.fixture()
def fragmented_lake(spark, tmp_path):
    """A lake table whose partitions were written in many small files —
    the shape an incremental/streaming writer produces."""
    lake = Lake(str(tmp_path / "lake"))
    df = spark.range(0, 4000).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("batch_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    lake.write_partition(df.repartition(16), "rows")
    return lake


def _table_pdf(spark, lake):
    return (
        spark.read.parquet(lake.path("rows"))
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )


def _file_count(lake):
    root = lake.path("rows")
    return sum(
        len(_data_files(os.path.join(root, d)))
        for d in os.listdir(root)
        if "=" in d and os.path.isdir(os.path.join(root, d))
    )


def test_compaction_preserves_rows_and_reduces_files(spark, fragmented_lake):
    before = _table_pdf(spark, fragmented_lake)
    n_files_before = _file_count(fragmented_lake)
    assert n_files_before >= 32  # 4 partitions × many small files
    # fresh partitions are in-flight: the default retention window skips them
    assert compact_lake_table(spark, fragmented_lake, "rows")[
        "partitions_compacted"
    ] == 0
    stats = compact_lake_table(
        spark, fragmented_lake, "rows", older_than_seconds=0
    )
    assert stats["partitions_compacted"] == 4
    assert stats["files_after"] == 4  # tiny partitions -> one file each
    assert _file_count(fragmented_lake) == 4
    after = _table_pdf(spark, fragmented_lake)
    assert before.equals(after)  # identical rows, identical schema


def test_compaction_is_idempotent(spark, fragmented_lake):
    compact_lake_table(spark, fragmented_lake, "rows", older_than_seconds=0)
    stats2 = compact_lake_table(
        spark, fragmented_lake, "rows", older_than_seconds=0
    )
    assert stats2["partitions_compacted"] == 0
    assert stats2["files_before"] == stats2["files_after"] == 4


def test_compaction_skips_right_sized_partitions(spark, fragmented_lake):
    # absurdly small target: every existing file already exceeds it, so the
    # file count can't be reduced and nothing should be rewritten
    stats = compact_lake_table(
        spark, fragmented_lake, "rows", target_file_bytes=1,
        older_than_seconds=0,
    )
    assert stats["partitions_compacted"] == 0


def test_half_swap_recovery(spark, fragmented_lake):
    """Simulate a crash between the two swap renames: the live partition
    dir is gone and .compact_old_ holds the data — the next call must
    restore it before compacting."""
    root = fragmented_lake.path("rows")
    part = "batch_id=2"
    os.rename(
        os.path.join(root, part), os.path.join(root, f".compact_old_{part}")
    )
    # fresh partitions are in-flight: the default retention window skips them
    assert compact_lake_table(spark, fragmented_lake, "rows")[
        "partitions_compacted"
    ] == 0
    stats = compact_lake_table(
        spark, fragmented_lake, "rows", older_than_seconds=0
    )
    assert stats["partitions_compacted"] == 4
    pdf = _table_pdf(spark, fragmented_lake)
    assert len(pdf) == 4000
    assert sorted(pdf["batch_id"].unique()) == [0, 1, 2, 3]


def test_missing_table_is_noop(spark, tmp_path):
    lake = Lake(str(tmp_path / "empty_lake"))
    stats = compact_lake_table(spark, lake, "rows")
    assert stats == {
        "partitions_compacted": 0,
        "files_before": 0,
        "files_after": 0,
        "bytes_total": 0,
    }


def test_vacuum_removes_only_uncompleted_partitions(spark, tmp_path):
    """Partitions from a crashed batch (written, never marked in lineage)
    are removed; completed partitions and the lineage survive."""
    from incremental_entity_extraction_spark.operators.maintenance import (
        vacuum_lake,
    )

    lake = Lake(str(tmp_path / "lake"))
    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("batch_id")
    )
    lake.write_partition(df, "rows")
    # batches 0 and 1 completed; batch 2 "crashed" before mark_complete
    lake.mark_complete(0, {})
    lake.mark_complete(1, {})
    # retention guard: freshly-written partitions are in-flight, untouchable
    assert vacuum_lake(lake) == {}
    removed = vacuum_lake(lake, older_than_seconds=0)
    assert removed == {"rows": [2]}
    pdf = spark.read.parquet(lake.path("rows")).toPandas()
    assert sorted(pdf["batch_id"].unique()) == [0, 1]
    assert len(pdf) == 200
    assert lake.completed_batches() == {0, 1}
    # idempotent
    assert vacuum_lake(lake, older_than_seconds=0) == {}


def test_vacuum_on_empty_lake_is_noop(tmp_path):
    from incremental_entity_extraction_spark.operators.maintenance import (
        vacuum_lake,
    )

    assert vacuum_lake(Lake(str(tmp_path / "nothing"))) == {}


def test_vacuum_refuses_without_lineage(spark, fragmented_lake, tmp_path):
    """A lake with data but NO lineage file (copied/mounted without it)
    must not be interpreted as 'nothing ever completed' — vacuum does
    nothing rather than destroy every partition."""
    from incremental_entity_extraction_spark.operators.maintenance import (
        vacuum_lake,
    )

    assert vacuum_lake(fragmented_lake, older_than_seconds=0) == {}
    assert len(_table_pdf(spark, fragmented_lake)) == 4000


def test_compaction_between_runs_preserves_resume(spark, spark_world, tmp_path):
    """Maintenance between incremental runs must be invisible to the
    pipeline: compact every table after a partial run, then resume — the
    final triples must equal an uninterrupted run's."""
    from pyspark.sql import functions as F

    from incremental_entity_extraction_spark.config import DEFAULT_CONFIG as cfg
    from incremental_entity_extraction_spark.operators.maintenance import (
        compact_lake_table,
    )
    from incremental_entity_extraction_spark.pipeline import run_incremental

    def _triples(lake):
        pdf = spark.read.parquet(lake.path("triples")).toPandas()
        return set(map(tuple, pdf[["subj", "pred", "obj"]].itertuples(index=False)))

    full = Lake(str(tmp_path / "full"))
    run_incremental(
        spark, spark_world["transcripts"], spark_world["entities_kb"], full,
        cfg, cluster_mode="cc",
    )

    part = Lake(str(tmp_path / "part"))
    run_incremental(
        spark,
        spark_world["transcripts"].filter(F.col("batch_id") <= 1),
        spark_world["entities_kb"], part, cfg, cluster_mode="cc",
    )
    for t in ("mentions", "triples", "new_entities", "prev_clusters"):
        compact_lake_table(spark, part, t, older_than_seconds=0)
    stats = run_incremental(
        spark, spark_world["transcripts"], spark_world["entities_kb"], part,
        cfg, cluster_mode="cc",
    )
    assert [s["batch_id"] for s in stats] == [2, 3]
    assert _triples(part) == _triples(full)


def test_object_store_paths_are_refused(spark):
    """The two-rename swap is atomic only under POSIX rename(2); an
    object-store lake must be refused loudly, not silently made
    crash-unsafe (the real fix there is a manifest-pointer commit —
    see maintenance._assert_posix_rename)."""
    import pytest

    from incremental_entity_extraction_spark.operators.maintenance import (
        compact_lake_table,
        vacuum_lake,
    )
    from incremental_entity_extraction_spark.pipeline import Lake

    s3_lake = Lake("s3a://bucket/lake")
    with pytest.raises(NotImplementedError, match="object store"):
        compact_lake_table(spark, s3_lake, "rows")
    with pytest.raises(NotImplementedError, match="object store"):
        vacuum_lake(s3_lake)
