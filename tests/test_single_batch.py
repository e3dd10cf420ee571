"""One-pass (``single_batch=True``) mode — the reference's --no-incremental
(scripts/eval_kbp.py:773-785 concatenates every batch into one pass).

With an empty KB delta (a world with no NIL mentions → no new RW entities
between batches) the one-pass triples must equal the incremental triples,
and the one-pass run must emit exactly one lineage row."""

import json

from pyspark.sql import functions as F

from incremental_entity_extraction_spark.fixtures import make_world
from incremental_entity_extraction_spark.pipeline import Lake, run_incremental


def _triples(spark, lake):
    pdf = spark.read.parquet(lake.path("triples")).toPandas()
    return set(map(tuple, pdf[["subj", "pred", "obj"]].itertuples(index=False)))


def test_one_pass_matches_incremental_when_kb_delta_empty(spark, cfg, tmp_path):
    world = make_world(cfg, n_convs=8, nil_frac=0.0, n_batches=3)
    tx = spark.createDataFrame(world.transcripts)
    kb = spark.createDataFrame(world.entities_kb)

    lake_inc = Lake(str(tmp_path / "inc"))
    stats_inc = run_incremental(
        spark, tx, kb, lake_inc, cfg, cluster_mode="greedy_replay"
    )
    assert len(stats_inc) == 3  # incremental run saw every batch

    lake_one = Lake(str(tmp_path / "one"))
    stats_one = run_incremental(
        spark, tx, kb, lake_one, cfg, cluster_mode="greedy_replay",
        single_batch=True,
    )

    # premise check: the KB delta really is empty in this world (the table
    # is absent entirely when no RW entity was ever discovered)
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        ne_count = spark.read.parquet(lake_inc.path("new_entities")).count()
    except AnalysisException:
        ne_count = 0
    assert ne_count == 0

    # exactly one pass, one lineage row, batch_id folded to 0
    assert [s["batch_id"] for s in stats_one] == [0]
    lines = [
        ln for ln in open(lake_one.lineage_path()).read().strip().split("\n") if ln
    ]
    assert len(lines) == 1
    assert json.loads(lines[0])["batch_id"] == 0

    assert _triples(spark, lake_one) == _triples(spark, lake_inc)

    # the one-pass triples table has a single batch partition
    one_batches = (
        spark.read.parquet(lake_one.path("triples"))
        .select("batch_id").distinct().collect()
    )
    assert [r["batch_id"] for r in one_batches] == [0]


def test_one_pass_resume_is_noop(spark, cfg, tmp_path):
    world = make_world(cfg, n_convs=4, nil_frac=0.0, n_batches=2)
    tx = spark.createDataFrame(world.transcripts)
    kb = spark.createDataFrame(world.entities_kb)
    lake = Lake(str(tmp_path / "lake"))
    run_incremental(
        spark, tx, kb, lake, cfg, cluster_mode="greedy_replay", single_batch=True
    )
    again = run_incremental(
        spark, tx, kb, lake, cfg, cluster_mode="greedy_replay", single_batch=True
    )
    assert again == []  # batch 0 already complete — nothing re-runs
