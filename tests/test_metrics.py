"""E1-E7 evaluation operators: hand-computed cases + fixture integration."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.evaluation.assignment import (
    linear_sum_assignment_max,
    linear_sum_assignment_min,
)
from incremental_entity_extraction_spark.evaluation.metrics import (
    assemble_report,
    b3_scores,
    ceaf_e_score,
    coref_metrics_per_batch,
    join_gold,
    linking_recall_at_k,
    muc_score,
    nil_confusion,
    overall_accuracy,
)


def test_hungarian_min_small():
    cost = np.array([[4, 1, 3], [2, 0, 5], [3, 2, 2]])
    r, c = linear_sum_assignment_min(cost)
    assert cost[r, c].sum() == 5  # 1 + 2 + 2
    r, c = linear_sum_assignment_max(np.array([[1, 2], [3, 4]]))
    # max: 2 + 3 = 5
    assert np.array([[1, 2], [3, 4]])[r, c].sum() == 5


def test_hungarian_rectangular():
    cost = np.array([[1, 2, 3], [3, 1, 2]])
    r, c = linear_sum_assignment_min(cost)
    assert len(r) == 2
    assert cost[r, c].sum() == 2


def test_muc_identical_and_disjoint():
    part = [{"a", "b"}, {"c", "d", "e"}]
    p, r, f = muc_score(part, part)
    assert (p, r, f) == (1.0, 1.0, 1.0)
    # all singletons predicted: no links -> recall 0
    p, r, f = muc_score([{"a"}, {"b"}, {"c"}], [{"a", "b", "c"}])
    assert r == 0.0


def test_muc_vilain_example():
    # gold {a,b,c,d}, pred {a,b},{c,d}: recall = (4-2)/(4-1) = 2/3
    p, r, f = muc_score([{"a", "b"}, {"c", "d"}], [{"a", "b", "c", "d"}])
    assert abs(r - 2 / 3) < 1e-9
    assert p == 1.0


def test_ceaf_e_identical():
    part = [{"a", "b"}, {"c"}]
    p, r, f = ceaf_e_score(part, part)
    assert (p, r, f) == (1.0, 1.0, 1.0)
    # pred splits one gold cluster
    p, r, f = ceaf_e_score([{"a"}, {"b"}], [{"a", "b"}])
    # best phi4 = 2*1/(2+1) = 2/3; precision = (2/3)/2, recall = (2/3)/1
    assert abs(p - 1 / 3) < 1e-9 and abs(r - 2 / 3) < 1e-9


def test_b3_hand_case(spark):
    # batch 0: mentions m1,m2 same pred cluster; gold says m1,m2 different
    pdf = pd.DataFrame(
        {
            "batch_id": [0, 0],
            "mention_id": ["m1", "m2"],
            "pred_cluster": ["c1", "c1"],
            "gold_cluster": ["g1", "g2"],
        }
    )
    out = b3_scores(spark.createDataFrame(pdf)).toPandas()
    # per-mention precision = 1/2 each, recall = 1 each
    assert abs(out["b3_precision"][0] - 0.5) < 1e-9
    assert abs(out["b3_recall"][0] - 1.0) < 1e-9


@pytest.fixture(scope="module")
def fixture_eval(spark, spark_world, world, cfg, tmp_path_factory):
    """Run the pipeline once and join gold for the metric integration tests."""
    from incremental_entity_extraction_spark.pipeline import Lake, run_incremental

    lake = Lake(str(tmp_path_factory.mktemp("metrics_lake")))
    run_incremental(
        spark, spark_world["transcripts"], spark_world["entities_kb"], lake, cfg,
        cluster_mode="greedy_replay", persist_candidates=True,
    )
    gold = spark.createDataFrame(world.gold_mentions)
    # eval consumes the persisted enriched mention table (the reference
    # evaluates the per-batch pickled outdata the same way); the full
    # candidate lists live in the opt-in `candidates` table
    nil_scored = spark.read.parquet(lake.path("mentions")).join(
        spark.read.parquet(lake.path("candidates")).select(
            "mention_id", "candidates"
        ),
        "mention_id",
    )
    return join_gold(nil_scored, gold).localCheckpoint(), lake


def test_linking_recall_on_fixture(fixture_eval, cfg):
    with_gold, _ = fixture_eval
    out = linking_recall_at_k(with_gold, cfg).toPandas()
    # featurizer links perfectly on the fixture at k=10 (batch 0 has no RW
    # entities yet; all batches >= 0.95 at k=1 by construction)
    assert (out["recall_at_10"] >= 0.99).all()
    assert out["n_not_nil"].sum() > 0


def test_nil_confusion_on_fixture(fixture_eval):
    with_gold, _ = fixture_eval
    out = nil_confusion(with_gold).toPandas()
    # batch 0: no (gold=False, pred=True) false-NILs on the fixture
    b0 = out[(out.batch_id == 0) & (~out.gold) & out.pred]
    assert b0.empty or b0["n"].sum() == 0


def test_overall_accuracy_on_fixture(fixture_eval):
    with_gold, _ = fixture_eval
    out = overall_accuracy(with_gold).toPandas()
    assert (out["overall_accuracy"] >= 0.95).all()
    # incremental credit shows up after batch 0
    assert out[out.batch_id > 0]["linked_prev_added"].sum() > 0


def test_overall_accuracy_respects_rw_indexer_config(fixture_eval, cfg):
    """The linked-to-discovered category must follow cfg.rw_indexer_id, not a
    hardcoded constant: with a wrong indexer id the incremental credit
    disappears and accuracy drops."""
    from dataclasses import replace

    with_gold, _ = fixture_eval
    right = overall_accuracy(with_gold, cfg).toPandas()
    wrong = overall_accuracy(with_gold, replace(cfg, rw_indexer_id=999)).toPandas()
    assert right[right.batch_id > 0]["linked_prev_added"].sum() > 0
    assert wrong["linked_prev_added"].sum() == 0
    assert (
        wrong["overall_accuracy"].mean() < right["overall_accuracy"].mean()
    )


def test_b3_and_coref_on_fixture(fixture_eval, spark, world):
    """NIL cluster assignments vs gold entity ids as gold clusters."""
    _, lake = fixture_eval
    clusters = spark.read.parquet(lake.path("prev_clusters"))
    assigned = clusters.select(
        "batch_id", F.explode("mentions_id").alias("mention_id"),
        F.col("index_id").alias("pred_cluster"),
    )
    gold = spark.createDataFrame(
        world.gold_mentions.assign(
            mention_id=lambda d: d.conv_id + ":" + d.turn_idx.astype(str) + ":" + d.start_tok.astype(str)
        )[["mention_id", "Wikipedia_ID"]]
    ).withColumnRenamed("Wikipedia_ID", "gold_cluster")
    assignments = assigned.join(gold, "mention_id", "inner")
    b3 = b3_scores(assignments).toPandas()
    assert (b3["b3_precision"] >= 0.95).all()
    coref = coref_metrics_per_batch(assignments)
    assert (coref["ceaf_e_f1"] >= 0.9).all()
    report = assemble_report(coref)
    assert report.iloc[-1]["batch_id"] == -1
