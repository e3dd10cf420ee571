"""Tour of the round-2 surface: catalogue ingest, IVF retrieval mode,
KB tombstones, NIL-model training, and the CoNLL bridge.

Run: python examples/try_round2_features.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from incremental_entity_extraction_spark.config import DEFAULT_CONFIG as cfg
from incremental_entity_extraction_spark.fixtures import make_world
from incremental_entity_extraction_spark.operators.catalogue import (
    ingest_entity_catalogue,
)
from incremental_entity_extraction_spark.operators.nil_training import fit_nil_model
from incremental_entity_extraction_spark.pipeline import Lake, run_incremental
from incremental_entity_extraction_spark.session import get_spark


def main() -> None:
    spark = get_spark(cores=8, app_name="round2-tour", shuffle_partitions=8)
    w = make_world(cfg, n_convs=8)
    transcripts = spark.createDataFrame(w.transcripts)
    kb = spark.createDataFrame(w.entities_kb)

    # 1. catalogue ingest (S2): jsonl -> retrieval-ready KB
    cat_dir = tempfile.mkdtemp(prefix="cat_")
    with open(f"{cat_dir}/entity.jsonl", "w") as f:
        for i, title in enumerate(["alpha beta", "gamma delta"]):
            f.write(
                json.dumps(
                    {
                        "idx": f"https://en.wikipedia.org/wiki?curid={100 + i}",
                        "title": title,
                        "text": f"description of {title}",
                    }
                )
                + "\n"
            )
    ingested = ingest_entity_catalogue(spark, cat_dir, cfg)
    print("[1] catalogue ingest:", ingested.count(), "entities, columns",
          ingested.columns)

    # 2. incremental run with IVF retrieval (KB never broadcast) + a tombstone
    victim = int(kb.agg(F.min("id")).first()[0])
    lake_dir = tempfile.mkdtemp(prefix="tour_lake_")
    stats = run_incremental(
        spark, transcripts, kb, Lake(lake_dir), cfg,
        cluster_mode="greedy_replay", retrieval_mode="ivf",
        deleted_entity_ids={victim}, persist_candidates=True,
    )
    print("[2] ivf + tombstone run:", [s["batch_id"] for s in stats], "batches;",
          spark.read.parquet(f"{lake_dir}/triples").count(), "triples")

    # 3. train a NIL model from the run's own mention features
    m = spark.read.parquet(f"{lake_dir}/mentions")
    flip = F.pmod(F.xxhash64("mention_id"), F.lit(10)) == 0
    model = fit_nil_model(
        m.withColumn("label", (~F.col("is_nil")) != flip), label_col="label"
    )
    tuned = model.to_config(cfg)
    print("[3] trained NIL model:", {
        "w_max_bi": round(model.weights[0], 3),
        "w_secondiff": round(model.weights[1], 3),
        "bias": round(model.bias, 3),
        "converged": model.converged,
    }, "-> PipelineConfig nil_w_max_bi =", round(tuned.nil_w_max_bi, 3))

    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.rmtree(cat_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
