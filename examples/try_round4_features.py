"""Tour of the round-4 surface: IVF-PQ ANN (compressed index + exact
re-rank) and lake maintenance (compaction + vacuum).

Run: python examples/try_round4_features.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.operators.maintenance import (
    compact_lake_table,
    vacuum_lake,
)
from incremental_entity_extraction_spark.operators.similarity_search import (
    cosine_topk_broadcast,
    ivf_pq_topk,
)
from incremental_entity_extraction_spark.pipeline import Lake
from incremental_entity_extraction_spark.session import get_spark


def main() -> None:
    spark = get_spark(cores=4, app_name="try-round4")

    # --- IVF-PQ: ~8 bytes per corpus vector instead of dim*4 -------------
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 32)).astype(np.float32) * 4
    X = np.concatenate(
        [c + rng.standard_normal((50, 32)).astype(np.float32) * 0.3 for c in centers]
    )
    corpus = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    q = corpus.filter(F.col("vec_id") % 20 == 0)
    exact = cosine_topk_broadcast(q, corpus, k=5).toPandas()
    pq = ivf_pq_topk(q, corpus, k=5, n_centroids=8, n_probe=4, rerank=64).toPandas()
    hits = 0
    for qid, g in exact.groupby("query_id"):
        hits += len(set(g["neighbor_id"]) & set(pq[pq.query_id == qid]["neighbor_id"]))
    print(f"IVF-PQ recall@5 vs exact: {hits / len(exact):.3f}  "
          f"(index: {X.shape[1] * 4} B/vec raw -> 8 B/vec quantized)")
    # the re-rank stage rescores EXACTLY, so overlapping pairs agree:
    merged = pq.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_pq", "_ex"))
    print(f"max |cosine_pq - cosine_exact| on shared pairs: "
          f"{(merged['cosine_pq'] - merged['cosine_ex']).abs().max():.2e}")

    # --- lake maintenance: compact small files, vacuum orphan batches ----
    lake_dir = tempfile.mkdtemp(prefix="r4_lake_")
    lake = Lake(lake_dir)
    rows = spark.range(0, 3000).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("batch_id")
    )
    lake.write_partition(rows.repartition(10), "rows")  # fragmented write
    lake.mark_complete(0, {})
    lake.mark_complete(1, {})  # batch 2 "crashed" before its lineage mark
    # vacuum BEFORE compact (run_maintenance.py's documented ordering), and
    # older_than_seconds=0 on BOTH — safe here: no concurrent writer, and
    # the default 1 h in-flight window would skip the partitions this demo
    # wrote moments ago
    print("vacuum :", vacuum_lake(lake, older_than_seconds=0))
    print("compact:", compact_lake_table(spark, lake, "rows", older_than_seconds=0))
    left = spark.read.parquet(lake.path("rows"))
    print(f"after maintenance: {left.count()} rows in batches "
          f"{sorted(r['batch_id'] for r in left.select('batch_id').distinct().collect())}")
    shutil.rmtree(lake_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
