"""Evidence run for the round-5 claim: a build-once persisted ANN index
makes per-batch retrieval O(probed bytes + delta) instead of O(|KB|).

Per-call `ivf_topk` (what `retrieval_mode='ivf'` did before the index)
pays, on EVERY batch: a corpus count, a training-sample collect, driver
k-means, a full-corpus bucket-assignment `mapInPandas`, and a full-corpus
cogroup shuffle — all byte-identical each time by the deterministic-seed
contract.  `ann_index_search` over a prebuilt index pays: driver query
bucketing + a pruned scan of the persisted (already bucketed) rows.

Usage: python examples/bench_ann_index.py [n_corpus] [dim] [n_batches]
Prints one JSON line with the build wall, per-batch walls for both paths,
and the speedup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# runnable as `python examples/bench_ann_index.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np
import pandas as pd


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_queries = 2_000

    from incremental_entity_extraction_spark.operators.ann_index import (
        ann_index_search,
        build_ann_index,
    )
    from incremental_entity_extraction_spark.operators.similarity_search import (
        ivf_topk,
    )
    from incremental_entity_extraction_spark.session import (
        get_spark,
        warm_python_workers,
    )

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="bench-ann-index")
    warm_python_workers(spark)

    # deterministic corpus, generated distributed (seeded per partition)
    def _gen(it):
        for pdf in it:
            rng = np.random.default_rng(int(pdf["id"].iloc[0]))
            X = rng.normal(size=(len(pdf), dim)).astype(np.float32)
            yield pd.DataFrame(
                {"vec_id": pdf["id"], "embedding": list(map(list, X))}
            )

    corpus = (
        spark.range(n_corpus)
        .repartition(32)
        .mapInPandas(_gen, schema="vec_id long, embedding array<float>")
    )
    corpus_dir = tempfile.mkdtemp(prefix="annb_corpus_")
    corpus.write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    rng = np.random.default_rng(99)
    batches = []
    for b in range(n_batches):
        Q = rng.normal(size=(n_queries, dim)).astype(np.float32)
        batches.append(
            spark.createDataFrame(
                [(int(10**9 + b * n_queries + i), [float(x) for x in Q[i]])
                 for i in range(n_queries)],
                "vec_id long, embedding array<float>",
            ).localCheckpoint()
        )

    # --- per-call engine: trains + buckets the whole corpus EVERY batch ---
    percall_walls = []
    for qdf in batches:
        t0 = time.time()
        ivf_topk(qdf, corpus, k=10, exclude_self=False).count()
        percall_walls.append(round(time.time() - t0, 2))

    # --- build-once index: train/bucket once, pruned scans per batch ------
    idx_dir = tempfile.mkdtemp(prefix="annb_idx_")
    t0 = time.time()
    model = build_ann_index(corpus, os.path.join(idx_dir, "idx"), mode="ivf")
    build_wall = round(time.time() - t0, 2)
    indexed_walls = []
    for qdf in batches:
        t0 = time.time()
        ann_index_search(model, spark, qdf, k=10, exclude_self=False).count()
        indexed_walls.append(round(time.time() - t0, 2))

    out = {
        "metric": "ann_per_batch_speedup",
        "value": round(
            (sum(percall_walls) / len(percall_walls))
            / (sum(indexed_walls) / len(indexed_walls)),
            2,
        ),
        "unit": "x",
        "n_corpus": n_corpus,
        "dim": dim,
        "n_batches": n_batches,
        "n_queries_per_batch": n_queries,
        "percall_batch_walls_s": percall_walls,
        "index_build_wall_s": build_wall,
        "indexed_batch_walls_s": indexed_walls,
        "breakeven_batches": round(
            build_wall
            / max(
                1e-9,
                (sum(percall_walls) / len(percall_walls))
                - (sum(indexed_walls) / len(indexed_walls)),
            ),
            2,
        ),
    }
    print(json.dumps(out))
    shutil.rmtree(corpus_dir, ignore_errors=True)
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
