"""Per-batch floor profiler: times each serial phase of the incremental
loop (run_batch compute, driver clustering collect, RW-delta collect,
previous-batch drain join) on a multi-batch world, to direct floor work at
the measured slice instead of the guessed one.

Env knobs: PF_CONVS (default 3000), PF_HOT (3000), PF_ENTITIES (20000),
PF_BATCHES (16), PF_CORES (8), PF_DIM (256).
Run: PYTHONPATH=/root/repo python tools/profile_batch_floor.py
"""
import os
import shutil
import tempfile
import time
from dataclasses import replace

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import incremental_entity_extraction_spark.pipeline as P
from incremental_entity_extraction_spark.config import DEFAULT_CONFIG
from incremental_entity_extraction_spark.fixtures.spark_generator import (
    make_entities_pdf,
    spark_transcripts,
)
from incremental_entity_extraction_spark.session import (
    get_spark,
    warm_python_workers,
)

CONVS = int(os.environ.get("PF_CONVS", "3000"))
HOT = int(os.environ.get("PF_HOT", "3000"))
ENTITIES = int(os.environ.get("PF_ENTITIES", "20000"))
BATCHES = int(os.environ.get("PF_BATCHES", "16"))
CORES = int(os.environ.get("PF_CORES", "8"))
DIM = int(os.environ.get("PF_DIM", "256"))

events: list[tuple[str, float]] = []


def _wrap(fn, tag):
    def inner(*a, **k):
        t = time.time()
        out = fn(*a, **k)
        events.append((tag, time.time() - t))
        return out

    return inner


def main():
    cfg = replace(DEFAULT_CONFIG, dim=DIM)
    spark = get_spark(cores=CORES, app_name="profile-floor")
    entities_all, kb_pdf = make_entities_pdf(ENTITIES, nil_frac=0.005, cfg=cfg)
    tdf = spark_transcripts(
        spark, entities_all, n_convs=CONVS, hot_turns=HOT, n_batches=BATCHES
    )
    work = tempfile.mkdtemp(prefix="pf_world_")
    tdf.write.mode("overwrite").parquet(os.path.join(work, "t"))
    spark.createDataFrame(kb_pdf).write.mode("overwrite").parquet(
        os.path.join(work, "kb")
    )
    transcripts = spark.read.parquet(os.path.join(work, "t"))
    kb = spark.read.parquet(os.path.join(work, "kb"))
    n_turns = transcripts.count()
    warm_python_workers(spark)

    # instrument the serial phases
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    orig_lc = _DF.localCheckpoint

    def _lc(self, *a, **k):
        t = time.time()
        r = orig_lc(self, *a, **k)
        events.append(("localCheckpoint", time.time() - t))
        return r

    _DF.localCheckpoint = _lc
    P.detect_encode_retrieve = _wrap(P.detect_encode_retrieve, "fused_plan")
    P.predict_nil = _wrap(P.predict_nil, "nil_plan")
    P.mention_triples = _wrap(P.mention_triples, "mtriples_plan")
    P.cluster_triples = _wrap(P.cluster_triples, "ctriples_plan")
    P.new_entity_rows = _wrap(P.new_entity_rows, "newent_plan")
    P.run_batch = _wrap(P.run_batch, "run_batch")
    P._driver_cluster_assign = _wrap(P._driver_cluster_assign, "driver_cluster")
    P.BatchPersist.start = _wrap(P.BatchPersist.start, "persist_start")
    P.BatchPersist.rw_delta = _wrap(P.BatchPersist.rw_delta, "rw_delta")
    P.BatchPersist.finish = _wrap(P.BatchPersist.finish, "drain_finish")

    lake_dir = tempfile.mkdtemp(prefix="pf_lake_")
    salt = os.environ.get("PF_SALT", "1") == "1"
    t0 = time.time()
    stats = P.run_incremental(
        spark, transcripts, kb, P.Lake(lake_dir), cfg, cluster_mode="cc",
        salt_repartition=salt,
    )
    wall = time.time() - t0

    agg: dict[str, list[float]] = {}
    for tag, dt in events:
        agg.setdefault(tag, []).append(dt)
    print(f"\nworld: {n_turns} turns, {BATCHES} batches, local[{CORES}]")
    print(f"total wall {wall:.2f}s = {n_turns / wall:.0f} turns/s")
    print(f"{'phase':16s} {'n':>3s} {'sum':>7s} {'mean':>7s} {'min':>7s} {'max':>7s}")
    for tag, xs in agg.items():
        print(
            f"{tag:16s} {len(xs):3d} {sum(xs):7.2f} "
            f"{sum(xs) / len(xs):7.3f} {min(xs):7.3f} {max(xs):7.3f}"
        )
    per_batch = [s["wall_s"] for s in stats]
    print(f"per-batch wall_s: {['%.2f' % w for w in per_batch]}")
    shutil.rmtree(lake_dir, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
