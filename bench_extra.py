"""Round-8 optimization measurement harness (bench.py stays FROZEN).

Times each bench query in isolation with the noop sink (guide §1.4), with
``--reps`` samples per query (median + min reported), labels jobs
(guide §1.5), and optionally dumps ``.explain("formatted")`` for each query
to ``plans/r08/<query>_<tag>.txt`` (guide §7.2).

Usage:
    python bench_extra.py [--reps 3] [--plans TAG] [--queries q02,q07]
    python bench_extra.py --pipeline [--reps 2]   # headline cc+greedy walls
    python bench_extra.py --scaling-ivf [--reps 2]  # ANN-retrieval scaling

``--scaling-ivf`` is the round-7 verdict's named evidence gap: every
committed headline/scaling number runs ``retrieval_mode='broadcast'``
(KB collected + broadcast — the reference's 33-GB-RAM regime), while the
100-TB design point is exactly ``retrieval_mode='ivf'`` / the persisted
ANN index, which until now had correctness evidence only.  This leg
generates the SAME deterministic world as ``bench.py --scaling`` and runs
the identical pipeline with ``retrieval_mode='ivf'`` at local[N] and
local[4N] (the per-rep lake is fresh, so each rep includes the one-time
index build — all Spark work that must itself scale), reporting
throughput at both plus efficiency, same formula as the frozen leg.

Environment: same contract as bench.py ($SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "q02_group_agg_stats",
    "q03_hydration_join",
    "q07_topk_per_key",
    "q09_explode_wordcount",
    "q14_recall_at_k",
    "q16_fingerprint",
    "q19_ngram_jaccard",
    "q20_minhash_lsh",
    "q22_cosine_topk",
    "q24_emb_neardup_brute",
    "q35_sessionize_events",
    "q37_conll_scan",
    "q38_ivf_recall",
    "q46_jsonl_scan",
    "q49_ivf_pq_recall",
    "q50_ann_index",
]


def _median(xs):
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]

    def _opt(name, default=None):
        if name in args:
            i = args.index(name)
            return args[i + 1] if i + 1 < len(args) else default
        return default

    reps = int(_opt("--reps", "3"))
    plans_tag = _opt("--plans")

    if "--scaling-ivf" in args:
        import shutil
        import tempfile
        from dataclasses import replace

        from bench import (
            BENCH_DIM, _await_quiet, _loadavg, _write_artifact,
            prepare_scaling_world,
        )
        from incremental_entity_extraction_spark.config import DEFAULT_CONFIG
        from incremental_entity_extraction_spark.pipeline import (
            Lake, run_incremental,
        )
        from incremental_entity_extraction_spark.session import (
            get_spark as _gs, warm_python_workers,
        )

        pair = os.environ.get("SPARK_GRAFT_SCALE_CORES", "2,8")
        n_small, n_big = (int(x) for x in pair.split(","))
        cfg = replace(DEFAULT_CONFIG, dim=BENCH_DIM)
        work_dir = tempfile.mkdtemp(prefix="bench_ivf_world_")
        try:
            t_path, kb_path, n_turns = prepare_scaling_world(work_dir)
            walls = {}
            rep_detail = []
            for cores in (n_small, n_big):
                ws = []
                for ri in range(reps):
                    gate = _await_quiet(f"ivf-c{cores}-rep{ri}")
                    spark = _gs(cores=cores, app_name=f"bench-ivf-{cores}")
                    transcripts = spark.read.parquet(t_path)
                    kb = spark.read.parquet(kb_path)
                    lake_dir = tempfile.mkdtemp(prefix="bench_ivf_lake_")
                    warm_python_workers(spark)
                    t0 = time.time()
                    run_incremental(
                        spark, transcripts, kb, Lake(lake_dir), cfg,
                        cluster_mode="cc", retrieval_mode="ivf",
                    )
                    w = time.time() - t0
                    shutil.rmtree(lake_dir, ignore_errors=True)
                    spark.stop()
                    ws.append(w)
                    rep_detail.append(
                        {"cores": cores, "rep": ri, "wall_s": round(w, 2),
                         "load_gate": gate, "host_load_end": _loadavg()}
                    )
                    print(f"ivf cores={cores} rep{ri}: {w:.2f}s",
                          file=sys.stderr)
                walls[cores] = min(ws)
            thr = {c: n_turns / w for c, w in walls.items()}
            result = {
                "metric": "kg_pipeline_ivf_scaling_efficiency",
                "value": round(
                    (thr[n_big] / thr[n_small]) / (n_big / n_small), 4
                ),
                "unit": "efficiency",
                "cluster_mode": "cc",
                "retrieval_mode": "ivf",
                "throughput_turns_per_sec": {
                    str(c): round(v, 2) for c, v in thr.items()
                },
                "wall_s": {str(c): round(w, 2) for c, w in walls.items()},
                "n_turns": n_turns,
                "cores": [n_small, n_big],
                "reps_detail": rep_detail,
            }
            result["artifact"] = os.path.relpath(
                _write_artifact(result, "scaling_ivf"),
                os.path.dirname(os.path.abspath(__file__)),
            )
            print(json.dumps(result))
        finally:
            shutil.rmtree(work_dir, ignore_errors=True)
        return

    if "--pipeline" in args:
        from bench import run_documents_pipeline

        out = {}
        for mode in ("greedy_replay", "cc"):
            walls = []
            for _ in range(reps):
                wall, n_turns, n_triples = run_documents_pipeline(
                    CPUS, SF_DIR, cluster_mode=mode
                )
                walls.append(round(wall, 3))
            out[mode] = {
                "walls": walls,
                "median": round(_median(walls), 3),
                "min": min(walls),
                "turns_per_sec_median": round(n_turns / _median(walls), 1),
            }
        print(json.dumps(out))
        return

    from incremental_entity_extraction_spark.entry_queries import QUERIES
    from incremental_entity_extraction_spark.session import get_spark

    names = [
        n.strip()
        for n in (_opt("--queries") or ",".join(BENCH_QUERIES)).split(",")
        if n.strip()
    ]

    spark = get_spark(cores=CPUS, app_name="bench-extra")
    results = {}
    for name in names:
        if plans_tag:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            d = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "plans", "r08"
            )
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{name}_{plans_tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "median": round(_median(samples), 3),
            "min": min(samples),
            "samples": samples,
        }
        print(f"{name}: median={results[name]['median']} samples={samples}",
              file=sys.stderr)
    spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
