"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: turns/sec of the incremental KG pipeline (mention detect →
encode → dense top-k → NIL → cluster → KB append → triples) over transcripts
derived from the documents table — the engine's north-star workload.
``value`` is the MEDIAN of ``--reps`` full-pipeline samples (default 4 —
EVEN, so the alternating engine order puts each engine in the cold first
position equally often; an odd count would hand the second-position warm
cache to one engine in the majority of reps) in cluster_mode='cc' — the
scale-path engine, which is also the fastest;
``greedy_turns_per_sec`` reports the reference-exact engine beside it for
round-over-round comparability.  Every sample records /proc/loadavg AND is
LOAD-GATED: the harness waits (bounded; retry trail recorded per sample)
for the 1-min load to drop under ``SPARK_GRAFT_LOAD_GATE`` (default 2.0)
before sampling, so a committed artifact is quiet-host by construction —
rounds 2-5 each re-litigated phantom regressions that per-sample load
fields later attributed to co-tenant noise.  Round 7 closes the other end:
after each sample the harness waits out its own load decay
(``SPARK_GRAFT_END_SETTLE_S``) and RE-RUNS samples whose settled load shows
external contamination (bounded retries, discarded attempts kept).  The
full result object (per-sample gates, trails, discarded attempts) is
written to ``bench_artifacts/headline_<tag>.json``; the stdout line carries
the headline fields plus the artifact path and stays within the driver's
~2 KB tail capture.  The ``queries`` dict adds
per-query wall times for the heavier relational / dedup / vector queries;
queries with a one-time setup cost (ANN index build, CoNLL fixture) report
steady-state under their own name and the cold first call as ``*_cold``.

Scaling evidence (BASELINE.md / north_rule): ``python bench.py --scaling``
generates a large deterministic transcript world with the *distributed*
generator (fixtures.spark_generator), then runs the identical pipeline at
local[N] and local[4N] on the same parquet input and reports throughput at
both plus efficiency = (T_N→T_4N speedup)/4.  BLAS threads are pinned to 1
so parallelism comes from Spark tasks only — otherwise local[8] silently
uses all machine cores through OpenBLAS and the comparison is fake.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

# pin BLAS before numpy/Spark start anywhere (workers inherit this env)
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# scaling-world knobs (see BENCH.md)
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "16000"))
BENCH_HOT = int(os.environ.get("SPARK_GRAFT_BENCH_HOT", "16000"))
BENCH_ENTITIES = int(os.environ.get("SPARK_GRAFT_BENCH_ENTITIES", "50000"))
BENCH_DIM = int(os.environ.get("SPARK_GRAFT_BENCH_DIM", "256"))
BENCH_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "1"))
# fraction of entities that are NIL (drive the clustering stage's load):
# default 0.005 keeps the round-1/2 world byte-comparable; raise it to make
# star-CC a first-order cost in the cc-mode scaling legs
BENCH_NILFRAC = float(os.environ.get("SPARK_GRAFT_BENCH_NILFRAC", "0.005"))

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


def _loadavg() -> list[float]:
    """1/5/15-minute host load — recorded so a reviewer can separate engine
    changes from co-tenant noise in the headline numbers."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


# ---- load gate ----------------------------------------------------------
# A headline/scaling sample whose start 1-min load exceeds the bound is NOT
# taken: the harness sleeps until the host quiets (recording the retry
# trail) instead of committing a contaminated number.  Rounds 2-5 each
# re-litigated a phantom regression that per-sample load fields later
# attributed to co-tenant noise; the gate settles it by construction.  The
# wait is bounded per sample AND globally so a permanently-busy host still
# produces an artifact — one whose samples carry ``passed: false`` and
# self-describe as contaminated.
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
LOAD_GATE_TIMEOUT = float(os.environ.get("SPARK_GRAFT_LOAD_GATE_TIMEOUT", "300"))
LOAD_GATE_BUDGET = float(os.environ.get("SPARK_GRAFT_LOAD_GATE_BUDGET", "900"))
_LOAD_POLL_S = 10.0
_gate_spent = 0.0  # cumulative seconds slept across all gates this run

# ---- end-load re-sample (round-7) ----------------------------------------
# The start gate cannot see load that ARRIVES mid-sample (r6: a sample that
# gate-passed at 1.98 then read 3-4x walls).  The raw end load cannot
# discriminate either: the bench's OWN 32-wide burst leaves 1-min loads of
# ~7 on a perfectly quiet host (r6 artifact, clean sample, end load 7.02).
# What does discriminate is DECAY: 1-min loadavg decays as e^(-t/60), so
# self-load of 7 reads <2 after ~90 s, while sustained co-tenant load does
# not.  After each headline sample the harness sleeps ``END_SETTLE_S`` and
# re-reads the load; a sample whose settled load still exceeds the gate had
# external load in its window and is RE-RUN (bounded per-sample and
# globally, every discarded attempt kept in the artifact) — the committed
# median is quiet at both ends by construction, not by adjudication.
END_SETTLE_S = float(os.environ.get("SPARK_GRAFT_END_SETTLE_S", "90"))
END_RETRIES = int(os.environ.get("SPARK_GRAFT_END_RETRIES", "1"))
END_RETRIES_GLOBAL = int(os.environ.get("SPARK_GRAFT_END_RETRIES_GLOBAL", "3"))


def _settle_end_check() -> dict:
    """Sleep past the bench's own 1-min-load decay, then re-read: a load
    still above the gate is external contamination, not self-load."""
    if END_SETTLE_S <= 0:
        return {"enabled": False, "quiet": True}
    time.sleep(END_SETTLE_S)
    la = _loadavg()
    cur = la[0] if la else 0.0
    return {
        "enabled": True,
        "slept_s": END_SETTLE_S,
        "load1": round(cur, 2),
        "quiet": cur < LOAD_GATE or LOAD_GATE <= 0,
    }


def _write_artifact(obj: dict, kind: str) -> str:
    """Persist the FULL result object under bench_artifacts/ — the stdout
    JSON line stays small enough for the driver's tail capture (r6's grew
    past it and the round artifact lost its headline fields), while the
    trails/samples/rep-details live here."""
    d = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_artifacts"
    )
    os.makedirs(d, exist_ok=True)
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG") or time.strftime(
        "%Y%m%dT%H%M%SZ", time.gmtime()
    )
    # serialize ONCE, write both destinations tmp+replace: a crash mid-write
    # must never leave a truncated file that looks like a round artifact
    payload = json.dumps(obj, indent=1)
    path = os.path.join(d, f"{kind}_{tag}.json")
    for dst in (path, os.path.join(d, f"{kind}_latest.json")):
        tmp = f"{dst}.tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, dst)
    return path


def _await_quiet(tag: str) -> dict:
    """Block until the 1-min load drops under ``LOAD_GATE``; return the
    gate record (bound, pass/fail, seconds waited, load trail).  A 1-min
    loadavg decays as e^(-t/60), so self-load from the previous sample
    clears in ~60·ln(L/gate) s; sustained co-tenant load instead exhausts
    the per-sample timeout (or the global budget) and the sample is taken
    anyway but marked ``passed: false``."""
    global _gate_spent
    trail: list[float] = []
    t0 = time.time()
    while True:
        la = _loadavg()
        cur = la[0] if la else 0.0
        trail.append(cur)
        waited = time.time() - t0
        if cur < LOAD_GATE or LOAD_GATE <= 0:
            _gate_spent += waited
            return {
                "tag": tag, "passed": True, "load1": cur,
                "waited_s": round(waited, 1), "trail": trail,
            }
        if waited >= LOAD_GATE_TIMEOUT or _gate_spent + waited >= LOAD_GATE_BUDGET:
            # classify BEFORE folding this wait into the global total — a
            # sample that hit its own timeout must not read "global_budget"
            # just because the cumulative total crossed at the same instant
            reason = (
                "sample_timeout" if waited >= LOAD_GATE_TIMEOUT
                else "global_budget"
            )
            _gate_spent += waited
            return {
                "tag": tag, "passed": False, "load1": cur,
                "waited_s": round(waited, 1), "trail": trail,
                "reason": reason,
            }
        time.sleep(_LOAD_POLL_S)


def run_documents_pipeline(
    cores: int, sf_dir: str, cluster_mode: str = "greedy_replay"
) -> tuple[float, int, int]:
    """Flagship run over documents-derived transcripts; returns
    (wall_s, n_turns, n_triples)."""
    from incremental_entity_extraction_spark.config import DEFAULT_CONFIG as CFG
    from incremental_entity_extraction_spark.entry_queries import (
        KG_STOPWORDS,
        build_kg_world,
    )
    from incremental_entity_extraction_spark.pipeline import Lake, run_incremental
    from incremental_entity_extraction_spark.session import get_spark

    from incremental_entity_extraction_spark.session import warm_python_workers

    spark = get_spark(cores=cores, app_name=f"bench-{cores}")
    warm_python_workers(spark)
    transcripts, kb = build_kg_world(spark, sf_dir)
    n_turns = transcripts.count()
    lake_dir = tempfile.mkdtemp(prefix="bench_lake_")
    lake = Lake(lake_dir)
    t0 = time.time()
    run_incremental(
        spark, transcripts, kb, lake, CFG,
        cluster_mode=cluster_mode, known_words=KG_STOPWORDS,
    )
    wall = time.time() - t0
    n_triples = spark.read.parquet(lake.path("triples")).count()
    shutil.rmtree(lake_dir, ignore_errors=True)
    spark.stop()
    return wall, n_turns, n_triples


def prepare_scaling_world(work_dir: str) -> tuple[str, str, int]:
    """Generate the big deterministic world once; return (transcripts_path,
    kb_path, n_turns)."""
    from dataclasses import replace

    from incremental_entity_extraction_spark.config import DEFAULT_CONFIG
    from incremental_entity_extraction_spark.fixtures.spark_generator import (
        make_entities_pdf,
        spark_transcripts,
    )
    from incremental_entity_extraction_spark.session import get_spark

    cfg = replace(DEFAULT_CONFIG, dim=BENCH_DIM)
    spark = get_spark(cores=CPUS, app_name="bench-gen")
    entities_all, kb_pdf = make_entities_pdf(
        BENCH_ENTITIES, nil_frac=BENCH_NILFRAC, cfg=cfg
    )
    tdf = spark_transcripts(
        spark, entities_all, n_convs=BENCH_CONVS, hot_turns=BENCH_HOT,
        n_batches=BENCH_BATCHES,
    )
    t_path = os.path.join(work_dir, "transcripts")
    kb_path = os.path.join(work_dir, "kb")
    tdf.write.mode("overwrite").parquet(t_path)
    spark.createDataFrame(kb_pdf).write.mode("overwrite").parquet(kb_path)
    n_turns = spark.read.parquet(t_path).count()
    spark.stop()
    return t_path, kb_path, n_turns


def run_scaling_pipeline(
    cores: int, t_path: str, kb_path: str, cluster_mode: str = "cc"
) -> float:
    from dataclasses import replace

    from incremental_entity_extraction_spark.config import DEFAULT_CONFIG
    from incremental_entity_extraction_spark.pipeline import Lake, run_incremental
    from incremental_entity_extraction_spark.session import get_spark, warm_python_workers

    cfg = replace(DEFAULT_CONFIG, dim=BENCH_DIM)
    spark = get_spark(cores=cores, app_name=f"bench-scale-{cores}")
    transcripts = spark.read.parquet(t_path)
    kb = spark.read.parquet(kb_path)
    lake_dir = tempfile.mkdtemp(prefix="bench_scale_lake_")
    warm_python_workers(spark)  # exclude worker-pool startup from throughput
    t0 = time.time()
    run_incremental(
        spark, transcripts, kb, Lake(lake_dir), cfg, cluster_mode=cluster_mode
    )
    wall = time.time() - t0
    shutil.rmtree(lake_dir, ignore_errors=True)
    spark.stop()
    return wall


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])

    if "--scaling" in sys.argv:
        # default pair 2→8: this sandbox's hypervisor throttles concurrent
        # vectorized math above ~8-16 workers (see BENCH.md — pure-Python
        # scales 19x at 32 procs, sgemm only 2.7x), so larger pairs measure
        # the box, not the engine.
        pair = os.environ.get("SPARK_GRAFT_SCALE_CORES", "2,8")
        n_small, n_big = (int(x) for x in pair.split(","))
        # cc (star-CC + LSH blocking) is the engine you'd run at 100×, so it
        # is the default scaling evidence; add greedy_replay for the
        # reference-exact comparison: SPARK_GRAFT_SCALE_MODES=cc,greedy_replay
        modes = [
            m.strip()
            for m in os.environ.get("SPARK_GRAFT_SCALE_MODES", "cc").split(",")
            if m.strip()
        ] or ["cc"]  # an empty/whitespace override falls back to the default
        load0 = _loadavg()
        work_dir = tempfile.mkdtemp(prefix="bench_world_")
        try:
            t_path, kb_path, n_turns = prepare_scaling_world(work_dir)
            reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
            per_mode = {}
            for mode in modes:
                walls = {}
                rep_detail = []
                for cores in (n_small, n_big):
                    # best-of-N minimizes shared-host noise; each rep is
                    # load-gated (the r5 8-batch leg read 0.67 at load 8 vs
                    # 0.77 quiet — gating makes that class of leg un-takeable)
                    ws = []
                    for ri in range(reps):
                        gate = _await_quiet(f"{mode}-c{cores}-rep{ri}")
                        w = run_scaling_pipeline(cores, t_path, kb_path, mode)
                        ws.append(w)
                        rep_detail.append(
                            {"cores": cores, "rep": ri,
                             "wall_s": round(w, 2), "load_gate": gate,
                             # a low-core rep's own steady load is ~cores,
                             # so an end load well above that means the
                             # host got busy mid-rep (the gate can only
                             # see load before the rep starts)
                             "host_load_end": _loadavg()}
                        )
                    walls[cores] = min(ws)
                thr = {c: n_turns / w for c, w in walls.items()}
                per_mode[mode] = {
                    "efficiency": round(
                        (thr[n_big] / thr[n_small]) / (n_big / n_small), 4
                    ),
                    "throughput_turns_per_sec": {
                        str(c): round(v, 2) for c, v in thr.items()
                    },
                    "wall_s": {str(c): round(w, 2) for c, w in walls.items()},
                    "reps_detail": rep_detail,
                }
            head = per_mode[modes[0]]
            result = {
                "metric": "kg_pipeline_scaling_efficiency",
                "value": head["efficiency"],
                "unit": "efficiency",
                "cluster_mode": modes[0],
                "throughput_turns_per_sec": head["throughput_turns_per_sec"],
                "wall_s": head["wall_s"],
                "efficiency_by_mode": {
                    m: pm["efficiency"] for m, pm in per_mode.items()
                },
                "n_turns": n_turns,
                "cores": [n_small, n_big],
                "host_load": {"start": load0, "end": _loadavg()},
                "load_gate": {
                    "bound": LOAD_GATE,
                    "all_passed": all(
                        rd["load_gate"]["passed"]
                        for pm in per_mode.values()
                        for rd in pm["reps_detail"]
                    ),
                },
                "world": {
                    "n_convs": BENCH_CONVS,
                    "hot_turns": BENCH_HOT,
                    "n_entities": BENCH_ENTITIES,
                    "dim": BENCH_DIM,
                    "n_batches": BENCH_BATCHES,
                    "nil_frac": BENCH_NILFRAC,
                },
            }
            # rep details (gate trails, end loads) go to the artifact file;
            # the stdout line stays within the driver's tail capture
            full = dict(
                result,
                modes=per_mode,
                load_gate=dict(
                    result["load_gate"],
                    timeout_s=LOAD_GATE_TIMEOUT,
                    budget_s=LOAD_GATE_BUDGET,
                ),
            )
            result["artifact"] = os.path.relpath(
                _write_artifact(full, "scaling"),
                os.path.dirname(os.path.abspath(__file__)),
            )
            print(json.dumps(result))
        finally:
            shutil.rmtree(work_dir, ignore_errors=True)
        return

    from incremental_entity_extraction_spark.entry_queries import QUERIES
    from incremental_entity_extraction_spark.session import get_spark

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
    if "--reps" in sys.argv:
        try:
            reps = int(sys.argv[sys.argv.index("--reps") + 1])
        except (IndexError, ValueError):
            print(
                f"ignoring malformed --reps (using {reps})", file=sys.stderr
            )
    reps = max(1, reps)

    load0 = _loadavg()
    # multi-rep headline: each sample is a fresh session + full pipeline run
    # per engine, with the host load at its start — the median is the
    # headline, the per-sample list is the evidence
    samples = []
    discarded = []
    retries_global = END_RETRIES_GLOBAL
    n_turns = n_triples = 0
    for i in range(reps):
        # alternate engine order per rep: whichever runs first pays the cold
        # OS page cache for the parquet world, so a fixed order would bias
        # the comparison (r3 ran greedy first, this round's first draft ran
        # cc first — the apparent engine flip between them was this bias)
        order = ("cc", "greedy_replay") if i % 2 else ("greedy_replay", "cc")
        attempt = 0
        while True:
            gate = _await_quiet(f"sample{i}a{attempt}")
            s = {
                "host_load_start": _loadavg(),
                "order": list(order),
                "attempt": attempt,
                "load_gate": gate,
            }
            for mode in order:
                wall, n_turns, n_triples = run_documents_pipeline(
                    CPUS, SF_DIR, cluster_mode=mode
                )
                key = "cc_wall_s" if mode == "cc" else "greedy_wall_s"
                s[key] = round(wall, 3)
            # the gate can only see load BEFORE the sample; background work
            # that starts mid-sample shows up only afterward.  Record the
            # raw end load, then the SETTLED end check (see END_SETTLE_S):
            # raw end load includes the bench's own burst, the settled read
            # does not — only the latter triggers a re-sample.
            s["host_load_end"] = _loadavg()
            s["end_check"] = _settle_end_check()
            if (
                s["end_check"]["quiet"]
                or attempt >= END_RETRIES
                or retries_global <= 0
            ):
                samples.append(s)
                break
            discarded.append(dict(s, resample_reason="end_load"))
            attempt += 1
            retries_global -= 1

    def _median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2

    cc_walls = [s["cc_wall_s"] for s in samples]
    g_walls = [s["greedy_wall_s"] for s in samples]

    spark = get_spark(cores=CPUS, app_name="bench-queries")
    q_times = {
        "kg_pipeline": round(_median(g_walls), 3),
        "kg_pipeline_cc": round(_median(cc_walls), 3),
    }
    # queries whose first call pays a ONE-TIME cost (ANN index build,
    # CoNLL fixture serialization) that is NOT the operator's steady-state
    # cost: time the first call as `<name>_cold` and a second call — warm
    # fixture / persisted index — as the headline `<name>`, so the
    # round-over-round comparison tracks the operator, not the setup
    warm_split = {"q37_conll_scan", "q50_ann_index"}
    q_gate = _await_quiet("queries")
    for name in BENCH_QUERIES:
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        if name in warm_split:
            q_times[f"{name}_cold"] = wall
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.time() - t0, 3)
        q_times[name] = wall
    spark.stop()

    result = {
        "metric": "kg_pipeline_turns_per_sec",
        # headline = the scale-path engine (cc), median of reps
        "value": round(n_turns / _median(cc_walls), 2),
        "unit": "turns/sec",
        "cluster_mode": "cc",
        "cc_turns_per_sec": round(n_turns / _median(cc_walls), 2),
        "cc_turns_per_sec_best": round(n_turns / min(cc_walls), 2),
        "greedy_turns_per_sec": round(n_turns / _median(g_walls), 2),
        "greedy_turns_per_sec_best": round(n_turns / min(g_walls), 2),
        "reps": reps,
        "queries": q_times,
        "sf": sf,
        "n_turns": n_turns,
        "n_triples": n_triples,
        "cores": CPUS,
        "host_load": {"start": load0, "end": _loadavg()},
        "load_gate": {
            "bound": LOAD_GATE,
            # quiet at the start of every sample (the gate)...
            "all_passed": all(s["load_gate"]["passed"] for s in samples)
            and q_gate["passed"],
            # ...AND at the settled end of every accepted sample: true means
            # the medians are quiet-host by construction (see END_SETTLE_S);
            # null means the settle check was DISABLED (END_SETTLE_S<=0) —
            # never report an unchecked run as quiet
            "end_quiet_all": (
                all(s["end_check"]["quiet"] for s in samples)
                if END_SETTLE_S > 0
                else None
            ),
            "resampled": len(discarded),
        },
    }
    # full evidence (per-sample gates with trails, discarded attempts,
    # query-phase gate) goes to bench_artifacts/; the stdout line must stay
    # under the driver's tail capture (~2 KB — r6's artifact lost its
    # headline fields when the inline samples outgrew it)
    full = dict(
        result,
        samples=samples,
        resampled_attempts=discarded,
        load_gate=dict(
            result["load_gate"],
            timeout_s=LOAD_GATE_TIMEOUT,
            budget_s=LOAD_GATE_BUDGET,
            end_settle_s=END_SETTLE_S,
            queries_gate=q_gate,
        ),
    )
    result["artifact"] = os.path.relpath(
        _write_artifact(full, "headline"),
        os.path.dirname(os.path.abspath(__file__)),
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
