#!/bin/bash
# Round-6 evidence runs, part 3: 8-batch reps=3 band study, then a quiet
# retry of the 16-batch nil=0.05 floor leg (the first ran in a loaded
# host window; the A/B in BENCH.md pins the code as faster than r5's).
set -u
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

echo "=== scaling 8-batch 10x-NIL leg, reps=3 $(date) load=$(cat /proc/loadavg)"
SPARK_GRAFT_BENCH_BATCHES=8 SPARK_GRAFT_BENCH_NILFRAC=0.05 \
  SPARK_GRAFT_SCALE_REPS=3 python bench.py --scaling \
  > /tmp/bench_scale_8b.json 2>/tmp/bench_scale_8b.err
tail -1 /tmp/bench_scale_8b.json

echo "=== 16-batch nil=0.05 retry $(date) load=$(cat /proc/loadavg)"
SPARK_GRAFT_BENCH_BATCHES=16 SPARK_GRAFT_BENCH_NILFRAC=0.05 python bench.py --scaling \
  > /tmp/bench_scale_16b05_v2.json 2>/tmp/bench_scale_16b05_v2.err
tail -1 /tmp/bench_scale_16b05_v2.json

echo "=== all done $(date) load=$(cat /proc/loadavg)"
