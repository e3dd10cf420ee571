#!/bin/bash
# Round-6 evidence runs, part 2: the floor leg at the r4/r5-comparable
# nil_frac (the first 16-batch run this round used the 0.005 default and
# is kept as a separate datapoint), then the 8-batch reps=3 band study.
# Launch detached:  setsid nohup bash tools/run_round6_bench2.sh > /tmp/r6bench2.log 2>&1 &
set -u
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

echo "=== scaling 16-batch floor leg nil=0.05 $(date) load=$(cat /proc/loadavg)"
SPARK_GRAFT_BENCH_BATCHES=16 SPARK_GRAFT_BENCH_NILFRAC=0.05 python bench.py --scaling \
  > /tmp/bench_scale_16b05.json 2>/tmp/bench_scale_16b05.err
tail -1 /tmp/bench_scale_16b05.json

echo "=== scaling 8-batch 10x-NIL leg, reps=3 $(date) load=$(cat /proc/loadavg)"
SPARK_GRAFT_BENCH_BATCHES=8 SPARK_GRAFT_BENCH_NILFRAC=0.05 \
  SPARK_GRAFT_SCALE_REPS=3 python bench.py --scaling \
  > /tmp/bench_scale_8b.json 2>/tmp/bench_scale_8b.err
tail -1 /tmp/bench_scale_8b.json

echo "=== all done $(date) load=$(cat /proc/loadavg)"
