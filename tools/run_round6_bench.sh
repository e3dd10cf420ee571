#!/bin/bash
# Round-6 evidence runs, sequential on (ideally) a quiet host.
# Launch detached:  setsid nohup bash tools/run_round6_bench.sh > /tmp/r6bench.log 2>&1 &
set -u
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

echo "=== headline (gated, 4 reps) $(date) load=$(cat /proc/loadavg)"
python bench.py > /tmp/bench_headline.json 2>/tmp/bench_headline.err
tail -1 /tmp/bench_headline.json

echo "=== scaling standard leg $(date) load=$(cat /proc/loadavg)"
python bench.py --scaling > /tmp/bench_scale_std.json 2>/tmp/bench_scale_std.err
tail -1 /tmp/bench_scale_std.json

echo "=== scaling 16-batch floor leg $(date) load=$(cat /proc/loadavg)"
SPARK_GRAFT_BENCH_BATCHES=16 python bench.py --scaling \
  > /tmp/bench_scale_16b.json 2>/tmp/bench_scale_16b.err
tail -1 /tmp/bench_scale_16b.json

echo "=== scaling 8-batch 10x-NIL leg, reps=3 $(date) load=$(cat /proc/loadavg)"
SPARK_GRAFT_BENCH_BATCHES=8 SPARK_GRAFT_BENCH_NILFRAC=0.05 \
  SPARK_GRAFT_SCALE_REPS=3 python bench.py --scaling \
  > /tmp/bench_scale_8b.json 2>/tmp/bench_scale_8b.err
tail -1 /tmp/bench_scale_8b.json

echo "=== all done $(date) load=$(cat /proc/loadavg)"
