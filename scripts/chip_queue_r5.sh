#!/bin/bash
# Round-5 chip queue: runs after benches_full completes. Each step is
# timeout-guarded and logs to its own file; a failure does not stop the queue.
set -u
BENCH_PID=${1:-}
if [ -n "$BENCH_PID" ]; then
  echo "waiting for bench pid $BENCH_PID"
  while kill -0 "$BENCH_PID" 2>/dev/null; do sleep 30; done
fi
cd /root/repo

# 1. re-run the three benches whose warm time was dominated by per-row host
#    trace gen (now vectorized) + the one contaminated by CPU contention,
#    from a fresh snapshot of the current tree
rm -rf /tmp/repo_r5bench2
cp -r /root/repo /tmp/repo_r5bench2
rm -rf /tmp/repo_r5bench2/.git
timeout 5400 python /tmp/repo_r5bench2/scripts/bench_rerun_r5.py \
  > /tmp/benches_rerun_r5.jsonl 2> /tmp/benches_rerun_r5.err

# 2. pallas + tracegen probes
timeout 3600 python scripts/perf_probe_r5.py --pallas --tracegen \
  --tracegen-max 1024 > /tmp/probe_pallas_tracegen_r5.json \
  2> /tmp/probe_pallas_tracegen_r5.err

# 3. batched NTT variants
timeout 5400 python scripts/perf_probe_r5.py --ntt \
  > /tmp/probe_ntt_r5.json 2> /tmp/probe_ntt_r5.err

# 4. eval-chunk attribution at the 128-tx packed shape
timeout 5400 python scripts/perf_probe_r5.py --eval --eval-tx 128 \
  > /tmp/probe_eval_r5.json 2> /tmp/probe_eval_r5.err

echo "chip queue r5 done" > /tmp/chip_queue_r5.done
