#!/bin/bash
# Round-4 chip run queue: executed sequentially once the 1024-tx probe frees
# the TPU. Each step logs to its own file; partial results are usable.
set -x
cd /root/repo

# 1. Kernel metrics + pallas verdict + roofline measurements (VERDICT #4/#6)
timeout 5400 python scripts/tpu_tune.py > scripts/tpu_tune_r4.json \
    2> /tmp/tune_r4.err

# 2. Five-group reference-size bench matrix on the chip (VERDICT #2)
timeout 14400 python benches.py --full > /tmp/benches_full_r4.jsonl \
    2> /tmp/benches_full_r4.err

echo "CHIP QUEUE DONE $(date)"
