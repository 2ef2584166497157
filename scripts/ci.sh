#!/bin/bash
# Local reproduction of .github/workflows/ci.yml (the sandbox cannot execute
# GitHub Actions): same three jobs, same commands, same env.
#   usage: scripts/ci.sh [--fast]     (--fast: skip the full test job)
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS || true

echo "== job: lint =="
if command -v ruff >/dev/null 2>&1; then
    ruff check certificate_stark_tpu tests bench.py
else
    python -m pyflakes certificate_stark_tpu tests bench.py 2>/dev/null \
        || python -m py_compile $(find certificate_stark_tpu tests -name '*.py') bench.py
    echo "(ruff unavailable: fell back to compile check)"
fi

if [[ "${1:-}" != "--fast" ]]; then
    echo "== job: test =="
    python -m pytest tests/ -x -q
fi

echo "== job: smoke (bench harness, chain 16) =="
BENCH_CHAIN=16 BENCH_FORCE_CPU=1 python bench.py

echo "== job: smoke (multi-chip dry run, 8 virtual devices) =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python __graft_entry__.py

echo "CI OK"
