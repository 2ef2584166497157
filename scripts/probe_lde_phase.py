#!/usr/bin/env python
"""Bisect the big-domain packed-LDE phase (the span between 'trace gen' and
'trace LDE' in scripts/flagship_probe.py): time each sub-step separately —
trace-coeffs iNTT, first lde_group_packed compile+run, steady-state group
calls, and the donated write_cols — at a configurable domain size.

Usage: python scripts/probe_lde_phase.py [--log-n 20] [--cols 94]
(log-n 20 = the 1024-tx north star: trace 2^20, LDE 2^23.)
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--cols", type=int, default=94)
    ap.add_argument("--groups", type=int, default=3,
                    help="how many steady-state group calls to time")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.engine import prover as PRV
    from certificate_stark_tpu.models import transaction as TX
    from certificate_stark_tpu.utils import witness as W
    from certificate_stark_tpu.ops import field as F

    n = 1 << args.log_n
    n_tx = n // TX.CYCLE
    print(f"# backend={jax.default_backend()} n=2^{args.log_n} "
          f"({n_tx} tx)", flush=True)

    t0 = time.perf_counter()
    ex = TX.TransactionExample(max(n_tx, 1), ProofOptions(
        num_queries=42, blowup=8, hash_fn="blake3"), depth=15)
    air = TX.TransactionAir(n, ex.pub_inputs(), ProofOptions(
        num_queries=42, blowup=8, hash_fn="blake3"), depth=15)
    print(f"# witness {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    p = PRV.Prover(air)
    print(f"# Prover() init (incl protocol tables + phase builds) "
          f"{time.perf_counter()-t0:.1f}s pack_lde={p._pack_lde} "
          f"lde_cols={p._lde_cols} eval_chunk={p._eval_chunk}", flush=True)
    if not p._pack_lde:
        print("# NOT in packed mode; aborting", flush=True)
        return

    t0 = time.perf_counter()
    trace = ex.trace
    jax.block_until_ready(trace)
    print(f"# trace build {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    cf = p.phase_trace_coeffs(trace)
    np.asarray(cf[:1, :1, :1])
    print(f"# phase_trace_coeffs (iNTT 2^{args.log_n}) "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    del trace

    wc = p._lde_cols
    t0 = time.perf_counter()
    blk = p._lde_group_packed(cf[:, 0:wc])
    np.asarray(blk[:1, :1, :1])
    print(f"# lde_group_packed[0] (compile+run) "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    for g in range(1, 1 + args.groups):
        t0 = time.perf_counter()
        blk = p._lde_group_packed(cf[:, g * wc:(g + 1) * wc])
        np.asarray(blk[:1, :1, :1])
        print(f"# lde_group_packed[{g}] {time.perf_counter()-t0:.2f}s",
              flush=True)

    bnb = p.bn + p.b
    t0 = time.perf_counter()
    buf = jnp.zeros((2, p.w, bnb), jnp.uint32)
    buf = p._write_cols(buf, blk, 0)
    np.asarray(buf[:1, :1, :1])
    print(f"# write_cols (compile+run) {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    lde = p._build_lde_packed(cf)
    np.asarray(lde[:1, :1, :1])
    full = time.perf_counter() - t0
    print(json.dumps({"full_build_lde_packed_s": round(full, 1)}), flush=True)


if __name__ == "__main__":
    main()
