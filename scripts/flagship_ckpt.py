#!/usr/bin/env python
"""Checkpointed flagship run for the 1024-tx north star: every completed
phase (trace LDE+commit, composition, DEEP, FRI layers, PoW) is persisted
under --ckpt-dir, so a run killed by a wall-clock cap resumes where it left
off instead of restarting the 2^23-domain pipeline from scratch.

Same witness as scripts/flagship_probe.py (seed 42), so the two are
interchangeable; resumed proofs are byte-identical (tests/test_checkpoint.py).
"""
import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

logging.basicConfig(
    level=logging.DEBUG,
    format="%(asctime)s %(name)s %(message)s",
    stream=sys.stderr)
for noisy in ("jax", "jax._src"):
    logging.getLogger(noisy).setLevel(logging.WARNING)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=15)
    ap.add_argument("-q", "--queries", type=int, default=42)
    ap.add_argument("--hash-fn", default="blake3")
    ap.add_argument("--ckpt-dir", default="/tmp/flagship1024_ckpt")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "overwrites a shell-level JAX_PLATFORMS=cpu)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        # same LLVM-taming flags as tests/conftest.py: the CPU backend's
        # parallel/optimizing codegen is slow and sporadically crashy on
        # the big fused eval graphs
        fl = os.environ.get("XLA_FLAGS", "")
        fl += " --xla_cpu_parallel_codegen_split_count=1"
        fl += " --xla_llvm_disable_expensive_passes=true"
        os.environ["XLA_FLAGS"] = fl.strip()
    import jax
    if args.cpu:
        # the axon sitecustomize registers the tunnel backend and pins
        # jax_platforms before user code runs; only an explicit config
        # update overrides it (same trick as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.engine import prover as PRV
    from certificate_stark_tpu.models.transaction import (TransactionAir,
                                                          TransactionExample)

    print(f"# backend={jax.default_backend()}", flush=True)
    opts = ProofOptions(num_queries=args.queries, blowup=8,
                        hash_fn=args.hash_fn, extension_degree=1)

    t0 = time.perf_counter()
    ex = TransactionExample(args.n, opts, depth=args.depth)
    print(f"# witness {time.perf_counter()-t0:.1f}s", flush=True)

    n = 1024 * args.n
    air = TransactionAir(n, ex.pub_inputs(), opts, depth=args.depth)
    t0 = time.perf_counter()
    p = PRV.Prover(air)
    print(f"# Prover init {time.perf_counter()-t0:.1f}s "
          f"pack_lde={p._pack_lde} eval_chunk={p._eval_chunk}", flush=True)
    ck = p.checkpointer(args.ckpt_dir)

    t0 = time.perf_counter()
    trace = ex.trace
    print(f"# trace build {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    proof = p.prove(trace, checkpoint=ck)
    wall = time.perf_counter() - t0
    print(f"# prove (resumable) {wall:.1f}s", flush=True)

    res = {"n_tx": args.n, "depth": args.depth, "hash": args.hash_fn,
           "backend": jax.default_backend(), "prove_s": round(wall, 1),
           "proof_kb": round(proof.size_bytes() / 1024, 1),
           "security_bits": proof.security_level()}
    if args.verify:
        t0 = time.perf_counter()
        ok = ex.verify(proof)
        res["verify_s"] = round(time.perf_counter() - t0, 2)
        res["verified"] = bool(ok)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
