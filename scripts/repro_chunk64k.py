#!/usr/bin/env python
"""Minimal repro driver for the XLA:TPU fused eval+composition wrong-code
issue at 64k-point chunks (DESIGN.md "Chunk sizing", Prover._pick_eval_chunk).

Strategy: for a fixed small transaction AIR with a fixed seed, run a FULL
prove in a fresh subprocess at several CSTARK_EVAL_CHUNK sizes, hash the
proof bytes, and compare each hash against the CPU-backend proof at the
same chunk size (ground truth: CPU is bit-identical across chunk sizes).
The composition poly feeds OOD, DEEP, FRI and the coin, so a wrong poly
changes the proof bytes and fails verification — the proof SHA is the
discriminator.

Usage: python scripts/repro_chunk64k.py [--sizes 8192 32768 65536 131072]

Prints one JSON line per size: {"chunk": S, "proof_sha": ..., "verified":
bool, "match_cpu": bool}. A false match_cpu/verified at S=65536 with true
at neighbors reproduces the miscompile; all-true means the issue is gone
(e.g. newer runtime) and the default can be raised.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def run_composition(chunk, n_tx=32, backend=None):
    """Fresh-process worker: run a full prove at the given eval chunk and
    return (SHA256 of the proof bytes, verified flag)."""
    env = dict(os.environ, CSTARK_EVAL_CHUNK=str(chunk))
    if backend:
        env["JAX_PLATFORMS"] = backend
        if backend == "cpu":
            # the axon sitecustomize grabs the TPU tunnel when this is set,
            # regardless of JAX_PLATFORMS — the "CPU ground truth" worker
            # must not touch the device
            env.pop("PALLAS_AXON_POOL_IPS", None)
    import hashlib
    import subprocess
    code = r"""
import sys, hashlib
sys.path.insert(0, "/root/repo")
from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.models.transaction import TransactionExample

n_tx = %d
opts = ProofOptions(num_queries=42, blowup=8, hash_fn="blake3",
                    extension_degree=1)
# proof bytes as the discriminator: the composition poly feeds OOD, DEEP,
# FRI and the coin, so a wrong poly changes the bytes (and fails verify)
ex = TransactionExample(n_tx, opts, depth=3, seed=7)
proof = ex.prove()
h = hashlib.sha256(proof.to_bytes()).hexdigest()
ok = bool(ex.verify(proof))
print("RESULT", h, ok)
""" % n_tx
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            _, h, ok = line.split()
            return h, ok == "True"
    raise RuntimeError(
        f"worker failed (chunk={chunk}):\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[8192, 32768, 65536, 131072])
    ap.add_argument("--n-tx", type=int, default=32)
    args = ap.parse_args()

    # CPU ground truth at the default (unchunked on CPU)
    cpu_hash, cpu_ok = run_composition(0, args.n_tx, backend="cpu")
    print(json.dumps({"chunk": 0, "backend": "cpu", "proof_sha": cpu_hash,
                      "verified": cpu_ok}), flush=True)
    for s in args.sizes:
        h, ok = run_composition(s, args.n_tx)
        print(json.dumps({"chunk": s, "proof_sha": h, "verified": ok,
                          "match_cpu": h == cpu_hash}), flush=True)


if __name__ == "__main__":
    main()
