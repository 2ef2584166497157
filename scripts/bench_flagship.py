#!/usr/bin/env python
"""Flagship benchmark: the composed state-transition AIR on real hardware.

Mirrors the reference's headline bench (benches/state_transition.rs:13-32:
1/16/128 txs, options 42 queries / blowup 8 / Blake3 / no extension /
fold 4 / remainder 256, depth-15 tree) plus the 1024-tx north star
(94 cols x 2^20 rows, LDE domain 2^23).

Per size prints one JSON line:
  {"n_tx": N, "witness_trace_s": ..., "cold_prove_s": ..., "warm_prove_s":
   ..., "phases": {...}, "proof_kb": ..., "security_bits": ...,
   "verify_s": ..., "backend": ...}

warm_prove_s includes trace generation (reference parity: criterion's
prove() = build_trace + engine prove). Phase spans come from the prover's
_PhaseTimer debug logging, captured via a logging handler.
"""
import argparse
import json
import logging
import sys
import time

sys.path.insert(0, "/root/repo")


class _PhaseCapture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.phases = {}

    def emit(self, record):
        msg = record.getMessage()
        parts = msg.rsplit(None, 2)
        if len(parts) == 3 and parts[2] == "ms":
            try:
                self.phases[parts[0]] = (
                    self.phases.get(parts[0], 0.0) + float(parts[1]) / 1e3)
            except ValueError:
                pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--num-transactions", type=int, nargs="+",
                    default=[16])
    ap.add_argument("-q", "--queries", type=int, default=42)
    ap.add_argument("-b", "--blowup", type=int, default=8)
    ap.add_argument("--hash-fn", default="blake3")
    ap.add_argument("-e", "--extension", type=int, default=1)
    ap.add_argument("--depth", type=int, default=15)
    args = ap.parse_args()

    import jax
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.models.transaction import TransactionExample

    backend = jax.default_backend()
    opts = ProofOptions(num_queries=args.queries, blowup=args.blowup,
                        hash_fn=args.hash_fn,
                        extension_degree=args.extension)

    for n in args.num_transactions:
        t0 = time.perf_counter()
        ex = TransactionExample(n, opts, depth=args.depth)
        wt = time.perf_counter() - t0

        # device trace generation, synced (the async scan otherwise hides
        # inside the first prover phase's wall time)
        from certificate_stark_tpu.models.transaction import build_trace
        jax.block_until_ready(build_trace(ex.md, ex.messages))  # compile
        t0 = time.perf_counter()
        tr = build_trace(ex.md, ex.messages)
        np_sync = __import__("numpy").asarray(tr[:, :1, :1])
        tg = time.perf_counter() - t0
        del tr, np_sync

        t0 = time.perf_counter()
        proof = ex.prove()
        cold = time.perf_counter() - t0

        cap = _PhaseCapture()
        plog = logging.getLogger("certificate_stark_tpu.prover")
        plog.addHandler(cap)
        plog.setLevel(logging.DEBUG)
        t0 = time.perf_counter()
        proof = ex.prove()  # prove() rebuilds the trace (reference parity)
        warm = time.perf_counter() - t0
        plog.removeHandler(cap)
        plog.setLevel(logging.WARNING)

        t0 = time.perf_counter()
        ok = ex.verify(proof)
        ver = time.perf_counter() - t0
        assert ok

        print(json.dumps({
            "n_tx": n, "depth": args.depth, "hash": args.hash_fn,
            "queries": args.queries, "blowup": args.blowup,
            "ext": args.extension, "backend": backend,
            "witness_trace_s": round(wt, 2),
            "trace_gen_dev_s": round(tg, 2),
            "cold_prove_s": round(cold, 2),
            "warm_prove_s": round(warm, 2),
            "phases": {k: round(v, 3) for k, v in cap.phases.items()},
            "proof_kb": round(proof.size_bytes() / 1024, 1),
            "security_bits": proof.security_level(),
            "verify_s": round(ver, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
