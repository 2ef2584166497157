#!/usr/bin/env python
"""Instrumented flagship run: per-phase debug spans streamed to stderr,
full tracebacks, stage prints — for diagnosing big-domain failures
(the 1024-tx / 2^23-domain north star)."""
import argparse
import json
import logging
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

logging.basicConfig(
    level=logging.DEBUG,
    format="%(asctime)s %(name)s %(message)s",
    stream=sys.stderr)
for noisy in ("jax", "jax._src", "jax._src.dispatch", "jax._src.compiler",
              "jax._src.cache_key", "jax._src.compilation_cache",
              "jax._src.interpreters", "jax._src.xla_bridge"):
    logging.getLogger(noisy).setLevel(logging.WARNING)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=15)
    ap.add_argument("-q", "--queries", type=int, default=42)
    ap.add_argument("--hash-fn", default="blake3")
    ap.add_argument("--skip-warm", action="store_true")
    args = ap.parse_args()

    import jax
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.models.transaction import TransactionExample

    print(f"# backend={jax.default_backend()}", flush=True)
    opts = ProofOptions(num_queries=args.queries, blowup=8,
                        hash_fn=args.hash_fn, extension_degree=1)

    t0 = time.perf_counter()
    ex = TransactionExample(args.n, opts, depth=args.depth)
    print(f"# witness {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    try:
        proof = ex.prove()
    except Exception:
        traceback.print_exc()
        print(f"# COLD PROVE FAILED after {time.perf_counter()-t0:.1f}s",
              flush=True)
        sys.exit(1)
    cold = time.perf_counter() - t0
    print(f"# cold prove {cold:.1f}s", flush=True)

    warm = None
    if not args.skip_warm:
        t0 = time.perf_counter()
        proof = ex.prove()
        warm = time.perf_counter() - t0
        print(f"# warm prove {warm:.1f}s", flush=True)

    t0 = time.perf_counter()
    ok = ex.verify(proof)
    ver = time.perf_counter() - t0
    print(json.dumps({
        "n_tx": args.n, "depth": args.depth, "hash": args.hash_fn,
        "queries": args.queries, "backend": jax.default_backend(),
        "cold_prove_s": round(cold, 2),
        "warm_prove_s": round(warm, 2) if warm else None,
        "proof_kb": round(proof.size_bytes() / 1024, 1),
        "security_bits": proof.security_level(),
        "verify_s": round(ver, 3), "verified": bool(ok),
    }), flush=True)


if __name__ == "__main__":
    main()
