#!/usr/bin/env python
"""Full benchmark matrix mirroring the reference's five criterion groups
(benches/{rescue,range,merkle,schnorr,state_transition}.rs). Prints one JSON
line per workload: prove (warm) and verify wall times + proof size.

bench.py remains the driver's single-line entry point; this is the detailed
harness. Sizes are configurable; defaults are scaled-down for CPU runs
(pass --full for the reference sizes).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(name, example_factory):
    ex = example_factory()
    t0 = time.time()
    proof = ex.prove()          # cold (includes compile)
    cold = time.time() - t0
    t0 = time.time()
    proof = ex.prove()
    prove_s = time.time() - t0
    t0 = time.time()
    assert ex.verify(proof)
    verify_s = time.time() - t0
    print(json.dumps({
        "bench": name, "prove_s": round(prove_s, 4),
        "prove_cold_s": round(cold, 4), "verify_s": round(verify_s, 4),
        "proof_kb": round(proof.size_bytes() / 1024, 1),
        "security_bits": proof.security_level(),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="reference-size workloads (chain 1024, 128 units, depth 15)")
    ap.add_argument("--hash-fn", default="blake3",
                    choices=["rescue", "sha256", "blake3", "sha3"],
                    help="commitment hash (blake3 = the reference benches')")
    args = ap.parse_args()

    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.models import (merkle_update as MU, range as RG,
                                              rescue_chain as RC, schnorr as SC,
                                              transaction as TX)

    q = 42
    o4 = ProofOptions(num_queries=q, blowup=4, hash_fn=args.hash_fn)
    o8 = ProofOptions(num_queries=q, blowup=8, hash_fn=args.hash_fn)
    # --full = the reference's exact criterion sizes
    # (benches/rescue.rs:365-392 chains 128..1024; benches/{merkle,schnorr,
    # state_transition}.rs:13-32 1/16/128 units at depth 15)
    chains = [128, 256, 512, 1024] if args.full else [64]
    unit_sizes = [1, 16, 128] if args.full else [2]
    depth = 15 if args.full else 3

    for chain in chains:
        run(f"rescue_chain_{chain}", lambda c=chain: RC.RescueChainExample(c, o4))
    run("range_64bit", lambda: RG.RangeExample(123456789123456789, o8))
    for u in unit_sizes:
        run(f"merkle_update_{u}tx_d{depth}",
            lambda u=u: MU.MerkleUpdateExample(u, o8, depth=depth))
    for u in unit_sizes:
        run(f"schnorr_{u}sig", lambda u=u: SC.SchnorrExample(u, o8))
    for u in unit_sizes:
        run(f"state_transition_{u}tx_d{depth}",
            lambda u=u: TX.TransactionExample(u, o8, depth=depth))


if __name__ == "__main__":
    main()
