#!/usr/bin/env python
"""State-transition example CLI — mirrors the reference's
examples/state-transition.rs:18-109 (gumdrop flags -> argparse):

  -n/--num-transactions, -q/--queries, -b/--blowup, -g/--grinding,
  -h handled by argparse; --hash-fn (rescue|sha256 here; the reference's
  Blake3/Sha3 are byte-hash options), -e/--extension (1 only in round 1),
  -f/--fri-folding, plus --depth (the reference fixes 15; 3 = test size).

Prints proof time, proof size, and verification time like the reference.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser(description="Topos state-transition STARK")
    ap.add_argument("-n", "--num-transactions", type=int, default=4)
    ap.add_argument("-q", "--queries", type=int, default=42)
    ap.add_argument("-b", "--blowup", type=int, default=8)
    ap.add_argument("-g", "--grinding", type=int, default=0)
    # defaults mirror the reference example (examples/state-transition.rs:63-72):
    # Blake3 commitments, CUBIC extension field
    ap.add_argument("--hash-fn", default="blake3",
                    choices=["rescue", "sha256", "blake3", "sha3"])
    ap.add_argument("-e", "--extension", type=int, default=3, choices=[1, 2, 3])
    ap.add_argument("-f", "--fri-folding", type=int, default=4, choices=[2, 4])
    ap.add_argument("--depth", type=int, default=15)
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="per-phase prover timing (reference: RUST_LOG=debug)")
    args = ap.parse_args()

    if args.verbose:
        import logging
        logging.basicConfig(level=logging.DEBUG,
                            format="%(name)s %(message)s")

    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.models.transaction import TransactionExample

    opts = ProofOptions(num_queries=args.queries, blowup=args.blowup,
                        grinding_bits=args.grinding, hash_fn=args.hash_fn,
                        extension_degree=args.extension,
                        fri_folding=args.fri_folding)
    t0 = time.time()
    ex = TransactionExample(args.num_transactions, opts, depth=args.depth)
    print(f"witness + trace built in {time.time() - t0:.2f} s "
          f"({args.num_transactions} txs, depth {args.depth})")

    t0 = time.time()
    proof = ex.prove()
    print(f"proof generated in {time.time() - t0:.2f} s")
    print(f"proof size: {proof.size_bytes() / 1024:.1f} KB")
    print(f"proof security: {proof.security_level()} bits")

    t0 = time.time()
    assert ex.verify(proof)
    print(f"proof verified in {time.time() - t0:.2f} s")


if __name__ == "__main__":
    main()
