#!/usr/bin/env python
"""Re-run the bench-matrix rows whose round-5 first pass was limited by
per-row host trace generation (schnorr/merkle 16-128 units, now vectorized)
or by CPU contention during the measurement window (merkle_update_128tx)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches import run  # noqa: E402


def main():
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.models import (merkle_update as MU,
                                              schnorr as SC)

    o8 = ProofOptions(num_queries=42, blowup=8, hash_fn="blake3")
    run("merkle_update_16tx_d15",
        lambda: MU.MerkleUpdateExample(16, o8, depth=15))
    run("merkle_update_128tx_d15",
        lambda: MU.MerkleUpdateExample(128, o8, depth=15))
    run("schnorr_16sig", lambda: SC.SchnorrExample(16, o8))
    run("schnorr_128sig", lambda: SC.SchnorrExample(128, o8))


if __name__ == "__main__":
    main()
