#!/usr/bin/env python
"""Round-5 final bench matrix (reference criterion sizes), ordered so the
rows missing from the first pass land first: state-transition 16/128 (the
first pass crashed on a transient relay error there), then the groups whose
warm times changed with the r5 device trace-gen / grouped-NTT / Pallas
work, then the already-recorded rescue/range rows for consistency."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benches import run  # noqa: E402


def main():
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.models import (merkle_update as MU,
                                              range as RG,
                                              rescue_chain as RC,
                                              schnorr as SC,
                                              transaction as TX)

    o4 = ProofOptions(num_queries=42, blowup=4, hash_fn="blake3")
    o8 = ProofOptions(num_queries=42, blowup=8, hash_fn="blake3")
    for u in (16, 128, 1):
        run(f"state_transition_{u}tx_d15",
            lambda u=u: TX.TransactionExample(u, o8, depth=15))
    for u in (128, 16, 1):
        run(f"schnorr_{u}sig", lambda u=u: SC.SchnorrExample(u, o8))
    for u in (128, 16, 1):
        run(f"merkle_update_{u}tx_d15",
            lambda u=u: MU.MerkleUpdateExample(u, o8, depth=15))
    run("range_64bit", lambda: RG.RangeExample(123456789123456789, o8))
    for chain in (1024, 512, 256, 128):
        run(f"rescue_chain_{chain}",
            lambda c=chain: RC.RescueChainExample(c, o4))


if __name__ == "__main__":
    main()
