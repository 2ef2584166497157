"""Merkle-update sub-AIR e2e (reference: src/merkle/update/tests.rs; depth 3
as in the reference's #[cfg(test)] constant)."""
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import merkle_update as MU
from certificate_stark_tpu.utils import account_tree as AT, witness as W

OPTS = ProofOptions(num_queries=14, blowup=4, hash_fn="rescue")


def test_witness_paths_are_valid():
    md = W.build_random(2, 3, seed=7)
    for i in range(2):
        path = md.s_paths[i]
        assert AT.verify_path(md.initial_roots[i], md.s_indices[i], path, 3)
        assert path[0] == AT.leaf_hash(md.s_old_values[i])


def test_merkle_update_roundtrip():
    ex = MU.MerkleUpdateExample(1, OPTS, depth=3, seed=2)
    proof = ex.prove()
    assert ex.verify(proof)


@pytest.mark.full
def test_merkle_update_wrong_root_rejected():
    ex = MU.MerkleUpdateExample(1, OPTS, depth=3, seed=3)
    proof = ex.prove()
    bad = (list(ex.md.initial_roots[0]), [ex.md.final_root[0]] * 7)
    with pytest.raises(VerificationError):
        ex.verify(proof, pub_inputs=bad)


def test_device_mu_trace_matches_per_row():
    """build_trace_device_mu (composed-lane reuse) must be bit-identical to
    the per-row tx_rows builder (incl. the row-1 degree-stabilization hack)
    for a batch above the accelerator dispatch threshold."""
    import numpy as np
    from certificate_stark_tpu.models import merkle_update as MU
    from certificate_stark_tpu.ops import field as F
    from certificate_stark_tpu.utils import witness as W

    md = W.build_random(6, 3, seed=21)
    txs = md.tx_dicts()
    all_rows = []
    for t in txs:
        all_rows.extend(MU.tx_rows(t["initial_root"], t["s_old"], t["r_old"],
                                   t["delta"], t["s_idx"], t["r_idx"],
                                   t["s_path"], t["r_path"], md.depth))
    all_rows[1][MU.S_BIT] = 1
    all_rows[1][MU.R_BIT] = 1
    ref = F.from_int(np.array(all_rows, dtype=object).T)
    from certificate_stark_tpu.models import trace_device as TD
    got = np.asarray(TD.build_trace_device_mu(txs, md.depth))
    assert np.array_equal(ref, got)
