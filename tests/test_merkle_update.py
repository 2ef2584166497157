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
