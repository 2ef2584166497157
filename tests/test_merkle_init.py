"""Pre-Merkle init sub-AIR e2e (reference: src/merkle/init/tests.rs)."""
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import merkle_init as MI

OPTS = ProofOptions(num_queries=14, blowup=8, hash_fn="rescue")


def test_merkle_init_roundtrip():
    ex = MI.MerkleInitExample(OPTS)
    proof = ex.prove()
    assert ex.verify(proof)


@pytest.mark.full
def test_merkle_init_wrong_inputs_rejected():
    ex = MI.MerkleInitExample(OPTS)
    proof = ex.prove()
    # reference negative pattern: r_inputs for s_inputs + doubled delta
    bad = (ex.r_inputs, ex.r_inputs, 2 * ex.delta)
    with pytest.raises(VerificationError):
        ex.verify(proof, pub_inputs=bad)
