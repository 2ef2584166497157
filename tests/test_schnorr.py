"""Schnorr sub-AIR e2e (reference: src/schnorr/tests.rs)."""
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import schnorr as SC

OPTS = ProofOptions(num_queries=14, blowup=8, hash_fn="rescue")


def test_schnorr_roundtrip_two_sigs():
    # 2 signatures: exercises multi-value sequence assertions and the
    # higher-degree pkey periodic columns (reference tests use 2 sigs)
    ex = SC.SchnorrExample(2, OPTS)
    proof = ex.prove()
    assert ex.verify(proof)


@pytest.mark.full
def test_schnorr_wrong_message_rejected():
    ex = SC.SchnorrExample(2, OPTS, seed=9)
    proof = ex.prove()
    bad_msgs = [list(reversed(m)) for m in ex.messages]
    with pytest.raises(VerificationError):
        ex.verify(proof, pub_inputs=(bad_msgs, ex.signatures))
