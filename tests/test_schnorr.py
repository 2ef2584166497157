"""Schnorr sub-AIR e2e (reference: src/schnorr/tests.rs)."""
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import schnorr as SC

OPTS = ProofOptions(num_queries=14, blowup=8, hash_fn="rescue")


def test_schnorr_roundtrip():
    ex = SC.SchnorrExample(1, OPTS)
    proof = ex.prove()
    assert ex.verify(proof)


def test_schnorr_wrong_message_rejected():
    ex = SC.SchnorrExample(1, OPTS, seed=9)
    proof = ex.prove()
    bad_msgs = [list(reversed(m)) for m in ex.messages]
    with pytest.raises(VerificationError):
        ex.verify(proof, pub_inputs=(bad_msgs, ex.signatures))
