"""Quadratic/cubic extension proof options e2e — mirrors the reference's
extension sweep (src/tests.rs:40-54; the example CLI defaults to Cubic)."""
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import range as RG, rescue_chain as RC


def _opts(ext):
    return ProofOptions(num_queries=14, blowup=4, hash_fn="rescue",
                        extension_degree=ext)


def test_rescue_chain_quadratic():
    ex = RC.RescueChainExample(4, _opts(2))
    proof = ex.prove()
    assert ex.verify(proof)


def test_rescue_chain_cubic():
    ex = RC.RescueChainExample(4, _opts(3))
    proof = ex.prove()
    assert ex.verify(proof)


def test_range_quadratic_and_negative():
    opts = ProofOptions(num_queries=14, blowup=8, hash_fn="rescue",
                        extension_degree=2)
    ex = RG.RangeExample(987654321, opts)
    proof = ex.prove()
    assert ex.verify(proof)
    with pytest.raises(VerificationError):
        ex.verify(proof, number=123)
