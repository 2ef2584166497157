"""Range-proof AIR e2e (reference: src/range/tests.rs)."""
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import range as RG
from certificate_stark_tpu.ops.field import P

OPTS = ProofOptions(num_queries=14, blowup=8, hash_fn="rescue")


def test_range_roundtrip():
    ex = RG.RangeExample(123456789123456789, OPTS)
    proof = ex.prove()
    assert ex.verify(proof)


def test_range_max_value():
    # max input: 2^63 - 1 >= p would wrap; reference accepts up to p-1 < 2^63
    ex = RG.RangeExample(P - 1, OPTS)
    proof = ex.prove()
    assert ex.verify(proof)


def test_range_wrong_number_rejected():
    ex = RG.RangeExample(98765, OPTS)
    proof = ex.prove()
    with pytest.raises(VerificationError):
        ex.verify(proof, number=(-98765) % P)


def test_range_sha256_hasher():
    """e2e with the byte-oriented SHA-256 commitment hasher."""
    opts = ProofOptions(num_queries=14, blowup=8, hash_fn="sha256")
    ex = RG.RangeExample(424242, opts)
    proof = ex.prove()
    assert ex.verify(proof)


def test_range_with_grinding():
    """PoW grinding path (grinding_bits > 0) through prove and verify."""
    opts = ProofOptions(num_queries=14, blowup=8, hash_fn="rescue",
                        grinding_bits=4)
    ex = RG.RangeExample(777, opts)
    proof = ex.prove()
    assert proof.pow_nonce >= 0
    assert ex.verify(proof)


def test_range_modulus_input_rejected():
    """Input == field modulus must be refused, not silently wrapped
    (reference #[should_panic], src/range/tests.rs:54-62)."""
    with pytest.raises(ValueError):
        RG.RangeExample(P, OPTS)


def test_range_negative_input_rejected():
    """Negative input must be refused (reference debug panic,
    src/range/tests.rs:64-73)."""
    with pytest.raises(ValueError):
        RG.RangeExample(-5, OPTS)
