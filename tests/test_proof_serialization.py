"""Proof byte serialization roundtrip + cross-process verification."""
from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.proof import Proof
from certificate_stark_tpu.models import range as RG

OPTS = ProofOptions(num_queries=14, blowup=8, hash_fn="rescue")


def test_proof_bytes_roundtrip_and_verify():
    ex = RG.RangeExample(31415926, OPTS)
    proof = ex.prove()
    blob = proof.to_bytes()
    back = Proof.from_bytes(blob)
    assert back.to_bytes() == blob
    assert ex.verify(back)


def test_get_example_dispatch():
    """Reference parity: lib.rs-style get_example(name) (smoke, no proving)."""
    import pytest
    from certificate_stark_tpu.models import get_example
    from certificate_stark_tpu.engine.options import ProofOptions
    opts = ProofOptions(num_queries=4, blowup=4)
    ex = get_example("rescue-chain", 2, opts)
    assert ex.trace.shape[1:] == (14, 16)
    ex = get_example("range", 123456789, opts)
    assert ex.trace.shape[1] == 2
    with pytest.raises(ValueError):
        get_example("nope")
