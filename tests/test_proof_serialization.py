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
