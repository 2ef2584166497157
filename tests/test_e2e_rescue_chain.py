"""End-to-end: prove + verify the Rescue hash-chain AIR (the reference's
benches/rescue.rs workload) through the full STARK pipeline."""
import numpy as np
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import rescue_chain as RC
from certificate_stark_tpu.utils import rescue_ref as RR

OPTS = ProofOptions(num_queries=14, blowup=4, grinding_bits=0,
                    hash_fn="rescue", extension_degree=1,
                    fri_folding=4, fri_max_remainder=256)


def test_trace_matches_host_chain():
    ex = RC.RescueChainExample(4, OPTS)
    # host recompute: d_{i+1} = permutation([d_i, 0])[0..7]
    d = list(ex.seed)
    for _ in range(4):
        d = RR.permutation(list(d) + [0] * 7)[:7]
    assert ex.result == d


def test_prove_verify_roundtrip_no_fri_layers():
    ex = RC.RescueChainExample(4, OPTS)  # n=32, domain 128 <= 256: no FRI layers
    proof = ex.prove()
    assert ex.verify(proof)
    assert proof.size_bytes() > 0


def test_prove_verify_with_fri_layers():
    ex = RC.RescueChainExample(16, OPTS)  # n=128, domain 512: 1 FRI layer
    proof = ex.prove()
    assert len(proof.fri_roots) == 1
    assert ex.verify(proof)


def test_verify_rejects_wrong_inputs():
    ex = RC.RescueChainExample(4, OPTS)
    proof = ex.prove()
    bad = (ex.seed, [ex.result[0]] * 7)  # reference's negative pattern
    with pytest.raises(VerificationError):
        ex.verify(proof, pub_inputs=bad)


def test_verify_rejects_tampered_proof():
    ex = RC.RescueChainExample(4, OPTS)
    proof = ex.prove()
    proof.ood_h = [(v + 1) % 4719772409484279809 for v in proof.ood_h]
    with pytest.raises(VerificationError):
        ex.verify(proof)
