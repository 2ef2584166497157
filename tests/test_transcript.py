"""Golden Fiat-Shamir transcript vectors.

The proving protocol here is self-defined (PARITY.md "Known divergences" #1:
the winterfell fork is unvendorable, so bit-identity with it is impossible).
These tests pin the protocol against committed vectors so that any silent
drift — coin draw order, serialization, phase structure, degree bookkeeping —
breaks loudly, including under sharding/packing/native-kernel refactors
(which are all required to be bit-identical).

Per fixed-seed workload we pin:
  * the coin journal: seed state, state after each phase reseed, and every
    drawn field element, in order (engine/coin.py RandomCoin.journal);
  * the SHA-256 of the serialized proof bytes (covers everything the journal
    does not: query openings, Merkle paths, remainder, layout).

Regenerate INTENTIONALLY with scripts/gen_transcript_vectors.py; the diff of
tests/vectors/transcripts.json is the reviewable record of a protocol change.
"""
import hashlib
import json
import os

import pytest

VECTOR_PATH = os.path.join(os.path.dirname(__file__), "vectors",
                           "transcripts.json")


def _workloads():
    from certificate_stark_tpu.engine.options import ProofOptions

    return {
        "rescue_chain16_blake3": lambda: _rescue_chain(
            ProofOptions(num_queries=14, blowup=4, hash_fn="blake3")),
        "rescue_chain16_rescue": lambda: _rescue_chain(
            ProofOptions(num_queries=14, blowup=4, hash_fn="rescue")),
        "rescue_chain16_cubic_grind4": lambda: _rescue_chain(
            ProofOptions(num_queries=8, blowup=4, hash_fn="blake3",
                         extension_degree=3, grinding_bits=4)),
        "range_64bit": _range,
    }


def _rescue_chain(opts):
    from certificate_stark_tpu.engine import prover as PR
    from certificate_stark_tpu.models import rescue_chain as RC

    ex = RC.RescueChainExample(16, opts)
    air = RC.RescueChainAir(16 * 8, ex.pub_inputs(), opts)
    p = PR.Prover(air)
    p.coin_journal = []
    proof = p.prove(ex.trace)
    assert ex.verify(proof)
    return p.coin_journal, proof


def _range():
    from certificate_stark_tpu.engine import prover as PR
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.models import range as RG

    opts = ProofOptions(num_queries=14, blowup=8, hash_fn="blake3")
    ex = RG.RangeExample(0x0123456789ABCDEF, opts)
    air = RG.RangeAir(RG.RANGE_LOG, [ex.number], opts)
    p = PR.Prover(air)
    p.coin_journal = []
    proof = p.prove(ex.trace)
    assert ex.verify(proof)
    return p.coin_journal, proof


def _encode(journal, proof):
    return {
        "journal": [[kind, val] for kind, val in journal],
        "proof_sha256": hashlib.sha256(proof.to_bytes()).hexdigest(),
        "proof_len": len(proof.to_bytes()),
    }


def generate_all():
    return {name: _encode(*fn()) for name, fn in _workloads().items()}


@pytest.mark.parametrize("name", list(_workloads()))
def test_transcript_matches_golden(name):
    assert os.path.exists(VECTOR_PATH), \
        "missing golden vectors: run scripts/gen_transcript_vectors.py"
    with open(VECTOR_PATH) as f:
        golden = json.load(f)[name]
    journal, proof = _workloads()[name]()
    got = _encode(journal, proof)
    # journal first: a drift here names the exact protocol step that moved
    for i, (g, o) in enumerate(zip(golden["journal"], got["journal"])):
        assert g == o, f"{name}: transcript drift at journal event {i}: " \
                       f"golden {g[0]}, got {o[0]}"
    assert len(golden["journal"]) == len(got["journal"])
    assert golden["proof_sha256"] == got["proof_sha256"]
    assert golden["proof_len"] == got["proof_len"]
