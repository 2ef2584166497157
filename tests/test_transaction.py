"""Composed state-transition AIR e2e (reference: src/tests.rs; depth 3)."""
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError
from certificate_stark_tpu.models import transaction as TX

OPTS = ProofOptions(num_queries=14, blowup=8, hash_fn="rescue")


def test_transaction_roundtrip_two_txs():
    # 2 transactions: exercises cross-window root chaining (prev-root match)
    ex = TX.TransactionExample(2, OPTS, depth=3, seed=3)
    proof = ex.prove()
    assert ex.verify(proof)


@pytest.mark.full
def test_transaction_wrong_root_rejected():
    ex = TX.TransactionExample(2, OPTS, depth=3, seed=4)
    proof = ex.prove()
    bad = (list(ex.md.initial_roots[0]), [ex.md.final_root[0]] * 7)
    with pytest.raises(VerificationError):
        ex.verify(proof, pub_inputs=bad)
