"""Extension-field e2e sweep over every AIR model — parity with the
reference's per-module 4-test suites, which run each prove/verify roundtrip
under None/Quadratic/Cubic (src/tests.rs:11-38, src/schnorr/tests.rs,
src/merkle/update/tests.rs, src/merkle/init/tests.rs, src/range/tests.rs).
The base-field roundtrips live in the per-model test files; this file covers
degrees 2 and 3 — including cubic for the composed transaction AIR, the
example CLI's default (examples/state-transition.rs:63-67).
"""
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine.verifier import VerificationError


def _opts(ext, blowup=8):
    return ProofOptions(num_queries=8, blowup=blowup, hash_fn="blake3",
                        extension_degree=ext)


@pytest.mark.parametrize("ext", [2, 3])
@pytest.mark.full
def test_schnorr_extension(ext):
    from certificate_stark_tpu.models import schnorr as SC
    ex = SC.SchnorrExample(2, _opts(ext), seed=21)
    proof = ex.prove()
    assert ex.verify(proof)


@pytest.mark.parametrize("ext", [2, 3])
@pytest.mark.full
def test_merkle_update_extension(ext):
    from certificate_stark_tpu.models import merkle_update as MU
    ex = MU.MerkleUpdateExample(2, _opts(ext, blowup=4), depth=3, seed=22)
    proof = ex.prove()
    assert ex.verify(proof)


@pytest.mark.parametrize("ext", [2, 3])
@pytest.mark.full
def test_merkle_init_extension(ext):
    from certificate_stark_tpu.models import merkle_init as MI
    ex = MI.MerkleInitExample(_opts(ext))
    proof = ex.prove()
    assert ex.verify(proof)


def test_transaction_cubic():
    from certificate_stark_tpu.models import transaction as TX
    ex = TX.TransactionExample(2, _opts(3), depth=3, seed=24)
    proof = ex.prove()
    assert ex.verify(proof)


@pytest.mark.full
def test_transaction_quadratic_negative():
    from certificate_stark_tpu.models import transaction as TX
    ex = TX.TransactionExample(2, _opts(2), depth=3, seed=25)
    proof = ex.prove()
    assert ex.verify(proof)
    bad = (list(ex.md.initial_roots[0]), [ex.md.final_root[0]] * 7)
    with pytest.raises(VerificationError):
        ex.verify(proof, pub_inputs=bad)
