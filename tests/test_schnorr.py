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


def test_device_sig_trace_matches_per_row():
    """build_trace_device_sig (composed-lane reuse) must be bit-identical to
    the per-row Python-int builder sig_rows for a >4-signature batch (the
    accelerator dispatch threshold in build_trace)."""
    import numpy as np
    from certificate_stark_tpu.models import schnorr as SC
    from certificate_stark_tpu.ops import field as F
    from certificate_stark_tpu.utils import curve as CV

    import random
    rng = random.Random(9)
    msgs, sigs = [], []
    for _ in range(6):
        skey = rng.randrange(1, CV.SCALAR_Q)
        msg = (CV.pkey_coords(skey)
               + [rng.randrange(F.P) for _ in range(14)] + [0, 0])[:28]
        sigs.append(CV.sign(msg, skey, rng))
        msgs.append(msg)
    ref_rows = []
    for m, s in zip(msgs, sigs):
        ref_rows.extend(SC.sig_rows(m, s))
    ref = F.from_int(np.array(ref_rows, dtype=object).T)
    from certificate_stark_tpu.models import trace_device as TD
    got = np.asarray(TD.build_trace_device_sig(msgs, sigs))
    assert np.array_equal(ref, got)
