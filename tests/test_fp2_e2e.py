"""End-to-end coverage of the reference-strength fp2 curve instance
(CSTARK_CURVE=fp2, 245-bit scalar field — the library default; the rest of
the suite runs the fast b=57 subfield instance via conftest).

Covers: schnorr sub-AIR prove+verify roundtrip, and bit-identity of the
native-C composed-transaction trace against the Python row builder with the
fp2 b3 constant active (native/air_eval.c f6mulb3 fp2 path).
"""
import numpy as np
import pytest

from certificate_stark_tpu.utils import curve as CV


@pytest.fixture(autouse=True)
def _fp2_curve():
    prev = CV.CURVE_NAME
    CV.set_curve("fp2")
    yield
    CV.set_curve(prev)


def test_schnorr_roundtrip_fp2():
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.engine.verifier import VerificationError
    from certificate_stark_tpu.models import schnorr as SC

    opts = ProofOptions(num_queries=14, blowup=8, hash_fn="blake3")
    ex = SC.SchnorrExample(2, opts, seed=3)
    proof = ex.prove()
    assert ex.verify(proof)
    # serialization roundtrip: the 245-bit scalar decomposes into 4 base-p
    # digits (schnorr.scalar_digits), so every pub-input element fits the
    # 8-byte felt encoding (this exact path crashed with the old 2-digit
    # encoding — round-4 chip bench, engine/proof.py:48 OverflowError)
    from certificate_stark_tpu.engine.proof import Proof
    from certificate_stark_tpu.models.schnorr import scalar_digits
    assert scalar_digits() == 4
    data = proof.to_bytes()
    p2 = Proof.from_bytes(data)
    assert p2.to_bytes() == data
    assert ex.verify(p2)
    bad_msgs = [list(reversed(m)) for m in ex.messages]
    with pytest.raises(VerificationError):
        ex.verify(proof, pub_inputs=(bad_msgs, ex.signatures))


def test_numpy_transaction_trace_fp2():
    # the vectorized numpy builder exercises ops/ecc._mul_b3's fp2 path with
    # the stacked-batch b3 shape [4, 1, 6, T] (trace_np.py) — must match the
    # per-row Python-int builder
    import numpy as np
    from certificate_stark_tpu.models import trace_np as TN
    from certificate_stark_tpu.models import transaction as TX
    from certificate_stark_tpu.ops import field as F
    from certificate_stark_tpu.utils import witness as W

    md = W.build_random(2, 3, seed=5, with_signatures=True)
    msgs = [W.build_tx_message(md.s_old_values[i][:12],
                               md.r_old_values[i][:12],
                               md.deltas[i], md.s_old_values[i][13])
            for i in range(2)]
    rows = []
    for t, msg, sig in zip(md.tx_dicts(), msgs, md.signatures):
        rows.extend(TX.tx_rows(t, md.depth, msg, sig))
    ref = F.from_int(np.array(rows, dtype=object).T)
    got = np.asarray(TN.build_trace_np(md, msgs))
    assert np.array_equal(ref, got)


def test_native_transaction_trace_fp2():
    from certificate_stark_tpu.models import trace_native as TNV
    from certificate_stark_tpu.models import transaction as TX
    from certificate_stark_tpu.ops import field as F
    from certificate_stark_tpu.utils import witness as W

    if not TNV.available():
        pytest.skip("native lib not built")
    md = W.build_random(2, 3, seed=11, with_signatures=True)
    msgs = [W.build_tx_message(md.s_old_values[i][:12],
                               md.r_old_values[i][:12],
                               md.deltas[i], md.s_old_values[i][13])
            for i in range(2)]
    rows = []
    for t, msg, sig in zip(md.tx_dicts(), msgs, md.signatures):
        rows.extend(TX.tx_rows(t, md.depth, msg, sig))
    ref = F.from_int(np.array(rows, dtype=object).T)
    nat = np.asarray(TNV.build_trace_native(md, msgs))
    assert np.array_equal(ref, nat)
