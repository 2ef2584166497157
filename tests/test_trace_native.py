"""Native C trace generation vs the per-transaction Python builder —
bit identical (the C step loop mirrors models/trace_np.py, which mirrors
reference src/trace.rs:28-142)."""
import numpy as np
import pytest


def _native_ok():
    from certificate_stark_tpu.models import trace_native as TNV
    return TNV.available()


@pytest.mark.skipif(not _native_ok(), reason="native lib not built")
def test_native_trace_matches_python():
    from certificate_stark_tpu.models import trace_native as TNV
    from certificate_stark_tpu.models import transaction as TX
    from certificate_stark_tpu.ops import field as F
    from certificate_stark_tpu.utils import witness as W

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


@pytest.mark.skipif(not _native_ok(), reason="native lib not built")
def test_native_trace_matches_numpy_batched_depth15():
    from certificate_stark_tpu.models import trace_native as TNV
    from certificate_stark_tpu.models import trace_np as TN
    from certificate_stark_tpu.utils import witness as W

    md = W.build_random(9, 15, seed=4, with_signatures=True)
    msgs = [W.build_tx_message(md.s_old_values[i][:12],
                               md.r_old_values[i][:12],
                               md.deltas[i], md.s_old_values[i][13])
            for i in range(9)]
    ref = TN.build_trace_np(md, msgs)
    nat = np.asarray(TNV.build_trace_native(md, msgs))
    assert np.array_equal(np.asarray(ref), nat)
