"""Vectorized (batched numpy) trace generation vs the per-transaction
host-int builder — must be bit-identical."""
import numpy as np

from certificate_stark_tpu.models import trace_np as TN, transaction as TX
from certificate_stark_tpu.utils import witness as W


def test_vectorized_trace_matches_reference_builder():
    md = W.build_random(1, 3, seed=11, with_signatures=True)
    msgs = [W.build_tx_message(md.s_old_values[0][:12], md.r_old_values[0][:12],
                               md.deltas[0], md.s_old_values[0][13])]
    ref = np.array([list(r) for r in TX.tx_rows(
        md.tx_dicts()[0], 3, msgs[0], md.signatures[0])], dtype=object).T
    from certificate_stark_tpu.ops import field as F
    ref_limbs = F.from_int(ref)
    vec = TN.build_trace_np(md, msgs)
    assert np.array_equal(ref_limbs, vec)
