"""Batched witness generation path (T > 8): signatures and paths valid."""
from certificate_stark_tpu.utils import account_tree as AT, curve as CV, witness as W


def test_batched_witness_valid():
    md = W.build_random(9, 3, seed=5, with_signatures=True)
    for i in (0, 4, 8):
        msg = W.build_tx_message(md.s_old_values[i][:12], md.r_old_values[i][:12],
                                 md.deltas[i], md.s_old_values[i][13])
        assert CV.verify_signature(msg, md.signatures[i])
        assert AT.verify_path(md.initial_roots[i], md.s_indices[i],
                              md.s_paths[i], 3)
