"""Device (lax.scan) trace generation vs the numpy builder — bit identical.

Runs by default on accelerator backends (where this is the production path,
see models/transaction.build_trace); on XLA:CPU the 511-step scan compiles
and executes slowly, so opt in there with RUN_SLOW=1.
"""
import os

import numpy as np
import pytest


def _on_accelerator():
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001
        return False


pytestmark = pytest.mark.skipif(
    not (os.environ.get("RUN_SLOW") or _on_accelerator()),
    reason="slow on CPU; set RUN_SLOW=1 (runs by default on TPU)")


def _case(n_tx, depth, seed):
    from certificate_stark_tpu.models import trace_device as TD, trace_np as TN
    from certificate_stark_tpu.utils import witness as W
    md = W.build_random(n_tx, depth, seed=seed, with_signatures=True)
    msgs = [W.build_tx_message(md.s_old_values[i][:12],
                               md.r_old_values[i][:12],
                               md.deltas[i], md.s_old_values[i][13])
            for i in range(n_tx)]
    ref = TN.build_trace_np(md, msgs)
    dev = np.asarray(TD.build_trace_device(md, msgs))
    assert np.array_equal(ref, dev), (n_tx, depth, seed)


def test_device_trace_matches_numpy():
    _case(1, 3, seed=3)


@pytest.mark.parametrize("n_tx,depth,seed", [
    (2, 3, 11),       # multi-tx: the vmapped lane batch axis is exercised
    (4, 7, 5),        # deeper tree: longer Merkle-path lane segments
    (3, 15, 9),       # production depth (the flagship bench config)
])
def test_device_trace_matches_numpy_shapes(n_tx, depth, seed):
    _case(n_tx, depth, seed)


def test_device_trace_unroll_invariant():
    """CSTARK_TRACE_UNROLL changes the scan schedule, never the trace."""
    from certificate_stark_tpu.models import trace_device as TD
    from certificate_stark_tpu.models import trace_np as TN
    from certificate_stark_tpu.utils import witness as W
    md = W.build_random(1, 3, seed=21, with_signatures=True)
    msgs = [W.build_tx_message(md.s_old_values[0][:12],
                               md.r_old_values[0][:12],
                               md.deltas[0], md.s_old_values[0][13])]
    ref = TN.build_trace_np(md, msgs)
    old = os.environ.get("CSTARK_TRACE_UNROLL")
    try:
        # unr is a static jit arg of _jit_phase1/_jit_phase2, so each value
        # compiles (and runs) its own schedule — no cache clearing needed
        for unr in ("1", "2"):
            os.environ["CSTARK_TRACE_UNROLL"] = unr
            dev = np.asarray(TD.build_trace_device(md, msgs))
            assert np.array_equal(ref, dev), unr
    finally:
        if old is None:
            os.environ.pop("CSTARK_TRACE_UNROLL", None)
        else:
            os.environ["CSTARK_TRACE_UNROLL"] = old
