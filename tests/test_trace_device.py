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


def test_device_trace_matches_numpy():
    from certificate_stark_tpu.models import trace_device as TD, trace_np as TN
    from certificate_stark_tpu.utils import witness as W
    md = W.build_random(1, 3, seed=3, with_signatures=True)
    msgs = [W.build_tx_message(md.s_old_values[0][:12], md.r_old_values[0][:12],
                               md.deltas[0], md.s_old_values[0][13])]
    ref = TN.build_trace_np(md, msgs)
    dev = np.asarray(TD.build_trace_device(md, msgs))
    assert np.array_equal(ref, dev)
