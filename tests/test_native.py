"""Native host crypto library vs python-int reference (skipped if not built)."""
import random

import pytest

from certificate_stark_tpu.utils import native as NV, rescue_ref as RR

pytestmark = pytest.mark.skipif(not NV.available(),
                                reason="native library not built")
rng = random.Random(6)


def test_native_digest_merge_match():
    vals = [rng.randrange(RR.P) for _ in range(23)]
    assert NV.digest(vals) == tuple(RR.digest(vals))
    d0 = [rng.randrange(RR.P) for _ in range(7)]
    d1 = [rng.randrange(RR.P) for _ in range(7)]
    assert NV.merge(d0, d1) == tuple(RR.merge(d0, d1))


def test_native_path_verify():
    from certificate_stark_tpu.utils import account_tree as AT
    t = AT.AccountTree(4)
    leaf = tuple(rng.randrange(RR.P) for _ in range(7))
    t.update_leaf(5, leaf)
    path = t.prove(5)
    assert NV.verify_path(t.root(), 5, path[0], path[1:])
    assert not NV.verify_path(t.root(), 5, path[0][:-1] + (0,), path[1:])
