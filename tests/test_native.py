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


def test_native_ntt_lde_bit_identical():
    """native/ntt.c transforms match ops/ntt.py exactly (all entry points)."""
    import numpy as np
    from certificate_stark_tpu.ops import field as F, ntt as NTT

    nprng = np.random.default_rng(7)
    n, w, b = 256, 3, 8
    vals = nprng.integers(0, F.P, size=(w, n), dtype=np.uint64)
    limbs = F.from_int(vals.astype(object))
    u = F.pack_u64(limbs)

    assert (NV.ntt_batch(u) == F.pack_u64(np.asarray(NTT.ntt(limbs)))).all()
    assert (NV.ntt_batch(u, inverse=True)
            == F.pack_u64(np.asarray(NTT.intt(limbs)))).all()

    cf, lde = NV.lde_batch(u, b, F.GENERATOR)
    assert (cf == F.pack_u64(np.asarray(NTT.intt(limbs)))).all()
    assert (lde == F.pack_u64(np.asarray(NTT.lde(limbs, b, F.GENERATOR)))).all()

    back = NV.intt_coset_batch(lde, F.GENERATOR)
    assert (back[:, :n] == cf).all() and (back[:, n:] == 0).all()
