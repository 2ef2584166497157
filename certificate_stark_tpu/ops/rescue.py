"""Rescue-Prime (Rescue-XLIX) over f63 as batched JAX limb kernels.

Functional parity with the reference hash (src/utils/rescue.rs): STATE_WIDTH=14,
RATE=7, DIGEST=7, 7 rounds, alpha=3, INV_ALPHA=3146514939656186539, hash cycle 8
(8th ARK row all-zero), sponge without padding (rescue.rs:93,123 TODO upstream),
`merge` concatenating two digests across the full state (rescue.rs:143-152).

TPU design: a batch of states is a limb array [4, 14, B] (B = lanes axis); the
s-box is 2 field muls, the inverse s-box a 63-step fori_loop power, and the MDS
layer a broadcasted mul + log-tree reduction. Everything fuses under jit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from . import ntt as NTT
from ..params import data as D

STATE_WIDTH = 14
RATE_WIDTH = 7
DIGEST_SIZE = 7
NUM_ROUNDS = 7
CYCLE_LENGTH = 8
INV_ALPHA = D.INV_ALPHA

# Montgomery-form constant tables
MDS = np.stack([F.from_int(np.array(D.RESCUE_MDS, dtype=object).reshape(14, 14))])[0]      # [4,14,14]
INV_MDS = np.stack([F.from_int(np.array(D.RESCUE_INV_MDS, dtype=object).reshape(14, 14))])[0]
ARK = F.from_int(np.array(D.RESCUE_ARK, dtype=object))  # [4, 8, 28]


def sbox(state, xp=jnp):
    """x -> x^3 elementwise."""
    return F.mul(state, F.square(state, xp), xp)


def inv_sbox(state, xp=jnp):
    """x -> x^(1/3) elementwise (exponent INV_ALPHA)."""
    return F.pow_const(state, INV_ALPHA, xp=xp)


_MDS_MXU = None


def _mds_mxu_enabled():
    """Gate for the MXU MDS path: on for accelerator backends (default),
    off on XLA:CPU and the numpy namespace. CSTARK_MDS_MXU=0/1 overrides."""
    global _MDS_MXU
    if _MDS_MXU is None:
        import os
        v = os.environ.get("CSTARK_MDS_MXU")
        if v is not None:
            _MDS_MXU = v != "0"
        else:
            try:
                _MDS_MXU = jax.default_backend() != "cpu"
            except Exception:  # noqa: BLE001
                _MDS_MXU = False
    return _MDS_MXU


_MXU_TABLES = {}


def _mxu_table(mds_table):
    """Block byte-plane matrix Mbig [15*14, 8*14] f32 with
    Mbig[(k,i),(q,j)] = byte-plane (k-q) of MDS[i][j] (0 <= k-q < 8):
    one [210,112]@[112,B] matmul yields every byte-weight column sum
    cols[k][i] = sum_{p+q=k} sum_j M_p[i,j]*S_q[j] of the limb product."""
    m = np.asarray(mds_table)                  # [4,14,14] u32 16-bit limbs
    key = m.tobytes()                          # content key: id() can be
    tbl = _MXU_TABLES.get(key)                 # reused after GC
    if tbl is None:
        planes = np.zeros((8, 14, 14), dtype=np.float32)
        for limb in range(4):
            planes[2 * limb] = (m[limb] & 0xFF).astype(np.float32)
            planes[2 * limb + 1] = (m[limb] >> 8).astype(np.float32)
        big = np.zeros((15 * 14, 8 * 14), dtype=np.float32)
        for k in range(15):
            for q in range(8):
                p = k - q
                if 0 <= p < 8:
                    big[k * 14:(k + 1) * 14, q * 14:(q + 1) * 14] = planes[p]
        # cache the HOST array only: a device array created inside one jit
        # trace must not leak into another (UnexpectedTracerError)
        tbl = big.astype(jnp.bfloat16)
        _MXU_TABLES[key] = tbl
    return jnp.asarray(tbl)


# Past this flattened batch size the matmul's [210, LB] f32 column block
# (~3.4 KB/lane) plus the byte planes overflow VMEM and XLA spills the fused
# intermediates to HBM — measured cliff on v5e: batch 4096 = 5.9 ms but
# batch 65536 = 627 ms (16x data, 106x time). lax.map over sub-batches keeps
# each matmul VMEM-resident; 16384 lanes ~ 14 MB of f32 columns.
_MDS_MXU_CHUNK = 16384


def _mds_apply_mxu(state, mds_table):
    """MDS apply on the MXU: byte-split limbs (exact in bf16, products
    accumulate exactly in f32 < 2^24), ONE [210,112]@[112,L*B] matmul, then
    a single deferred Montgomery reduction per output (field.redc_cols16)."""
    B = state.shape[-1]
    s = state.reshape((4, -1, 14, B))          # [4, L, 14, B]
    L = s.shape[1]
    C = _MDS_MXU_CHUNK
    bc = C // max(L, 1)
    if bc > 0 and L * B > C and B % bc == 0:
        nch = B // bc
        sc = jnp.moveaxis(s.reshape(4, L, 14, nch, bc), -2, 0)
        out = jax.lax.map(lambda x: _mds_apply_mxu(
            x.reshape((4, L, 14, bc)), mds_table), sc)
        return jnp.moveaxis(out, 0, -2).reshape(state.shape)
    planes = []
    for limb in range(4):
        planes.append(s[limb] & np.uint32(0xFF))
        planes.append(s[limb] >> 8)
    sf = jnp.stack(planes).astype(jnp.bfloat16)        # [8, L, 14, B]
    sflat = sf.transpose(0, 2, 1, 3).reshape(112, L * B)
    mbig = _mxu_table(mds_table)
    cols = jnp.dot(mbig, sflat,
                   preferred_element_type=jnp.float32)  # [210, L*B]
    colsu = cols.astype(jnp.uint32).reshape(15, 14, L, B)
    t16 = [colsu[2 * j] + (colsu[2 * j + 1] << 8) if 2 * j + 1 < 15
           else colsu[2 * j] for j in range(8)]
    out = F.redc_cols16(t16, 14)               # [4, 14, L, B]
    return out.transpose(0, 2, 1, 3).reshape(state.shape)


def mds_apply(state, mds_table=None, xp=jnp):
    """MDS matrix-vector product. state: [4, ..., 14, B] -> same shape.

    mds[i] = sum_j MDS[i][j] * state[j].
    """
    if mds_table is None:
        mds_table = MDS
    if xp is jnp and _mds_mxu_enabled():
        return _mds_apply_mxu(state, mds_table)
    lead = state.ndim - 3  # extra axes between limbs and the (14, B) tail
    m = xp.asarray(mds_table).reshape((4,) + (1,) * lead + (14, 14, 1))
    s = state[..., None, :, :]  # [4, ..., 1, 14, B]
    # fused dot: one deferred Montgomery reduction per output element instead
    # of 14 (F.mul_sum) — the MDS layer dominates Rescue constraint evaluation
    return F.mul_sum(m, s, axis=-2, xp=xp)


def add_ark(state, round_idx, half, xp=jnp):
    """Add round constants; half=0 first 14, half=1 last 14. Static round."""
    ark = xp.asarray(ARK[:, round_idx, half * 14:(half + 1) * 14])
    lead = state.ndim - 3
    ark = ark.reshape((4,) + (1,) * lead + (14, 1))
    return F.add(state, xp.broadcast_to(ark, state.shape), xp)


def _add_ark_dyn(state, ark_row):
    """Add a (possibly traced-index) ARK row [4, 14] to state [4, ..., 14, B]."""
    lead = state.ndim - 3
    ark = ark_row.reshape((4,) + (1,) * lead + (14, 1))
    return F.add(state, jnp.broadcast_to(ark, state.shape))


def apply_round(state, round_idx: int, xp=jnp):
    """One Rescue round (reference rescue.rs:246-263)."""
    state = sbox(state, xp)
    state = mds_apply(state, xp=xp)
    state = add_ark(state, round_idx % CYCLE_LENGTH, 0, xp)
    state = inv_sbox(state, xp)
    state = mds_apply(state, xp=xp)
    state = add_ark(state, round_idx % CYCLE_LENGTH, 1, xp)
    return state


def _pallas_perm_min() -> int:
    """Batch threshold above which the fused Pallas permutation kernel
    replaces the XLA path on TPU. Measured on v5e (r5 probe,
    scripts/perf_probe_r5.py --pallas): XLA 699 K perms/s at batch 4k but
    only 110 K at 64k (the byte-plane MDS working set falls out of VMEM);
    the Pallas kernel holds ~205 K perms/s flat (VMEM-resident state across
    all 7 rounds) and wins 1.87x at 64k. 0 disables."""
    import os
    global _PALLAS_MIN
    if _PALLAS_MIN is None:
        _PALLAS_MIN = int(os.environ.get("CSTARK_RESCUE_PALLAS_MIN", "32768"))
    return _PALLAS_MIN


_PALLAS_MIN = None


def _try_pallas_perm(state):
    thr = _pallas_perm_min()
    if thr <= 0 or state.ndim < 3 or state.shape[:2] != (4, 14):
        return None
    lead = state.shape[2:]
    n = 1
    for d in lead:
        n *= d
    if n < thr:
        return None
    try:
        import jax as _jax
        if _jax.default_backend() == "cpu":
            return None
        from . import pallas_kernels as PK
        if n % PK.RESCUE_BLK:
            return None
        out = PK.pallas_rescue_permutation(state.reshape(4, 14, n))
        return out.reshape(state.shape)
    except Exception:  # noqa: BLE001 — fall back to the XLA path
        return None


def permutation(state):
    """Full 7-round permutation as a fori_loop (one compiled round body —
    keeps kernel graphs small enough for fast XLA compiles). Large batches
    on TPU dispatch to the fused Pallas kernel (_try_pallas_perm) — 1.87x
    the XLA path at the 64k commit-batch cliff, bit-identical (tested)."""
    pk = _try_pallas_perm(state)
    if pk is not None:
        return pk
    ark_tbl = jnp.asarray(ARK)  # [4, 8, 28]

    def body(r, st):
        st = sbox(st)
        st = mds_apply(st)
        st = _add_ark_dyn(st, ark_tbl[:, r, :14])
        st = inv_sbox(st)
        st = mds_apply(st)
        st = _add_ark_dyn(st, ark_tbl[:, r, 14:])
        return st

    return jax.lax.fori_loop(0, NUM_ROUNDS, body, state)


def digest(elements):
    """Sponge digest of [4, k, B] element columns -> [4, 7, B].

    Absorbs rate-width chunks with addition, permuting after each full chunk and
    once more for a trailing partial chunk (no padding, matching the reference).
    """
    k = elements.shape[1]
    b = elements.shape[2:]
    state = jnp.zeros((4, STATE_WIDTH) + b, dtype=jnp.uint32)
    i = 0
    while i < k:
        chunk = elements[:, i:i + RATE_WIDTH]
        c = chunk.shape[1]
        state = state.at[:, :c].set(F.add(state[:, :c], chunk))
        state = permutation(state)
        i += RATE_WIDTH
    return state[:, :DIGEST_SIZE]


def merge(d0, d1):
    """2-to-1 merge of digests [4, 7, B] -> [4, 7, B] (reference rescue.rs:143-152)."""
    state = jnp.concatenate([d0, d1], axis=1)
    state = permutation(state)
    return state[:, :DIGEST_SIZE]


TRUNC_DIGEST = 4  # commitment digests truncated to 4 elements (32 bytes)


def merge4(d0, d1):
    """2-to-1 merge of TRUNCATED digests [4, 4, B] -> [4, 4, B].

    INTENTIONAL DEVIATION from the reference: Hasher::merge there absorbs
    both FULL 7-element digests (rescue.rs:143-152); only the 32-byte
    serialization truncates to 4 elements (Digest::as_bytes,
    rescue.rs:202-211 — ~126-bit collision resistance). Our proof-commitment
    Merkle trees hash the truncated form natively — a DIFFERENT tree hash
    with the same 126-bit collision target — which cuts every
    authentication-path node from 56 to 32 bytes. security_level() derives
    the 126-bit hash term from this truncated width. Layout mirrors the
    reference merge (v0 -> state[..7], v1 -> state[7..14]) restricted to
    the surviving 4 elements; the unused
    rate positions stay zero, leaving >= 6 zero capacity elements."""
    b = d0.shape[2:]
    state = jnp.zeros((4, STATE_WIDTH) + b, dtype=jnp.uint32)
    state = state.at[:, 0:TRUNC_DIGEST].set(d0)
    state = state.at[:, 7:7 + TRUNC_DIGEST].set(d1)
    state = permutation(state)
    return state[:, :TRUNC_DIGEST]


merge_jit = jax.jit(merge)
digest_jit = jax.jit(digest)
