"""The TPU STARK prover pipeline.

Counterpart of winterfell's `Prover::prove` as used by every reference prover
(src/prover.rs:101-134): trace LDE -> trace commitment -> constraint evaluation
-> composition polynomial -> OOD frame -> DEEP composition -> FRI -> queries.

Architecture: the pipeline is split at its Fiat-Shamir barriers into five
jit-compiled phase kernels (trace/commit, composition/commit, OOD, DEEP, FRI
layers). Each phase is one fused XLA computation over the whole LDE domain; the
host only runs the public coin between phases and assembles the proof. Phase
executables are cached on the Prover instance, so repeated proofs (benchmarks,
batch proving) pay compilation once.

Extension options: the composition/OOD/DEEP/FRI data carries a trailing
extension axis (d = 1/2/3); the base-field case is the d=1 degeneration of the
same kernels, so one code path serves all options.
"""
from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as F, ntt as NTT
from ..utils import poly_host as PH
from . import fri as FRI
from . import merkle as M
from .coin import RandomCoin
from .fieldops import BASE
from .hasher import get_hasher
from .proof import Proof, QueryOpening


logger = logging.getLogger("certificate_stark_tpu.prover")


class _PhaseTimer:
    """Per-phase wall spans, mirroring the reference's Instant + log::debug
    instrumentation around each proving phase (src/lib.rs:118-137). Device
    arrays are synced before reading the clock ONLY when debug logging is on,
    so the instrumented path costs nothing in production (no barriers).

    Sync is a 1-element device->host READBACK, not block_until_ready: through
    the axon remote tunnel block_until_ready returns before execution
    finishes, which silently shifted whole phases into the NEXT span (the
    round-4 1024-tx profile attributed ~530 s of trace-commit hashing to
    'coin + coeff draws' — found by the r5 instrumented run)."""

    def __init__(self):
        self.enabled = logger.isEnabledFor(logging.DEBUG)
        self.t = time.perf_counter() if self.enabled else 0.0

    def mark(self, label: str, *arrays):
        if not self.enabled:
            return
        for a in arrays:
            try:
                np.asarray(a[(slice(0, 1),) * a.ndim])
            except TypeError:
                jax.block_until_ready(a)
        now = time.perf_counter()
        logger.debug("%-22s %8.1f ms", label, (now - self.t) * 1e3)
        self.t = now


def _limb(x: int) -> jnp.ndarray:
    return jnp.asarray(F.from_int(np.array([x], dtype=object)))[:, 0]  # [4]


def _limbs(xs) -> jnp.ndarray:
    return jnp.asarray(F.from_int(np.array(list(xs), dtype=object)))  # [4, len]


def powers_dyn(z: jnp.ndarray, count: int) -> jnp.ndarray:
    """[z^0 .. z^(count-1)] for a traced scalar z [4] -> [4, count]."""
    tbl = jnp.asarray(F.ONE_MONT).reshape(4, 1)
    zz = z.reshape(4, 1)
    cur = 1
    while cur < count:
        step = jnp.broadcast_to(zz, (4, min(cur, count - cur)))
        nxt = F.mul(tbl[:, :step.shape[1]], step)
        tbl = jnp.concatenate([tbl, nxt], axis=1)
        zz = F.square(zz)
        cur *= 2
    return tbl[:, :count]


def eval_poly_dyn(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomials [4, ..., n] at traced point z [4]."""
    n = coeffs.shape[-1]
    tbl = powers_dyn(z, n).reshape((4,) + (1,) * (coeffs.ndim - 2) + (n,))
    return NTT.sum_reduce(F.mul(coeffs, jnp.broadcast_to(tbl, coeffs.shape)))


def _use_native_commit(hasher) -> bool:
    """Batched C blake3 commit on the CPU backend (native/air_eval.c);
    bit-identical to the device kernels. CSTARK_NATIVE_COMMIT=0 disables."""
    import os
    if os.environ.get("CSTARK_NATIVE_COMMIT", "1") == "0":
        return False
    if getattr(hasher, "name", "") != "blake3":
        return False
    try:
        import jax as _jax
        if _jax.default_backend() != "cpu":
            return False
        from ..utils import native as NAT
        return NAT.available()
    except Exception:  # noqa: BLE001
        return False


_GATHER_ROWS = None
_GATHER_ROW1 = None
_GATHER_FRI = None


def _gather_query_rows(lde, h_rows, pos):
    """Trace + composition row gathers in one jitted dispatch. Kept separate
    from the FRI-group gathers so the caller can free the packed LDE (6.3 GB
    at the 2^23 flagship) before dispatching anything else: the single fused
    gather graph exhausted HBM at 94 x 2^23 with every FRI layer resident."""
    global _GATHER_ROWS, _GATHER_ROW1
    if lde.size * 4 > (4 << 30):
        # Big-domain path (2^23 packed flagship): ONE jitted dynamic_slice,
        # dispatched per position. Both whole-graph forms OOM the v5e here —
        # the fused take materializes gather workspace, and a lax.map of
        # dynamic_slices was buffer-assigned ~5 copies of the operands
        # (30.9 G program); a single-slice program allocates only its output.
        # ~Q extra dispatches (~ms each) are noise at this proof size.
        if _GATHER_ROW1 is None:
            def one(lde_, h_rows_, p):
                return (jax.lax.dynamic_slice(
                            lde_, (0, 0, p), lde_.shape[:2] + (1,)),
                        jax.lax.dynamic_slice(
                            h_rows_, (0, 0, p), h_rows_.shape[:2] + (1,)))
            _GATHER_ROW1 = jax.jit(one)
        parts = [_GATHER_ROW1(lde, h_rows, np.int32(p)) for p in pos]
        tr = jnp.concatenate([t for t, _ in parts], axis=-1)
        if lde.shape[0] == 2:
            tr = F.unpack2(tr)
        return jnp.concatenate(
            [tr, jnp.concatenate([h for _, h in parts], axis=-1)], axis=1)
    if _GATHER_ROWS is None:
        def g(lde_, h_rows_, pos_):
            tr = jnp.take(lde_, pos_, axis=-1)
            if lde_.shape[0] == 2:       # packed-LDE layout (_pick_pack_lde)
                tr = F.unpack2(tr)
            return jnp.concatenate([tr, jnp.take(h_rows_, pos_, axis=-1)],
                                   axis=1)
        _GATHER_ROWS = jax.jit(g)
    return _GATHER_ROWS(lde, h_rows, pos)


def _gather_query_fri(groups, leaf_idxs):
    """FRI layer-group gathers in one jitted dispatch."""
    global _GATHER_FRI
    if _GATHER_FRI is None:
        def g(groups_, leaf_idxs_):
            return [jnp.take(
                gr.transpose(0, 2, 1, 3).reshape(4, -1, gr.shape[-1]),
                ix, axis=-1) for gr, ix in zip(groups_, leaf_idxs_)]
        _GATHER_FRI = jax.jit(g)
    return _GATHER_FRI(list(groups), list(leaf_idxs))


_COMMIT_CHUNK = 1 << 16


def _commit(hasher, data, native_ok: bool = True):
    """Hash columns + build Merkle levels with shape-cached kernels."""
    if native_ok and _use_native_commit(hasher):
        from ..utils import native as NAT
        cols = F.pack_u64(np.asarray(data))
        return NAT.blake3_commit_levels(cols)
    from . import kernels as K
    B = data.shape[-1]
    if B > _COMMIT_CHUNK and B % _COMMIT_CHUNK == 0 and \
            jax.default_backend() != "cpu":
        leaves = K.hash_columns_chunked_kernel(
            hasher, data.shape, _COMMIT_CHUNK)(data)
    else:
        leaves = K.hash_columns_kernel(hasher, data.shape)(data)
    return K.tree_levels(hasher, leaves)


# module-level cache of compiled phase kernels, shared by Prover instances
# proving the same AIR shape with different public inputs (pub-input-dependent
# data — boundary value evals and periodic columns — are kernel arguments).
# Assumes evaluate_transition depends on pub inputs only through `periodic`.
_PHASE_CACHE = {}


_PHASE_ATTRS = ("phase_trace", "phase_composition", "phase_composition_pre",
                "phase_ood", "phase_deep", "_fri_kernels", "_b_struct",
                "_nt", "_fri_native", "phase_trace_coeffs",
                "_lde_group_packed", "_write_cols", "phase_composition_p",
                "phase_deep_p")


_XS_CACHE = {}


def _domain_xs(gen_big, bn, offset):
    """LDE-domain points offset*gen^j as a host limb array; instance-free."""
    key = (gen_big, bn, offset)
    r = _XS_CACHE.get(key)
    if r is None:
        r = F.mul_const(F.np_powers(gen_big, bn), F.np_const(offset), np)
        _XS_CACHE[key] = r
    return r


class Prover:
    def __init__(self, air, hasher=None):
        tm = _PhaseTimer()
        self.air = air
        opts = air.options
        self.opts = opts
        self.d = opts.extension_degree
        self.n = air.trace_length
        self.w = air.trace_width
        self.b = opts.blowup
        self.bn = self.b * self.n
        self.offset = F.GENERATOR
        self.gen_big = PH.root_of_unity(self.bn)
        self.g_trace = PH.root_of_unity(self.n)
        self.hasher = hasher or get_hasher(opts.hash_fn)
        self.k = air.ce_blowup()
        self.degrees = air.transition_degrees()
        self.assertions = air.assertions()
        # compact periodic block [4, P, L], L = blowup * lcm(cycles); tiled
        # to the consumer's segment on demand (_periodic_tiled)
        self._periodic = air.periodic_lde(self.b, self.offset)
        tm.mark("init: periodic LDE")
        self._native_kind = self._pick_native_eval()
        self._native_ntt = self._pick_native_ntt()
        self._eval_chunk = self._pick_eval_chunk()
        self._lde_cols = self._pick_lde_cols()
        self._pack_lde = self._pick_pack_lde()
        self._periodic_u64 = None
        key = self._cache_key()
        if key not in _PHASE_CACHE:
            self._build_phases()
            _PHASE_CACHE[key] = {a: getattr(self, a) for a in _PHASE_ATTRS}
            tm.mark("init: build phases")
        else:
            for a, v in _PHASE_CACHE[key].items():
                setattr(self, a, v)
        # per-instance (pub-input-dependent) boundary value evaluations,
        # ordered to match the cached group structure. Packed mode: compact
        # tables only — no full-domain host arrays (at bn = 2^23 the full
        # xs/inv_z builds cost minutes of numpy when the native helpers are
        # unavailable; round-4 untracked host gap).
        from .boundary import build_boundary_tables
        xs = (None if self._pack_lde
              else _domain_xs(self.gen_big, self.bn, self.offset))
        tables = build_boundary_tables(self.assertions, self.n, self.bn, self.b,
                                       self.offset, self.g_trace,
                                       self.k * self.n - 1, xs,
                                       compact=self._pack_lde)
        assert [t.key for t in tables] == [g["key"] for g in self._b_struct], \
            "assertion structure differs across instances of the same AIR shape"
        # packed mode: value-constant groups pass ONE broadcastable column
        # ([4, g, 1]) instead of a full-domain copy (see phase_composition_p)
        self._b_evals = tuple(
            jnp.asarray(t.b_evals[:, :, :1])
            if (self._pack_lde and self._b_struct[i].get("ev_compact"))
            else jnp.asarray(t.b_evals)
            for i, t in enumerate(tables))
        # u64-packed boundary evals: consumed only by the native CPU compose
        # kernel — skip the multi-hundred-MB host packing on device backends
        self._b_ev_u = None
        if self._native_kind and self._native_ntt:
            self._b_ev_u = (np.concatenate(
                [F.pack_u64(np.asarray(t.b_evals)) for t in tables], axis=0)
                if tables else np.zeros((0, self.bn), dtype=np.uint64))
        tm.mark("init: boundary tables")

    def _cache_key(self):
        from ..utils import curve as CV
        return (type(self).__name__, type(self.air).__name__, self.n, self.w,
                repr(self.opts), self.hasher.name,
                getattr(self.air, "depth", None), self._native_kind,
                self._native_ntt, self._eval_chunk, self._lde_cols,
                self._pack_lde, CV.CURVE_NAME)

    def _pick_eval_chunk(self):
        """Domain-chunked constraint evaluation (lax.map over contiguous
        LDE-domain segments). On TPU the fused eval graph of EC/Rescue-heavy
        AIRs materializes [4,4,14,14,bn]-shaped Montgomery partial-product
        intermediates (~1.7 GB each at bn=2^17); chunking bounds peak HBM to
        the per-chunk working set. No-op when bn <= chunk. Single-device only:
        the sharded prover's domain axis is already split across the mesh.
        Override with CSTARK_EVAL_CHUNK (0 disables)."""
        import os
        if type(self) is not Prover:
            return None
        v = os.environ.get("CSTARK_EVAL_CHUNK")
        if v is not None:
            c = int(v)
            if c > 32768:
                import warnings
                warnings.warn(
                    "CSTARK_EVAL_CHUNK=%d exceeds the largest "
                    "end-to-end-verified size (32768): a 64k fused "
                    "eval+composition chunk MIScompiled on XLA:TPU (wrong "
                    "composition poly, caught only at verify time). See the "
                    "sizing note in Prover._pick_eval_chunk / DESIGN.md."
                    % c, stacklevel=2)
            return c if c > 0 else None
        try:
            if jax.default_backend() == "cpu":
                return None
        except Exception:  # noqa: BLE001
            return None
        # NOTE on sizing (v5e, transaction AIR): the standalone eval body is
        # latency-bound — per-chunk wall is ~constant 165-190 ms from 8k to
        # 256k points — so bigger chunks look ~linearly faster. BUT the
        # fused eval+composition body produces a WRONG composition poly at
        # 64k points (OOD consistency fails; XLA:TPU miscompile under
        # investigation; scripts/repro_chunk64k.py), while 8k AND 32k verify
        # end-to-end (DESIGN.md "Chunk sizing"). Default to the largest
        # verified size; raise only with a passing proof at the new size.
        # Small domains still chunk (>= 4 segments): at bn = 2^15 the
        # unchunked fused graph measured 0.90 s vs 0.63 s chunked on the
        # rescue-chain-1024 bench (BASELINE.md round-4 table).
        return min(32768, max(8192, self.bn // 4))

    def _pick_lde_cols(self):
        """Column-group size for chunked big-domain transforms (lax.map over
        groups of trace/composition columns). The Montgomery partial-product
        tensor of an NTT stage over C columns is [4,4,C,bn] u32 (64*C*bn
        bytes); capping C*bn ~ 2^24 keeps it ~1 GB. None = unchunked
        (XLA:CPU, sharded prover). Override with CSTARK_LDE_COLS."""
        import os
        if type(self) is not Prover:
            return None
        v = os.environ.get("CSTARK_LDE_COLS")
        if v is not None:
            c = int(v)
            return c if c > 0 else None
        try:
            if jax.default_backend() == "cpu":
                return None
        except Exception:  # noqa: BLE001
            return None
        return max(1, (1 << 24) // self.bn)

    def _pick_pack_lde(self):
        """Keep the trace LDE resident as packed 2x32-bit words (+ a
        blowup-length wrap tail) instead of 4x16-bit limbs, and feed every
        consumer (commit, constraint eval, DEEP, query gathers) per-chunk
        unpacked slices. Halves the dominant resident array — the 2^23-point
        94-column LDE of the 1024-tx composed AIR is 12.6 GB as limbs,
        6.3 GB packed, against 16 GB of v5e HBM. Default: accelerator
        backends when the limb LDE exceeds 2 GB and the chunked paths are
        shape-compatible. CSTARK_PACK_LDE=0/1 overrides."""
        import os
        if type(self) is not Prover:
            return False         # sharded prover has its own memory layout
        if self._native_kind or self._native_ntt:
            return False         # host-native paths want limb/u64 arrays
        S = self._eval_chunk
        shape_ok = (S and self.bn > S and self.bn % S == 0
                    and self._lde_cols
                    and (self._periodic is None
                         or S % self._periodic.shape[-1] == 0))
        if not shape_ok:
            return False
        v = os.environ.get("CSTARK_PACK_LDE")
        if v is not None:
            return v != "0"
        try:
            if jax.default_backend() == "cpu":
                return False
        except Exception:  # noqa: BLE001
            return False
        return 16 * self.w * self.bn > (2 << 30)

    def _pick_native_eval(self):
        """Use the native C constraint evaluator (native/air_eval.c) on the
        CPU backend: XLA:CPU executes the EC-heavy constraint graphs ~100x
        slower than scalar code. On TPU the fused device kernel is the
        production path. Disable with CSTARK_NATIVE_EVAL=0."""
        import os
        if type(self) is not Prover:
            return None          # sharded prover: keep the device path
        if os.environ.get("CSTARK_NATIVE_EVAL", "1") == "0":
            return None
        kind = getattr(self.air, "native_eval_kind", None)
        if not kind:
            return None
        try:
            import jax as _jax
            if _jax.default_backend() != "cpu":
                return None
            from ..utils import native as NAT
            if not NAT.available():
                return None
        except Exception:  # noqa: BLE001
            return None
        return kind

    def _pick_native_ntt(self):
        """Use the native C NTT (native/ntt.c) for the trace LDE on the CPU
        backend; the JAX transform (ops/ntt.py) is the TPU production path.
        Disable with CSTARK_NATIVE_NTT=0."""
        import os
        if type(self) is not Prover:
            return False         # sharded prover: keep the device path
        if os.environ.get("CSTARK_NATIVE_NTT", "1") == "0":
            return False
        try:
            import jax as _jax
            if _jax.default_backend() != "cpu":
                return False
            from ..utils import native as NAT
            return NAT.available()
        except Exception:  # noqa: BLE001
            return False

    def _native_lde(self, trace):
        """Host-side fused trace LDE -> (coeffs [4,w,n], lde [4,w,bn])."""
        from ..utils import native as NAT
        tr_u = F.pack_u64(np.asarray(trace))
        cf_u, lde_u = NAT.lde_batch(tr_u, self.b, self.offset)
        return (jnp.asarray(F.unpack_u64(cf_u)),
                jnp.asarray(F.unpack_u64(lde_u)))

    def _native_evals_u64(self, lde_u):
        """Host-side constraint evaluation -> stacked evals [C, bn] u64."""
        from ..utils import native as NAT
        nxt_u = np.roll(lde_u, -self.b, axis=-1)
        if self._periodic_u64 is None:
            self._periodic_u64 = F.pack_u64(self._periodic_tiled(self.bn))
        return NAT.eval_air(self._native_kind, lde_u, nxt_u,
                            self._periodic_u64, len(self.degrees))

    def _periodic_tiled(self, length: int) -> np.ndarray:
        """Tile the compact periodic block to `length` LDE-domain points."""
        per = self._periodic
        assert length % per.shape[-1] == 0
        return np.tile(per, length // per.shape[-1])

    def _native_evals(self, lde):
        """Host-side constraint evaluation -> stacked evals [4, C, bn]."""
        lde_u = F.pack_u64(np.asarray(lde))
        return jnp.asarray(F.unpack_u64(self._native_evals_u64(lde_u)))

    def _native_compose(self, evals_u, lde_u, t_alpha, t_beta,
                        b_alpha, b_beta):
        """Native composition polynomial (native/deep_compose.c f63_compose
        + intt/LDE legs) -> (h_coeffs [d,k,n] u64, h_lde [d,k,bn] u64)."""
        from ..utils import native as NAT
        nt, d, k, n = self._nt, self.d, self.k, self.n
        ta = np.ascontiguousarray(F.pack_u64(np.asarray(t_alpha)))
        tb = np.ascontiguousarray(F.pack_u64(np.asarray(t_beta)))
        cidx = nt["b_cidx"]
        ba = np.ascontiguousarray(F.pack_u64(np.asarray(b_alpha))[cidx])
        bb = np.ascontiguousarray(F.pack_u64(np.asarray(b_beta))[cidx])
        comp = NAT.compose_batch(evals_u, d, ta, tb, nt["t_adj"], nt["xpow"],
                                 nt["zt_inv"], lde_u, nt["b_col"],
                                 self._b_ev_u, ba, bb, nt["b_start"],
                                 nt["b_xpow"], nt["b_invz"])
        cf = NAT.intt_coset_batch(comp, self.offset)
        h_cf = np.ascontiguousarray(
            cf[:, :k * n].reshape(d, n, k).transpose(0, 2, 1))
        h_lde_u = NAT.coeffs_lde_batch(h_cf.reshape(d * k, n), self.b,
                                       self.offset).reshape(d, k, self.bn)
        return h_cf, h_lde_u

    @staticmethod
    def _mont_vec(ints) -> np.ndarray:
        return np.array([(int(x) << 64) % F.P for x in ints], dtype=np.uint64)

    def _native_deep(self, lde_u, h_u, z_ints, ood_z_l, ood_zg_l, ood_h_l,
                     g_z, g_zg, g_h):
        """Native DEEP composition -> [4, d, bn] limbs."""
        from ..utils import native as NAT
        from ..ops import extfield as XF
        d, k, w = self.d, self.k, self.w
        zg_i = [(int(z) * self.g_trace) % F.P for z in z_ints]
        zk_i = list(z_ints)
        for _ in range(k.bit_length() - 1):
            zk_i = XF.host_ext_mul(zk_i, zk_i, d)
        deep = NAT.deep_batch(
            lde_u, d, h_u, k, self._nt["xs"],
            self._mont_vec(z_ints), self._mont_vec(zg_i),
            self._mont_vec(zk_i),
            np.ascontiguousarray(F.pack_u64(np.asarray(ood_z_l))),
            np.ascontiguousarray(F.pack_u64(np.asarray(ood_zg_l))),
            np.ascontiguousarray(F.pack_u64(np.asarray(ood_h_l))),
            np.ascontiguousarray(F.pack_u64(np.asarray(g_z)).T),
            np.ascontiguousarray(F.pack_u64(np.asarray(g_zg)).T),
            np.ascontiguousarray(F.pack_u64(np.asarray(g_h)).T))
        return jnp.asarray(F.unpack_u64(deep))

    # -- big-domain transform builders (overridden by the sharded prover) ---
    def _make_lde_big(self):
        """coeffs [4, ..., n] -> evaluations over the bn coset [4, ..., bn]."""
        b, n, offset = self.b, self.n, self.offset

        def lde_big(coeffs):
            pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, (b - 1) * n)]
            return NTT.ntt(NTT.coset_scale(jnp.pad(coeffs, pad), offset))

        return lde_big

    def _make_intt_big(self):
        """evaluations over the bn coset -> coefficients (coset-corrected)."""
        o_inv = pow(self.offset, F.P - 2, F.P)
        return lambda evals: NTT.coset_scale(NTT.intt(evals), o_inv)

    def _make_intt_trace(self):
        """trace-domain inverse NTT [4, ..., n] -> coefficients (overridden
        by the sharded prover with the distributed six-step transform so no
        single chip runs a full-size [w, n] inverse butterfly)."""
        return NTT.intt

    # ------------------------------------------------------------------
    def _build_phases(self):
        air, n, w, b, bn, k = self.air, self.n, self.w, self.b, self.bn, self.k
        offset, gen_big, g_trace = self.offset, self.gen_big, self.g_trace
        hasher = self.hasher
        comp_deg = k * n - 1
        lde_big = self._make_lde_big()
        intt_big = self._make_intt_big()
        intt_trace = self._make_intt_trace()
        lde_cols = self._lde_cols

        def _map_col_groups(body, x, wc):
            """Apply `body` ([4, wc, n] -> pytree of [4, wc, m]) over groups
            of wc columns of x [4, *B, n] via lax.map (bounds the Montgomery
            partial-product working set; see _pick_lde_cols)."""
            lead = x.shape[1:-1]
            C = int(np.prod(lead)) if lead else 1
            flat = x.reshape((4, C, x.shape[-1]))
            padc = (-C) % wc
            if padc:
                flat = jnp.pad(flat, ((0, 0), (0, padc), (0, 0)))
            groups = flat.reshape(4, (C + padc) // wc, wc, -1) \
                         .transpose(1, 0, 2, 3)        # [G, 4, wc, n]
            outs = jax.lax.map(body, groups)

            def restore(o):
                o = o.transpose(1, 0, 2, 3).reshape(4, C + padc, -1)[:, :C]
                return o.reshape((4,) + lead + (o.shape[-1],))

            return jax.tree_util.tree_map(restore, outs)

        def lde_big_chunked(coeffs):
            lead = coeffs.shape[1:-1]
            C = int(np.prod(lead)) if lead else 1
            if lde_cols is None or C <= lde_cols:
                return lde_big(coeffs)
            return _map_col_groups(lde_big, coeffs, lde_cols)

        @jax.jit
        def phase_trace(trace):
            if lde_cols is None or w <= lde_cols:
                coeffs = intt_trace(trace)
                return coeffs, lde_big(coeffs)

            def body(g):
                cf = intt_trace(g)
                return cf, lde_big(cf)

            return _map_col_groups(body, trace, lde_cols)

        # ---- host-numpy protocol tables (concrete jit constants) ----------
        # Packed mode builds NO full-domain host table: every [4, bn] array
        # below is replaced by an S-sized seed block + per-chunk scalar
        # ladder inside phase_composition_p/_deep_p (see _chunk_tables).
        packed = self._pack_lde
        t_adjs = [comp_deg - (d.poly_degree(n) - (n - 1)) for d in self.degrees]

        # transition zerofier inverse: (x^n-1) has `b` distinct coset values
        w_b = PH.root_of_unity(bn)
        o_n = pow(offset, n, F.P)
        vals = [pow(o_n * pow(w_b, j * n, F.P) - 1, F.P - 2, F.P) for j in range(b)]
        znum_b = F.from_int(np.array(vals, dtype=object))      # [4, b]
        g_last = pow(g_trace, n - 1, F.P)
        if not packed:
            xs = _domain_xs(gen_big, bn, offset)
            znum_inv = np.tile(znum_b, bn // b)
            bc_last = np.broadcast_to(F.np_const(g_last).reshape(4, 1), (4, bn))
            zt_inv = F.mul(znum_inv, F.sub(xs, bc_last, np), np)
        else:
            xs = zt_inv = None
        # transition constraints grouped by degree adjustment; boundary
        # assertions grouped by divisor — everything evaluates as stacked
        # batched kernels whose graph size is independent of constraint count.
        from .boundary import build_boundary_tables
        b_tables = build_boundary_tables(self.assertions, n, bn, b,
                                         offset, g_trace, comp_deg, xs,
                                         compact=packed)
        # original-order coefficient indices per boundary group
        pos = {id(a): i for i, a in enumerate(self.assertions)}
        b_struct = []
        for grp in b_tables:
            b_struct.append({
                "key": grp.key,
                "columns": grp.columns,
                "coeff_idx": np.array([pos[id(a)] for a in grp.assertions],
                                      dtype=np.int32),
                "adj": grp.adj,
                "inv_z": grp.inv_z,
            })
        self._b_struct = b_struct
        adj_groups = sorted(set(t_adjs))
        adj_mask = {g: np.array([adj == g for adj in t_adjs],
                                dtype=np.uint32).reshape(1, -1, 1)
                    for g in adj_groups}
        adj_all = set(t_adjs) | {g["adj"] for g in b_struct}
        xpow = {}
        if not packed:
            for adj in adj_all:
                xpow[adj] = F.mul_const(
                    F.np_powers(pow(gen_big, adj, F.P), bn),
                    F.np_const(pow(offset, adj, F.P)), np)

        d = self.d

        def _pointwise_comp(evals, cur, zt, xp_t, b_xp, b_iz, b_ev,
                            t_alpha, t_beta, b_alpha, b_beta):
            """Pointwise composition over a domain segment: constraint
            quotients + boundary terms -> comp [4, d, S].

            Coefficient arrays carry a trailing extension axis [4, C, d]
            (d == 1 for base-field proofs); the composition lives in the
            extension. ONE fused dot over the constraint axis for alpha AND
            every degree-adjustment group: the per-group coefficient vectors
            are stacked on the output axis, so XLA sees a single mul_sum (one
            deferred REDC per output) — separate dots sharing the same input
            explode superlinearly on XLA:CPU (2 dots 0.14s, 6 dots 27s for
            the schnorr AIR). The transition zerofier inverse is a per-point
            scalar shared by all constraints, so it multiplies the combined
            result rather than each of the C quotients."""
            qd = evals[:, :, None, :]                  # [4, C, 1, S]
            coeffs = jnp.concatenate(
                [t_alpha] + [t_beta * adj_mask[g] for g in adj_groups],
                axis=2)                                # [4, C, (1+G)*d]
            dots = F.mul_sum(qd, coeffs[:, :, :, None], axis=1)
            comp = dots[:, :d]
            for gi in range(len(adj_groups)):
                part = dots[:, (1 + gi) * d:(2 + gi) * d]
                comp = F.add(comp, F.mul(part, xp_t[gi][:, None]))
            comp = F.mul(comp, zt[:, None])

            # boundary terms: per divisor group, stacked over its assertions;
            # the alpha and beta dots fuse the same way
            for gi, grp in enumerate(b_struct):
                rows = cur[:, grp["columns"]]          # [4, g, S]
                num = F.sub(rows, b_ev[gi])[:, :, None, :]
                bc = jnp.concatenate([b_alpha[:, grp["coeff_idx"]],
                                      b_beta[:, grp["coeff_idx"]]], axis=2)
                bd = F.mul_sum(num, bc[:, :, :, None], axis=1)
                term = F.add(bd[:, :d],
                             F.mul(bd[:, d:], b_xp[gi][:, None]))
                comp = F.add(comp, F.mul(term, b_iz[gi][:, None]))
            return comp

        # stacked full-domain protocol tables (numpy; jit constants) —
        # unpacked path only (packed mode never calls these closures)
        xp_t_full = [xpow[g] for g in adj_groups] if not packed else None
        b_xp_full = [xpow[grp["adj"]] for grp in b_struct] if not packed \
            else None
        b_iz_full = [grp["inv_z"] for grp in b_struct] if not packed else None

        def _finish(comp):
            comp_coeffs = intt_big(comp)
            h_coeffs = comp_coeffs[..., :k * n].reshape(4, d, n, k) \
                                               .transpose(0, 1, 3, 2)  # [4,d,k,n]
            h_lde = lde_big_chunked(h_coeffs)
            return h_coeffs, h_lde

        def _compose_body(evals, lde, t_alpha, t_beta, b_alpha, b_beta,
                          b_evals):
            comp = _pointwise_comp(evals, lde, zt_inv, xp_t_full, b_xp_full,
                                   b_iz_full, b_evals,
                                   t_alpha, t_beta, b_alpha, b_beta)
            return _finish(comp)

        eval_chunk = self._eval_chunk

        @jax.jit
        def phase_composition(lde, t_alpha, t_beta, b_alpha, b_beta,
                              periodic, b_evals):
            nxt = jnp.roll(lde, -b, axis=-1)
            S = eval_chunk
            if S is None or bn <= S or bn % S != 0:
                evals = air.evaluate_transition(BASE, lde, nxt, periodic)
                if isinstance(evals, (list, tuple)):
                    evals = jnp.stack(evals, axis=1)   # [4, C, bn]
                return _compose_body(evals, lde, t_alpha, t_beta, b_alpha,
                                     b_beta, b_evals)
            # domain-chunked path (see _pick_eval_chunk): lax.map over
            # contiguous segments keeps peak memory at the per-chunk working
            # set; one compiled body for all segments.
            nch = bn // S
            # a compact periodic block ([4, P, S]: one chunk period, see
            # _periodic_tiled) is identical for every segment -> captured,
            # not mapped; a full-domain block is segmented like the LDE
            per_compact = periodic if periodic.shape[-1] == S else None

            def ch(x):
                x = jnp.asarray(x)
                return jnp.moveaxis(
                    x.reshape(x.shape[:-1] + (nch, S)), -2, 0)

            def body(xs_):
                cur, nx, per, bev, zt, xpt, bxp, biz = xs_
                if per_compact is not None:
                    per = per_compact
                evals = air.evaluate_transition(BASE, cur, nx, per)
                if isinstance(evals, (list, tuple)):
                    evals = jnp.stack(evals, axis=1)
                return _pointwise_comp(evals, cur, zt, xpt, bxp, biz, bev,
                                       t_alpha, t_beta, b_alpha, b_beta)

            per_mapped = (ch(periodic) if per_compact is None else
                          jnp.zeros((nch, 4, 0, S), jnp.uint32))
            comp_c = jax.lax.map(body, (
                ch(lde), ch(nxt), per_mapped,
                tuple(ch(be) for be in b_evals),
                ch(zt_inv),
                tuple(ch(x) for x in xp_t_full),
                tuple(ch(x) for x in b_xp_full),
                tuple(ch(x) for x in b_iz_full)))
            comp = jnp.moveaxis(comp_c, 0, -2).reshape(4, d, bn)
            return _finish(comp)

        @jax.jit
        def phase_composition_pre(evals, lde, t_alpha, t_beta, b_alpha,
                                  b_beta, b_evals):
            """Variant taking pre-computed constraint evaluations (the
            native C CPU evaluator path; see _pick_native_eval)."""
            return _compose_body(evals, lde, t_alpha, t_beta, b_alpha,
                                 b_beta, b_evals)

        from ..ops import extfield as XF

        @jax.jit
        def phase_ood(trace_coeffs, h_coeffs, z):
            # z: [4, d] extension scalar
            zg = F.mul(z, jnp.broadcast_to(_limb(g_trace)[:, None], z.shape))
            zk = z
            for _ in range(k.bit_length() - 1):
                zk = XF.ext_mul(zk[:, :, None], zk[:, :, None], d)[:, :, 0]
            ztbl = XF.ext_powers_dyn(z, n, d)          # [4, d, n]
            zgtbl = XF.ext_powers_dyn(zg, n, d)
            zktbl = XF.ext_powers_dyn(zk, n, d)

            # NOTE: these reduce over the INNERMOST (contiguous) axis — the
            # mul+tree-reduce form is ~75x faster there than a deferred-REDC
            # dot (mul_sum), which only wins on middle-axis reductions.
            def tdot(grp):
                # [4, wc, n] -> ([4, wc, d], [4, wc, d]); column-minor so the
                # group mapper can stitch along axis 1
                oz = NTT.sum_reduce(
                    F.mul(grp[:, None], ztbl[:, :, None, :]), axis=-1)
                ozg = NTT.sum_reduce(
                    F.mul(grp[:, None], zgtbl[:, :, None, :]), axis=-1)
                return oz.transpose(0, 2, 1), ozg.transpose(0, 2, 1)

            # chunk over column groups: the unchunked Montgomery partial-
            # product tensor is [4, 4, w, n] (~24 GB at the 94 x 2^20
            # flagship — OOMed the v5e), the grouped one is w/wc times less
            if lde_cols is None or w <= lde_cols:
                oz_t, ozg_t = tdot(trace_coeffs)
            else:
                oz_t, ozg_t = _map_col_groups(tdot, trace_coeffs, lde_cols)
            ood_z = oz_t.transpose(0, 2, 1)
            ood_zg = ozg_t.transpose(0, 2, 1)
            ood_h = NTT.sum_reduce(
                XF.ext_mul(h_coeffs, zktbl[:, :, None, :], d), axis=-1)
            return ood_z, ood_zg, ood_h                # [4,d,w], [4,d,w], [4,d,k]

        def _lift_sub(rows, ood):
            # rows [4, R, bn] base; ood [4, d, R] ext -> numer [4, d, R, bn]
            ood_b = ood[:, :, :, None]
            first = F.sub(rows[:, None], ood_b[:, 0:1])
            if d == 1:
                return first
            rest = F.neg(jnp.broadcast_to(
                ood_b[:, 1:], (4, d - 1) + rows.shape[1:]))
            return jnp.concatenate([first, rest], axis=1)

        def _lift_sub_point(base_vec, zpt):
            # base_vec [4, bn]; zpt [4, d] -> (x - z) [4, d, bn]
            first = F.sub(base_vec[:, None], zpt[:, 0:1, None])
            if d == 1:
                return first
            rest = F.neg(jnp.broadcast_to(
                zpt[:, 1:, None], (4, d - 1, base_vec.shape[-1])))
            return jnp.concatenate([first, rest], axis=1)

        def _deep_pointwise(lde_c, h_c, xs_c, ood_z, ood_zg, ood_h,
                            g_z, g_zg, g_h, z, zg, zk):
            # Montgomery batch inversion across the three denominators: one
            # inversion chain instead of three (each is ~90 field muls over
            # the whole domain), unfolded with 8 ext muls.
            xz = _lift_sub_point(xs_c, z)
            xzg = _lift_sub_point(xs_c, zg)
            xzk = _lift_sub_point(xs_c, zk)
            pzzg = XF.ext_mul(xz, xzg, d)
            inv_all = XF.ext_inv_vec(XF.ext_mul(pzzg, xzk, d), d)
            inv_xz = XF.ext_mul(inv_all, XF.ext_mul(xzg, xzk, d), d)
            inv_xzg = XF.ext_mul(inv_all, XF.ext_mul(xz, xzk, d), d)
            inv_xzk = XF.ext_mul(inv_all, pzzg, d)

            def dot_rows(rows, oods, coeffs):
                numer = _lift_sub(rows, oods)          # [4, d, R, S]
                return XF.ext_mul_sum(numer, coeffs[:, :, :, None], d, axis=2)

            deep = XF.ext_mul(dot_rows(lde_c, ood_z, g_z), inv_xz, d)
            deep = F.add(deep,
                         XF.ext_mul(dot_rows(lde_c, ood_zg, g_zg), inv_xzg, d))
            # composition columns are ext-valued: numer = H - ood directly
            h_num = F.sub(h_c, ood_h[:, :, :, None])
            h_dot = XF.ext_mul_sum(h_num, g_h[:, :, :, None], d, axis=2)
            return F.add(deep, XF.ext_mul(h_dot, inv_xzk, d))

        @jax.jit
        def phase_deep(lde, h_lde, ood_z, ood_zg, ood_h, g_z, g_zg, g_h, z):
            zg = F.mul(z, jnp.broadcast_to(_limb(g_trace)[:, None], z.shape))
            zk = z
            for _ in range(k.bit_length() - 1):
                zk = XF.ext_mul(zk[:, :, None], zk[:, :, None], d)[:, :, 0]
            S = eval_chunk
            if S is None or bn <= S or bn % S != 0:
                return _deep_pointwise(lde, h_lde, xs, ood_z, ood_zg, ood_h,
                                       g_z, g_zg, g_h, z, zg, zk)
            nch = bn // S

            def ch(x):
                x = jnp.asarray(x)
                return jnp.moveaxis(x.reshape(x.shape[:-1] + (nch, S)), -2, 0)

            def body(xs_):
                lde_c, h_c, xs_c = xs_
                return _deep_pointwise(lde_c, h_c, xs_c, ood_z, ood_zg,
                                       ood_h, g_z, g_zg, g_h, z, zg, zk)

            deep_c = jax.lax.map(body, (ch(lde), ch(h_lde), ch(xs)))
            return jnp.moveaxis(deep_c, 0, -2).reshape(4, d, bn)

        # ---- packed-LDE variants (see _pick_pack_lde) ---------------------
        self.phase_trace_coeffs = None
        self._lde_group_packed = None
        self._write_cols = None
        self.phase_composition_p = None
        self.phase_deep_p = None
        if self._pack_lde:
            S = eval_chunk
            nch = bn // S
            kk = self.k

            @jax.jit
            def phase_trace_coeffs(trace):
                if lde_cols is None or w <= lde_cols:
                    return intt_trace(trace)
                return _map_col_groups(intt_trace, trace, lde_cols)

            @jax.jit
            def lde_group_packed(cf_g):
                """coeffs group [4, wc, n] -> packed LDE + wrap [2, wc, bn+b]."""
                pk = F.pack2(lde_big(cf_g))
                return jnp.concatenate([pk, pk[..., :b]], axis=-1)

            def write_cols(buf, blk, start):
                return jax.lax.dynamic_update_slice(buf, blk, (0, start, 0))
            write_cols = jax.jit(write_cols, donate_argnums=0)

            # ---- per-chunk protocol tables WITHOUT full-domain constants.
            # Every full-domain table here is geometric in the point index
            # (x_t = offset*w^t), so chunk c's block = block0 * scalar^c:
            # only [4, S] seed blocks and [4, nch] scalar ladders are
            # embedded (a 2^23 domain otherwise bakes ~900 MB of literals
            # into the HLO -> HTTP 413 on the remote-compile relay).
            assert S % b == 0
            znum_S = np.tile(znum_b, S // b)                   # [4, S]
            glast_c = F.np_const(g_last).reshape(4, 1)
            # seed blocks are built at size S directly (np_powers at 32k is
            # milliseconds; the old path sliced them out of full-domain
            # [4, bn] tables that cost minutes to build at 2^23)
            xs_blk0 = F.mul_const(F.np_powers(gen_big, S),
                                  F.np_const(offset), np)
            xs_sc = F.np_powers(pow(gen_big, S, F.P), nch)     # [4, nch]
            xp_blk0, xp_sc = {}, {}
            for adj in adj_all:
                xp_blk0[adj] = F.mul_const(
                    F.np_powers(pow(gen_big, adj, F.P), S),
                    F.np_const(pow(offset, adj, F.P)), np)
                xp_sc[adj] = F.np_powers(pow(gen_big, adj * S, F.P), nch)
            from .air import SequenceAssertion as _SeqA
            b_modes = []   # per boundary group: how to produce inv_z / evals
            for gi, grp in enumerate(b_struct):
                key = grp["key"]
                ev_compact = all(not isinstance(a, _SeqA)
                                 for a in b_tables[gi].assertions)
                grp["ev_compact"] = ev_compact
                if key[0] == "s":
                    c_s = F.np_const(pow(g_trace, key[1], F.P)).reshape(4, 1)
                    b_modes.append(("inv_xs", c_s))
                else:
                    m_div = n // key[2]
                    period = bn // m_div if m_div <= bn else 1
                    # compact tables carry exactly the [4, period] base block
                    if S % period == 0:
                        b_modes.append(
                            ("tiled",
                             np.tile(grp["inv_z"][:, :period], S // period)))
                    else:
                        b_modes.append(("arg", None))
            b_iz_args = tuple(
                jnp.asarray(np.tile(grp["inv_z"],
                                    bn // grp["inv_z"].shape[-1]))
                for grp, mode in zip(b_struct, b_modes) if mode[0] == "arg")

            def _sc(tbl, i):
                """scalar column i of a [4, nch] ladder -> [4, 1]."""
                return jax.lax.dynamic_slice(jnp.asarray(tbl), (0, i), (4, 1))

            def _chunk_tables(i):
                xs_c = F.mul(jnp.asarray(xs_blk0),
                             jnp.broadcast_to(_sc(xs_sc, i), (4, S)))
                zt_c = F.mul(jnp.asarray(znum_S),
                             F.sub(xs_c, jnp.asarray(glast_c)))
                def xp_c(adj):
                    return F.mul(jnp.asarray(xp_blk0[adj]),
                                 jnp.broadcast_to(_sc(xp_sc[adj], i), (4, S)))
                biz_c = []
                ai = 0
                for grp, mode in zip(b_struct, b_modes):
                    if mode[0] == "inv_xs":
                        diff = F.sub(xs_c, jnp.asarray(mode[1]))
                        biz_c.append(XF.ext_inv_vec(diff[:, None], 1)[:, 0])
                    elif mode[0] == "tiled":
                        biz_c.append(jnp.asarray(mode[1]))
                    else:
                        biz_c.append(jax.lax.dynamic_slice(
                            b_iz_args[ai], (0, i * S), (4, S)))
                        ai += 1
                return xs_c, zt_c, xp_c, biz_c

            @jax.jit
            def phase_composition_p(lde_p, t_alpha, t_beta, b_alpha, b_beta,
                                    periodic, b_evals):
                """lde_p: packed + wrap tail [2, w, bn+b]; periodic: ONE
                chunk segment [4, P, S] (chunk-invariant: S is a multiple of
                the periodic period — asserted by _pick_pack_lde); b_evals:
                [4, g, 1] for value-constant groups (broadcast), [4, g, bn]
                for sequence groups (sliced per chunk)."""
                def body(i):
                    st = i * S
                    cur = F.unpack2(jax.lax.dynamic_slice(
                        lde_p, (0, 0, st), (2, w, S)))
                    nx = F.unpack2(jax.lax.dynamic_slice(
                        lde_p, (0, 0, st + b), (2, w, S)))
                    evals = air.evaluate_transition(BASE, cur, nx, periodic)
                    if isinstance(evals, (list, tuple)):
                        evals = jnp.stack(evals, axis=1)
                    _, zt_c, xp_c, biz_c = _chunk_tables(i)
                    bev_c = [be if be.shape[-1] == 1 else
                             jax.lax.dynamic_slice(
                                 be, (0, 0, st), (4, be.shape[1], S))
                             for be in b_evals]
                    return _pointwise_comp(
                        evals, cur, zt_c,
                        [xp_c(adj) for adj in adj_groups],
                        [xp_c(grp["adj"]) for grp in b_struct],
                        biz_c, bev_c,
                        t_alpha, t_beta, b_alpha, b_beta)

                comp_c = jax.lax.map(body, jnp.arange(nch, dtype=jnp.int32))
                comp = jnp.moveaxis(comp_c, 0, -2).reshape(4, d, bn)
                return _finish(comp)

            @jax.jit
            def phase_deep_p(lde_p, h_rows, ood_z, ood_zg, ood_h,
                             g_z, g_zg, g_h, z):
                """h_rows: the commit layout [4, k*d, bn] (row = ki*d + di),
                so the [4, d, k, bn] h_lde can be freed after the h-commit
                instead of keeping both layouts resident."""
                zg = F.mul(z, jnp.broadcast_to(_limb(g_trace)[:, None],
                                               z.shape))
                zk = z
                for _ in range(kk.bit_length() - 1):
                    zk = XF.ext_mul(zk[:, :, None], zk[:, :, None], d)[:, :, 0]

                def body(i):
                    st = i * S
                    lde_c = F.unpack2(jax.lax.dynamic_slice(
                        lde_p, (0, 0, st), (2, w, S)))
                    h_c = jax.lax.dynamic_slice(
                        h_rows, (0, 0, st), (4, kk * d, S)) \
                        .reshape(4, kk, d, S).transpose(0, 2, 1, 3)
                    xs_c = F.mul(jnp.asarray(xs_blk0),
                                 jnp.broadcast_to(_sc(xs_sc, i), (4, S)))
                    return _deep_pointwise(lde_c, h_c, xs_c, ood_z,
                                           ood_zg, ood_h, g_z, g_zg, g_h,
                                           z, zg, zk)

                deep_c = jax.lax.map(body, jnp.arange(nch, dtype=jnp.int32))
                return jnp.moveaxis(deep_c, 0, -2).reshape(4, d, bn)

            self.phase_trace_coeffs = phase_trace_coeffs
            self._lde_group_packed = lde_group_packed
            self._write_cols = write_cols
            self.phase_composition_p = phase_composition_p
            self.phase_deep_p = phase_deep_p

        self.phase_trace = phase_trace
        self.phase_composition = phase_composition
        self.phase_composition_pre = phase_composition_pre
        self.phase_ood = phase_ood
        self.phase_deep = phase_deep

        # u64-packed protocol tables for the native CPU compose/DEEP kernels
        # (native/deep_compose.c); pure functions of the AIR shape, so cached
        # with the phase kernels. Built ONLY when a native path is active:
        # at bn = 2^23 these are ~0.5 GB of host numpy packing that the
        # device pipeline never reads (part of the round-4 untracked host
        # gap in the 1024-tx profile).
        adj_order = sorted(xpow)
        if not (self._native_kind or self._native_ntt):
            self._nt = None
            self._build_fri_kernels(bn, offset, gen_big)
            return
        self._nt = {
            "xs": F.pack_u64(xs),
            "zt_inv": F.pack_u64(zt_inv),
            "xpow": np.ascontiguousarray(
                np.stack([F.pack_u64(xpow[a]) for a in adj_order])),
            "t_adj": np.array([adj_order.index(a) for a in t_adjs],
                              dtype=np.uint32),
            "b_col": np.concatenate(
                [np.asarray(g["columns"], dtype=np.uint32)
                 for g in b_struct]) if b_struct else
                np.zeros(0, dtype=np.uint32),
            "b_cidx": np.concatenate(
                [g["coeff_idx"] for g in b_struct]) if b_struct else
                np.zeros(0, dtype=np.int32),
            "b_start": np.cumsum(
                [0] + [len(g["columns"]) for g in b_struct]).astype(np.uint32),
            "b_xpow": np.ascontiguousarray(np.stack(
                [F.pack_u64(xpow[g["adj"]]) for g in b_struct]))
                if b_struct else np.zeros((0, bn), dtype=np.uint64),
            "b_invz": np.ascontiguousarray(np.stack(
                [F.pack_u64(np.asarray(g["inv_z"])) for g in b_struct]))
                if b_struct else np.zeros((0, bn), dtype=np.uint64),
        }

        self._build_fri_kernels(bn, offset, gen_big)

    def _build_fri_kernels(self, bn, offset, gen_big):
        # FRI layer kernels, one per layer size
        self._fri_kernels = {}
        self._fri_native = {}
        fold = self.opts.fri_folding
        size, o, gw = bn, offset, gen_big
        while size > self.opts.fri_max_remainder:
            self._fri_kernels[size] = self._make_fri_kernel(size, o, gw, fold)
            size //= fold
            o = pow(o, fold, F.P)
            gw = pow(gw, fold, F.P)

    def _make_fri_kernel(self, size, o, gw, fold):
        hasher = self.hasher
        native_commit_ok = getattr(self, "allow_native_commit", True)
        d = self.d

        def commit_kernel(cur):
            # cur [4, d, size]; leaf i groups the `fold` positions that fold
            # together, element-major (position outer, ext coord inner)
            group = cur.reshape(4, d, fold, size // fold)
            rows = group.transpose(0, 2, 1, 3).reshape(4, fold * d, size // fold)
            return group, _commit(hasher, rows, native_ok=native_commit_ok)

        from ..ops import extfield as XF

        @jax.jit
        def fold_kernel(cur, xi):
            xi2 = XF.ext_mul(xi[:, :, None], xi[:, :, None], d)[:, :, 0]
            folded = FRI.fold2_ext(cur, xi, o, gw, d)
            if fold == 4:
                folded = FRI.fold2_ext(folded, xi2,
                                       pow(o, 2, F.P), pow(gw, 2, F.P), d)
            return folded

        if getattr(self, "_native_ntt", False):
            invxs1 = np.ascontiguousarray(
                F.pack_u64(FRI._inv_xs_table(o, gw, size // 2)))
            invxs2 = np.ascontiguousarray(F.pack_u64(FRI._inv_xs_table(
                pow(o, 2, F.P), pow(gw, 2, F.P), size // 4))) \
                if fold == 4 else None

            def fold_native(cur, xi_ints):
                from ..utils import native as NAT
                cur_u = np.ascontiguousarray(
                    F.pack_u64(np.asarray(cur)).reshape(d, size))
                out = NAT.fri_fold2(cur_u, self._mont_vec(xi_ints), invxs1)
                if fold == 4:
                    xi2 = XF.host_ext_mul([int(x) for x in xi_ints],
                                          [int(x) for x in xi_ints], d)
                    out = NAT.fri_fold2(out, self._mont_vec(xi2), invxs2)
                return jnp.asarray(F.unpack_u64(
                    out.reshape(d, size // fold)))

            self._fri_native[size] = fold_native

        return commit_kernel, fold_kernel

    # ------------------------------------------------------------------
    def _build_lde_packed(self, coeffs):
        """Packed trace LDE with wrap tail [2, w, bn+b], built group-by-group
        into a donated buffer: peak device memory = the packed buffer plus
        ONE column group's limb-form working set (vs. the full 4-limb LDE +
        a stacked lax.map copy)."""
        w, b, bn = self.w, self.b, self.bn
        wc = self._lde_cols or w
        buf = jnp.zeros((2, w, bn + b), jnp.uint32)
        for g0 in range(0, w, wc):
            g1 = min(w, g0 + wc)
            blk = self._lde_group_packed(coeffs[:, g0:g1])
            buf = self._write_cols(buf, blk, g0)
        return buf

    def _commit_packed(self, hasher, lde_p):
        """Merkle-commit the packed LDE: per-chunk unpack + hash (the wrap
        tail is excluded)."""
        from . import kernels as K
        leaves = K.hash_columns_packed_kernel(
            hasher, lde_p.shape, min(_COMMIT_CHUNK, self.bn), self.bn)(lde_p)
        return K.tree_levels(hasher, leaves)

    # ------------------------------------------------------------------
    def _draw_coeffs(self, coin, count):
        """count extension coefficients -> [4, count, d] (element-major)."""
        vals = [coin.draw_felts(self.d) for _ in range(count)]
        return jnp.asarray(F.from_int(np.array(vals, dtype=object)))

    @staticmethod
    def _flat(arr_l):
        """[4, d, ...] device ext values -> flat int list, element-major
        (last axes outer, ext coord inner)."""
        ints = F.to_int(np.asarray(arr_l))  # object [d, ...]
        d = ints.shape[0]
        rest = ints.reshape(d, -1)
        return [int(rest[c, j]) for j in range(rest.shape[1]) for c in range(d)]

    def checkpointer(self, directory: str):
        """A phase Checkpointer bound to this proving context (AIR shape +
        options + public inputs), for `prove(..., checkpoint=...)`."""
        from .checkpoint import Checkpointer
        ctx = [type(self.air).__name__, self.w, self.n,
               self.opts.context_elements(self.w, self.n),
               self.air.pub_inputs_elements(), self.hasher.name]
        return Checkpointer(directory, context=ctx)

    def prove(self, trace: jnp.ndarray, checkpoint=None) -> Proof:
        air, opts, hasher = self.air, self.opts, self.hasher
        n, w, b, bn, k = self.n, self.w, self.b, self.bn, self.k
        d = self.d
        assert trace.shape == (4, w, n)
        tm = _PhaseTimer()
        ck = checkpoint

        data = ck.load("trace") if ck else None
        if data is not None and int(data.get("packed", 0)) != int(
                self._pack_lde):
            data = None   # LDE layout changed between runs: recompute phase
        if data is not None:
            del trace     # every value is restored; drop the rebuilt trace
            trace_coeffs = jnp.asarray(data["trace_coeffs"])
            lde = jnp.asarray(data["lde"])
            t_levels = [jnp.asarray(x) for x in ck.unpack_levels(data)]
        elif self._pack_lde:
            trace_coeffs = self.phase_trace_coeffs(trace)
            del trace  # free the limb trace: coeffs carry everything forward
            lde = self._build_lde_packed(trace_coeffs)  # [2, w, bn+b] packed
            tm.mark("trace LDE", lde)
            t_levels = self._commit_packed(hasher, lde)
            if ck:
                # the packed [2, w, bn+b] words ARE the canonical residency;
                # checkpoint them as-is (no unpacked copy is ever built)
                ck.save_levels("trace", {"trace_coeffs": trace_coeffs,
                                         "lde": lde,
                                         "packed": np.asarray(1)}, t_levels)
        else:
            if self._native_ntt:
                trace_coeffs, lde = self._native_lde(trace)
            else:
                trace_coeffs, lde = self.phase_trace(trace)
            tm.mark("trace LDE", lde)
            t_levels = _commit(hasher, lde,
                               getattr(self, "allow_native_commit", True))
            if ck:
                ck.save_levels("trace", {"trace_coeffs": trace_coeffs,
                                         "lde": lde,
                                         "packed": np.asarray(0)}, t_levels)
        trace_tree = M.MerkleTree.from_levels(hasher, t_levels)
        tm.mark("trace commit", trace_tree.levels[-1])
        lde_u = (F.pack_u64(np.asarray(lde))
                 if (self._native_ntt or self._native_kind) else None)

        coin = RandomCoin(hasher, opts.context_elements(w, n)
                          + air.pub_inputs_elements(),
                          journal=getattr(self, "coin_journal", None))
        coin.reseed(trace_tree.root())

        nc, nb = len(self.degrees), len(self.assertions)
        t_alpha = self._draw_coeffs(coin, nc)
        t_beta = self._draw_coeffs(coin, nc)
        b_alpha = self._draw_coeffs(coin, nb)
        b_beta = self._draw_coeffs(coin, nb)
        tm.mark("coin + coeff draws")

        data = ck.load("composition") if ck else None
        if data is not None:
            h_coeffs = jnp.asarray(data["h_coeffs"])
            h_lde = jnp.asarray(data["h_lde"])
            h_levels = [jnp.asarray(x) for x in ck.unpack_levels(data)]
        else:
            if self._native_kind and self._native_ntt:
                evals_u = self._native_evals_u64(lde_u)
                h_cf_u, h_lde_u = self._native_compose(
                    evals_u, lde_u, t_alpha, t_beta, b_alpha, b_beta)
                h_coeffs = jnp.asarray(F.unpack_u64(h_cf_u))
                h_lde = jnp.asarray(F.unpack_u64(h_lde_u))
            elif self._native_kind:
                evals = self._native_evals(lde)
                h_coeffs, h_lde = self.phase_composition_pre(
                    evals, lde, t_alpha, t_beta, b_alpha, b_beta,
                    self._b_evals)
            else:
                S = self._eval_chunk
                if self._periodic is None:
                    per = jnp.zeros(
                        (4, 0, S if self._pack_lde else bn), jnp.uint32)
                elif (S and bn > S and bn % S == 0
                        and S % self._periodic.shape[-1] == 0):
                    # chunked eval: one periodic segment serves every chunk
                    per = jnp.asarray(self._periodic_tiled(S))
                else:
                    per = jnp.asarray(self._periodic_tiled(bn))
                compose = (self.phase_composition_p if self._pack_lde
                           else self.phase_composition)
                h_coeffs, h_lde = compose(
                    lde, t_alpha, t_beta, b_alpha, b_beta, per, self._b_evals)
            tm.mark("constraint eval", h_lde)
            h_levels = _commit(
                hasher, h_lde.transpose(0, 2, 1, 3).reshape(4, k * d, bn),
                getattr(self, "allow_native_commit", True))
            if ck:
                ck.save_levels("composition", {"h_coeffs": h_coeffs,
                                               "h_lde": h_lde}, h_levels)
        h_rows = h_lde.transpose(0, 2, 1, 3).reshape(4, k * d, bn)
        if self._pack_lde:
            del h_lde  # packed mode: DEEP reads h_rows; free the 2nd layout
        h_tree = M.MerkleTree.from_levels(hasher, h_levels)
        tm.mark("composition commit", h_tree.levels[-1])
        coin.reseed(h_tree.root())

        z_ints = coin.draw_felts(d)
        z = jnp.asarray(F.from_int(np.array(z_ints, dtype=object)))
        data = ck.load("deep") if ck else None
        if data is not None:
            ood_z_l = jnp.asarray(data["ood_z"])
            ood_zg_l = jnp.asarray(data["ood_zg"])
            ood_h_l = jnp.asarray(data["ood_h"])
        else:
            ood_z_l, ood_zg_l, ood_h_l = self.phase_ood(
                trace_coeffs, h_coeffs, z)
        ood_z = self._flat(ood_z_l)
        ood_zg = self._flat(ood_zg_l)
        ood_h = self._flat(ood_h_l)
        if self._pack_lde:
            del trace_coeffs, h_coeffs  # only the OOD evals are needed now
        coin.reseed(hasher.host_digest(ood_z + ood_zg + ood_h))

        g_z = self._draw_coeffs(coin, w).transpose(0, 2, 1)   # [4, d, w]
        g_zg = self._draw_coeffs(coin, w).transpose(0, 2, 1)
        g_h = self._draw_coeffs(coin, k).transpose(0, 2, 1)   # [4, d, k]
        if data is not None:
            deep = jnp.asarray(data["deep"])
        else:
            if self._native_ntt:
                h_u = np.ascontiguousarray(
                    F.pack_u64(np.asarray(h_lde)).reshape(d * k, bn))
                deep = self._native_deep(lde_u, h_u, z_ints, ood_z_l,
                                         ood_zg_l, ood_h_l, g_z, g_zg, g_h)
            elif self._pack_lde:
                deep = self.phase_deep_p(lde, h_rows, ood_z_l, ood_zg_l,
                                         ood_h_l, g_z, g_zg, g_h, z)
            else:
                deep = self.phase_deep(lde, h_lde, ood_z_l, ood_zg_l, ood_h_l,
                                       g_z, g_zg, g_h, z)
            if ck:
                ck.save("deep", ood_z=ood_z_l, ood_zg=ood_zg_l,
                        ood_h=ood_h_l, deep=deep)
        tm.mark("OOD + DEEP", deep)

        # FRI commit phase
        fri_layers = []
        cur = deep
        size, o, gw = bn, self.offset, self.gen_big
        fold = opts.fri_folding
        li = 0
        while size > opts.fri_max_remainder:
            commit_kernel, fold_kernel = self._fri_kernels[size]
            data = ck.load(f"fri{li}") if ck else None
            if data is not None:
                group = jnp.asarray(data["group"])
                levels = [jnp.asarray(x) for x in ck.unpack_levels(data)]
            else:
                group, levels = commit_kernel(cur)
                if ck:
                    ck.save_levels(f"fri{li}", {"group": group}, levels)
            tree = M.MerkleTree.from_levels(hasher, levels)
            coin.reseed(tree.root())
            xi_ints = coin.draw_felts(d)
            fold_nat = self._fri_native.get(size)
            if fold_nat is not None:
                cur = fold_nat(cur, xi_ints)
            else:
                xi = jnp.asarray(F.from_int(np.array(xi_ints, dtype=object)))
                cur = fold_kernel(cur, xi)
            fri_layers.append(FRI.FriLayer(tree, size, o, gw, group))
            tm.mark(f"fri layer {size}", cur)
            size //= fold
            o = pow(o, fold, F.P)
            gw = pow(gw, fold, F.P)
            li += 1
        remainder = self._flat(cur)
        coin.reseed(hasher.host_digest(remainder))
        tm.mark("FRI layers")

        data = ck.load("pow") if ck else None
        if data is not None:
            nonce = int(data["nonce"])
        else:
            nonce = coin.grind(opts.grinding_bits)
            if ck:
                ck.save("pow", nonce=np.asarray(nonce, dtype=np.uint64))
        coin.reseed(hasher.host_digest([nonce]))
        tm.mark("grinding")
        positions = coin.draw_indices(opts.num_queries, bn)

        # every opened value (trace + h rows, all FRI layer groups) in ONE
        # jitted dispatch + ONE transfer, and every authentication path of
        # every tree in one more — eager per-level/per-layer gathers cost a
        # device roundtrip each (~2s of the warm proof on remote TPU backends)
        leaf_idxs, p_cur = [], list(positions)
        for layer in fri_layers:
            quarter = layer.n // fold
            leaf_idxs.append([p % quarter for p in p_cur])
            p_cur = leaf_idxs[-1]
        rows_dev = _gather_query_rows(lde, h_rows, np.asarray(positions))
        rows_host = F.to_int(np.asarray(rows_dev))
        del lde, h_rows, rows_dev    # 6.3 GB + 1.1 GB at the 2^23 flagship
        tm.mark("query row gathers")
        fri_dev = _gather_query_fri([l.group for l in fri_layers],
                                    [np.asarray(i) for i in leaf_idxs])
        lde_host, h_host = rows_host[:w], rows_host[w:]          # [w|k*d, Q]
        all_paths = M.prove_batch_multi(
            [trace_tree, h_tree] + [l.tree for l in fri_layers],
            [positions, positions] + leaf_idxs)
        tm.mark("auth paths")
        t_paths, h_paths = all_paths[0], all_paths[1]
        layer_data = [
            (leaf_idx, F.to_int(np.asarray(vals)), paths)        # [fold*d, Q]
            for leaf_idx, vals, paths in
            zip(leaf_idxs, fri_dev, all_paths[2:])]

        queries = []
        for qi, pos in enumerate(positions):
            fri_open = []
            for leaf_idx, vals, paths in layer_data:
                fri_open.append(([int(v) for v in vals[:, qi]],
                                 paths[leaf_idx[qi]]))
            queries.append(QueryOpening(
                index=int(pos),
                trace_row=[int(x) for x in lde_host[:, qi]],
                h_row=[int(x) for x in h_host[:, qi]],
                trace_path=t_paths[int(pos)],
                h_path=h_paths[int(pos)],
                fri_openings=fri_open,
            ))

        tm.mark("query openings")
        return Proof(
            trace_width=w, trace_length=n, options=opts,
            pub_inputs=air.pub_inputs_elements(),
            trace_root=trace_tree.root(), h_root=h_tree.root(),
            ood_trace_z=ood_z, ood_trace_zg=ood_zg, ood_h=ood_h,
            fri_roots=[l.tree.root() for l in fri_layers],
            fri_remainder=remainder, pow_nonce=nonce, queries=queries,
        )


def prove(air, trace, hasher=None) -> Proof:
    p = Prover(air, hasher)
    box = [trace]
    del trace          # this frame must not pin the trace: Prover.prove
    return p.prove(box.pop())  # frees it after the first phase (packed mode)
