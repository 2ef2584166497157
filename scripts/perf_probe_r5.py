#!/usr/bin/env python
"""Round-5 perf attribution probes (run on the TPU chip, one at a time).

Targets the round-4 verdict's open performance questions:
  --ntt      batched-NTT variants (item: [94,2^17] runs 6x below single-col)
  --eval     packed-mode eval-chunk overhead attribution (0.97s/chunk in the
             1024-tx run vs ~0.17s standalone)
  --pallas   fixed rescue Pallas kernel vs XLA path at batch 4k/64k
  --tracegen device trace-gen scaling T = 16..1024 (129s at 1024tx = 4x/tx
             worse than at 16tx)

Prints one JSON dict per section to stdout; streams metrics to stderr.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(r):
    import numpy as np
    import jax
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
    return r


def bench(fn, *args, reps=3, min_s=0.5):
    _sync(fn(*args))
    n = reps
    while True:
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        _sync(r)
        dt = time.perf_counter() - t0
        if dt >= min_s or n >= 1024:
            return dt / n
        n *= 4


class Streamed(dict):
    def __setitem__(self, k, v):
        print(f"# {k} = {v}", file=sys.stderr, flush=True)
        super().__setitem__(k, v)


def probe_ntt(out):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from certificate_stark_tpu.ops import field as F, ntt as NTT

    rng = np.random.default_rng(0)

    def rnd(*s):
        return jnp.asarray(F.from_int(rng.integers(0, F.P, size=s).astype(object)))

    def grouped(wc):
        @jax.jit
        def f(x):
            C, n = x.shape[1], x.shape[-1]
            pad = (-C) % wc
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            g = x.reshape(4, -1, wc, n).transpose(1, 0, 2, 3)
            o = jax.lax.map(NTT.ntt_four_step, g)
            return o.transpose(1, 0, 2, 3).reshape(4, -1, n)[:, :C]
        return f

    for (C, lg) in ((94, 17), (16, 20)):
        x = rnd(C, 1 << lg)
        nb = C * (1 << lg) * lg / 2
        t = bench(jax.jit(NTT.ntt), x)
        out[f"ntt_[{C},2^{lg}]_current_s"] = t
        out[f"ntt_[{C},2^{lg}]_current_bf_per_s"] = nb / t
        for wc in (2, 8, 16, 32):
            if wc >= C:
                continue
            t = bench(grouped(wc), x)
            out[f"ntt_[{C},2^{lg}]_grp{wc}_s"] = t
            out[f"ntt_[{C},2^{lg}]_grp{wc}_bf_per_s"] = nb / t
        # alternative four-step splits
        for n1log in (6, 8, 10, 12):
            if n1log >= lg:
                continue
            f = jax.jit(lambda a, n1=1 << n1log: NTT.ntt_four_step(a, n1=n1))
            try:
                t = bench(f, x)
                out[f"ntt_[{C},2^{lg}]_n1=2^{n1log}_s"] = t
                out[f"ntt_[{C},2^{lg}]_n1=2^{n1log}_bf_per_s"] = nb / t
            except Exception as e:  # noqa: BLE001
                out[f"ntt_[{C},2^{lg}]_n1=2^{n1log}_s"] = f"FAIL {e}"
        del x
    # correctness spot check of the grouped form
    x = rnd(5, 1 << 15)
    ref = np.asarray(jax.jit(NTT.ntt_four_step)(x))
    got = np.asarray(grouped(2)(x))
    out["ntt_grouped_matches"] = bool(np.array_equal(ref, got))


def probe_eval(out, n_tx=128, depth=15):
    """Packed-mode composition-phase attribution at the n_tx flagship shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.engine import prover as PRmod
    from certificate_stark_tpu.models import transaction as TX

    os.environ["CSTARK_PACK_LDE"] = "1"
    opts = ProofOptions(num_queries=42, blowup=8, hash_fn="blake3",
                        extension_degree=1)
    t0 = time.perf_counter()
    ex = TX.TransactionExample(n_tx, opts, depth=depth, seed=3)
    out["witness_s"] = time.perf_counter() - t0
    air = TX.TransactionAir(1024 * n_tx, ex.pub_inputs(), opts,
                            depth=depth)
    t0 = time.perf_counter()
    p = PRmod.Prover(air)
    out["prover_init_s"] = time.perf_counter() - t0
    out["pack_lde"] = p._pack_lde
    out["eval_chunk"] = p._eval_chunk
    S, bn, w = p._eval_chunk, p.bn, p.w
    nch = bn // S
    out["n_chunks"] = nch

    t0 = time.perf_counter()
    trace = TX.build_trace(ex.md, ex.messages)
    _sync(trace)
    out["trace_gen_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    coeffs = p.phase_trace_coeffs(trace)
    del trace
    lde_p = p._build_lde_packed(coeffs)
    _sync(lde_p)
    out["lde_packed_s"] = time.perf_counter() - t0

    nc, nb_ = len(p.degrees), len(p.assertions)
    ta = PRmod._limbs(list(range(1, nc + 1)))[:, :, None]
    tb = PRmod._limbs(list(range(2, nc + 2)))[:, :, None]
    ba = PRmod._limbs(list(range(3, nb_ + 3)))[:, :, None]
    bb = PRmod._limbs(list(range(4, nb_ + 4)))[:, :, None]
    per = jnp.asarray(p._periodic_tiled(S))

    # (a) the full packed composition phase, as prove() runs it
    t = bench(p.phase_composition_p, lde_p, ta, tb, ba, bb, per, p._b_evals,
              reps=1, min_s=0.0)
    out["phase_composition_p_s"] = t
    out["per_chunk_in_phase_s"] = t / nch

    # (b) ONE chunk body standalone (unpack + eval + pointwise comp),
    #     reusing the exact same traced functions via a wrapper jit
    BASE = PRmod.BASE

    @jax.jit
    def one_chunk(lde_p_, i, per_, bev):
        st = i * S
        cur = PRmod.F.unpack2(jax.lax.dynamic_slice(
            lde_p_, (0, 0, st), (2, w, S)))
        nx = PRmod.F.unpack2(jax.lax.dynamic_slice(
            lde_p_, (0, 0, st + p.b), (2, w, S)))
        ev = air.evaluate_transition(BASE, cur, nx, per_)
        if isinstance(ev, (list, tuple)):
            ev = jnp.stack(ev, axis=1)
        return ev

    t = bench(one_chunk, lde_p, jnp.int32(3), per, p._b_evals)
    out["one_chunk_unpack_eval_s"] = t

    # (b2) one FULL chunk body (unpack + eval + chunk tables + pointwise
    #      composition) standalone — the exact lax.map body of
    #      phase_composition_p, outside the map
    import functools

    @jax.jit
    def one_chunk_full(lde_p_, i, per_, bev):
        comp = p.phase_composition_p  # noqa: F841 (kernel already built)
        # rebuild the body inline via the prover's cached closures
        st = i * S
        cur = PRmod.F.unpack2(jax.lax.dynamic_slice(
            lde_p_, (0, 0, st), (2, w, S)))
        nx = PRmod.F.unpack2(jax.lax.dynamic_slice(
            lde_p_, (0, 0, st + p.b), (2, w, S)))
        ev = air.evaluate_transition(BASE, cur, nx, per_)
        if isinstance(ev, (list, tuple)):
            ev = jnp.stack(ev, axis=1)
        # pointwise composition with in-graph chunk tables is private to the
        # phase closure; approximate its cost with the alpha dot alone
        qd = ev[:, :, None, :]
        coeffs = jnp.concatenate([ta, tb], axis=2)
        dots = PRmod.F.mul_sum(qd, coeffs[:, :, :, None], axis=1)
        return dots

    try:
        t = bench(one_chunk_full, lde_p, jnp.int32(3), per, p._b_evals)
        out["one_chunk_eval_plus_dot_s"] = t
    except Exception as e:  # noqa: BLE001
        out["one_chunk_eval_plus_dot_s"] = f"FAIL {type(e).__name__}: {e}"

    # (c) unpack-only
    @jax.jit
    def unpack_only(lde_p_, i):
        st = i * S
        cur = PRmod.F.unpack2(jax.lax.dynamic_slice(
            lde_p_, (0, 0, st), (2, w, S)))
        nx = PRmod.F.unpack2(jax.lax.dynamic_slice(
            lde_p_, (0, 0, st + p.b), (2, w, S)))
        return PRmod.F.add(cur, nx)

    out["one_chunk_unpack_only_s"] = bench(unpack_only, lde_p, jnp.int32(3))

    # (d) the full UNPACKED composition phase on the same workload, for
    #     reference (lax.map over pre-sliced operands instead of dynamic
    #     slices of the packed buffer)
    try:
        lde_l = PRmod.F.unpack2(lde_p[:, :, :bn])
        per_full = per if bn == S else None
        t = bench(p.phase_composition, lde_l, ta, tb, ba, bb,
                  (per if per_full is None else per), p._b_evals,
                  reps=1, min_s=0.0)
        out["phase_composition_unpacked_s"] = t
    except Exception as e:  # noqa: BLE001
        out["phase_composition_unpacked_s"] = f"FAIL {type(e).__name__}: {e}"


def probe_pallas(out):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from certificate_stark_tpu.ops import field as F, rescue as R
    from certificate_stark_tpu.ops import pallas_kernels as PK

    rng = np.random.default_rng(1)
    for b in (4096, 65536):
        st = jnp.asarray(F.from_int(rng.integers(0, F.P, size=(14, b)).astype(object)))
        out[f"rescue_xla_b{b}_s"] = bench(jax.jit(R.permutation), st)
        try:
            t = bench(lambda x: PK.pallas_rescue_permutation(x), st)
            out[f"rescue_pallas_b{b}_s"] = t
            ok = bool(np.array_equal(np.asarray(PK.pallas_rescue_permutation(st)),
                                     np.asarray(R.permutation(st))))
            out[f"rescue_pallas_b{b}_matches"] = ok
        except Exception as e:  # noqa: BLE001
            out[f"rescue_pallas_b{b}_s"] = f"FAIL {type(e).__name__}: {e}"
        out[f"rescue_xla_b{b}_perms_per_s"] = b / out[f"rescue_xla_b{b}_s"]
        if isinstance(out.get(f"rescue_pallas_b{b}_s"), float):
            out[f"rescue_pallas_b{b}_perms_per_s"] = \
                b / out[f"rescue_pallas_b{b}_s"]


def probe_tracegen(out, tmax=1024):
    import jax
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.models import transaction as TX

    opts = ProofOptions(num_queries=8, blowup=8, hash_fn="blake3")
    T = 16
    while T <= tmax:
        t0 = time.perf_counter()
        ex = TX.TransactionExample(T, opts, depth=15, seed=1)
        wit = time.perf_counter() - t0
        # cold (compile) then warm
        t0 = time.perf_counter()
        tr = TX.build_trace(ex.md, ex.messages)
        _sync(tr)
        cold = time.perf_counter() - t0
        del tr
        t0 = time.perf_counter()
        tr = TX.build_trace(ex.md, ex.messages)
        _sync(tr)
        warm = time.perf_counter() - t0
        del tr, ex
        out[f"tracegen_T{T}_witness_s"] = wit
        out[f"tracegen_T{T}_cold_s"] = cold
        out[f"tracegen_T{T}_warm_s"] = warm
        out[f"tracegen_T{T}_us_per_tx"] = warm / T * 1e6
        T *= 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntt", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--tracegen", action="store_true")
    ap.add_argument("--eval-tx", type=int, default=128)
    ap.add_argument("--eval-depth", type=int, default=15)
    ap.add_argument("--tracegen-max", type=int, default=1024)
    args = ap.parse_args()

    import jax
    out = Streamed({"backend": jax.default_backend()})
    if args.ntt:
        probe_ntt(out)
    if args.eval:
        probe_eval(out, args.eval_tx, args.eval_depth)
    if args.pallas:
        probe_pallas(out)
    if args.tracegen:
        probe_tracegen(out, args.tracegen_max)
    print(json.dumps(out, indent=1, default=str))


if __name__ == "__main__":
    main()
