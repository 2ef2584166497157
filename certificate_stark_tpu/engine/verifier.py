"""STARK verifier — the framework's acceptance oracle.

Counterpart of `winterfell::verify::<Air>` (used at src/lib.rs:149 and every
sub-AIR's verify). Runs fully on host with Python-int field math; the AIR's
*same vectorized constraint code* is executed at the single OOD point z through
the HostExtOps object-array facade (engine/fieldops.py), for base as well as
quadratic/cubic extension options — no prover/verifier constraint divergence.

Raises VerificationError with a phase tag on any failure.
"""
from __future__ import annotations

import numpy as np

from ..ops import field as F
from ..ops import extfield as XF
from ..utils import poly_host as PH
from . import merkle as M
from .air import SequenceAssertion
from .boundary import group_assertions, quotient_degree
from .coin import RandomCoin
from .fieldops import HostExtOps
from .hasher import get_hasher


class VerificationError(Exception):
    pass


def _fail(phase, msg=""):
    raise VerificationError(f"{phase}: {msg}")


def _ext(d):
    """Host ext helpers bound to degree d (python-int tuples)."""
    def mul(a, b):
        return tuple(XF.host_ext_mul(list(a), list(b), d))

    def add(a, b):
        return tuple((x + y) % F.P for x, y in zip(a, b))

    def sub(a, b):
        return tuple((x - y) % F.P for x, y in zip(a, b))

    def inv(a):
        return tuple(XF.host_ext_inv(list(a), d))

    def lift(x):
        return tuple([int(x) % F.P] + [0] * (d - 1))

    def powi(a, e):
        r = lift(1)
        a = tuple(a)
        while e:
            if e & 1:
                r = mul(r, a)
            a = mul(a, a)
            e >>= 1
        return r

    return mul, add, sub, inv, lift, powi


def _regroup(flat, d):
    """Flat element-major int list -> list of d-tuples."""
    assert len(flat) % d == 0
    return [tuple(int(v) % F.P for v in flat[i * d:(i + 1) * d])
            for i in range(len(flat) // d)]


def verify(air_class, proof, pub_inputs, air_kwargs=None,
           expected_options=None, min_security=None):
    """Accept/reject `proof` for `air_class(pub_inputs)`.

    The proof carries its own ProofOptions (as in winterfell), so a caller
    that does not pin them would accept, e.g., a 1-query blowup-2 proof.
    Callers with a known configuration should pass `expected_options`
    (rejected on any mismatch) or `min_security` (bits; checked against
    proof.security_level(conjectured=True)). The Example wrappers pass their
    own options automatically.
    """
    opts = proof.options
    if expected_options is not None and repr(opts) != repr(expected_options):
        _fail("options", f"proof options {opts!r} != expected "
                         f"{expected_options!r}")
    if min_security is not None and \
            proof.security_level(conjectured=True) < int(min_security):
        _fail("options", f"security {proof.security_level(True)} < "
                         f"required {min_security}")
    n = proof.trace_length
    air = air_class(n, pub_inputs, opts, **(air_kwargs or {}))
    w = proof.trace_width
    assert w == air.trace_width
    b = opts.blowup
    bn = b * n
    d = opts.extension_degree
    offset = F.GENERATOR
    g_trace = PH.root_of_unity(n)
    hasher = get_hasher(opts.hash_fn)
    mul, add, sub, inv, lift, powi = _ext(d)

    coin = RandomCoin(hasher, opts.context_elements(w, n) + air.pub_inputs_elements())
    coin.reseed(proof.trace_root)

    degrees = air.transition_degrees()
    assertions = air.assertions()
    t_alpha = [tuple(coin.draw_felts(d)) for _ in range(len(degrees))]
    t_beta = [tuple(coin.draw_felts(d)) for _ in range(len(degrees))]
    b_alpha = [tuple(coin.draw_felts(d)) for _ in range(len(assertions))]
    b_beta = [tuple(coin.draw_felts(d)) for _ in range(len(assertions))]
    k = air.ce_blowup()
    comp_deg = k * n - 1

    coin.reseed(proof.h_root)
    z = tuple(coin.draw_felts(d))
    zg = mul(z, lift(g_trace))
    zk = powi(z, k)
    coin.reseed(hasher.host_digest(
        list(proof.ood_trace_z) + list(proof.ood_trace_zg) + list(proof.ood_h)))

    ood_z = _regroup(proof.ood_trace_z, d)
    ood_zg = _regroup(proof.ood_trace_zg, d)
    ood_h = _regroup(proof.ood_h, d)
    if len(ood_z) != w or len(ood_h) != k:
        _fail("ood", "frame size")

    # ---- OOD consistency: C(z) from constraints == C(z) from H columns ----
    fx = HostExtOps(d)
    cur = fx.from_coeffs([list(v) for v in ood_z])
    nxt = fx.from_coeffs([list(v) for v in ood_zg])
    pvals = _periodic_values_at_ext(air, z, d, mul, add, lift, powi)
    periodic = fx.from_coeffs(pvals) if pvals is not None else None
    evals = air.evaluate_transition(fx, cur, nxt, periodic)
    c_at_z = [tuple(evals[0, i, 0]) for i in range(evals.shape[1])]

    z_n = powi(z, n)
    zt = mul(sub(z_n, lift(1)), inv(sub(z, lift(pow(g_trace, n - 1, F.P)))))
    zt_inv = inv(zt)
    comp_z = lift(0)
    for (alpha, beta), dg, cz in zip(zip(t_alpha, t_beta), degrees, c_at_z):
        q = mul(cz, zt_inv)
        adj = comp_deg - (dg.poly_degree(n) - (n - 1))
        comp_z = add(comp_z, mul(q, add(alpha, mul(beta, powi(z, adj)))))

    # boundary terms
    cmap = {id(a): (al, be) for a, al, be in zip(assertions, b_alpha, b_beta)}
    for key, group in group_assertions(assertions, n).items():
        if key[0] == "s":
            zden = sub(z, lift(pow(g_trace, key[1], F.P)))
        else:
            m = n // key[2]
            zden = sub(powi(z, m), lift(pow(g_trace, key[1] * m, F.P)))
        zden_inv = inv(zden)
        adj = comp_deg - quotient_degree(key, n)
        zadj = powi(z, adj)
        for a in group:
            alpha, beta = cmap[id(a)]
            if isinstance(a, SequenceAssertion):
                m = n // a.period
                qc = PH.intt([int(v) % F.P for v in a.values])
                y = mul(z, lift(pow(pow(g_trace, a.first_step, F.P), F.P - 2, F.P)))
                bval = lift(0)
                for c in reversed(qc):
                    bval = add(mul(bval, y), lift(c))
            else:
                bval = lift(a.value % F.P)
            qv = mul(sub(ood_z[a.column], bval), zden_inv)
            comp_z = add(comp_z, mul(qv, add(alpha, mul(beta, zadj))))

    h_at_z = lift(0)
    for m_i, hv in enumerate(ood_h):
        h_at_z = add(h_at_z, mul(hv, powi(z, m_i)))
    if comp_z != h_at_z:
        _fail("ood", f"composition mismatch {comp_z} != {h_at_z}")

    # ---- DEEP coefficients & FRI coin replay ------------------------------
    g_z = [tuple(coin.draw_felts(d)) for _ in range(w)]
    g_zg = [tuple(coin.draw_felts(d)) for _ in range(w)]
    g_h = [tuple(coin.draw_felts(d)) for _ in range(k)]

    fri_xis = []
    for root in proof.fri_roots:
        coin.reseed(tuple(root))
        fri_xis.append(tuple(coin.draw_felts(d)))
    coin.reseed(hasher.host_digest(list(proof.fri_remainder)))

    if not coin.check_pow(proof.pow_nonce, opts.grinding_bits):
        _fail("pow", "bad nonce")
    coin.reseed(hasher.host_digest([proof.pow_nonce]))
    positions = coin.draw_indices(opts.num_queries, bn)
    if positions != [q.index for q in proof.queries]:
        _fail("queries", "positions mismatch")

    # ---- remainder low-degree check (per extension coordinate) ------------
    n_layers = len(proof.fri_roots)
    fold = opts.fri_folding
    rem_n = bn // (fold ** n_layers)
    remainder = _regroup(proof.fri_remainder, d)
    if len(remainder) != rem_n or rem_n > opts.fri_max_remainder:
        _fail("fri", "remainder size")
    rem_offset = pow(offset, fold ** n_layers, F.P)
    o_inv = pow(rem_offset, F.P - 2, F.P)
    for c in range(d):
        coeffs = PH.intt([r[c] for r in remainder])
        coeffs = [x * pow(o_inv, i, F.P) % F.P for i, x in enumerate(coeffs)]
        if PH.poly_degree(coeffs) >= rem_n // b:
            _fail("fri", "remainder degree too high")

    # ---- per-query checks -------------------------------------------------
    w_big = PH.root_of_unity(bn)
    i4 = PH.root_of_unity(4)
    for q in proof.queries:
        pos = q.index
        if not M.verify_path(hasher, proof.trace_root, pos,
                             hasher.host_digest(q.trace_row), q.trace_path):
            _fail("merkle", f"trace path @ {pos}")
        if not M.verify_path(hasher, proof.h_root, pos,
                             hasher.host_digest(q.h_row), q.h_path):
            _fail("merkle", f"h path @ {pos}")
        x = offset * pow(w_big, pos, F.P) % F.P
        h_row = _regroup(q.h_row, d)
        if len(h_row) != k:
            _fail("h", "row size")
        inv_xz = inv(sub(lift(x), z))
        inv_xzg = inv(sub(lift(x), zg))
        inv_xzk = inv(sub(lift(x), zk))
        deep = lift(0)
        acc = lift(0)
        for j in range(w):
            acc = add(acc, mul(g_z[j], sub(lift(q.trace_row[j]), ood_z[j])))
        deep = add(deep, mul(acc, inv_xz))
        acc = lift(0)
        for j in range(w):
            acc = add(acc, mul(g_zg[j], sub(lift(q.trace_row[j]), ood_zg[j])))
        deep = add(deep, mul(acc, inv_xzg))
        acc = lift(0)
        for m_i in range(k):
            acc = add(acc, mul(g_h[m_i], sub(h_row[m_i], ood_h[m_i])))
        deep = add(deep, mul(acc, inv_xzk))

        # follow the FRI folding chain
        if len(q.fri_openings) != n_layers:
            _fail("fri", "openings count")
        cur_val = deep
        cur_pos = pos
        cur_n = bn
        cur_off = offset
        cur_gen = w_big
        inv2 = lift(pow(2, F.P - 2, F.P))

        def fold2h(e_x, e_negx, xi, xv):
            s = mul(add(e_x, e_negx), inv2)
            dd = mul(sub(e_x, e_negx), inv2)
            return add(s, mul(mul(xi, dd), lift(pow(xv, F.P - 2, F.P))))

        for li, (vals_flat, path) in enumerate(q.fri_openings):
            quarter = cur_n // fold
            leaf_idx = cur_pos % quarter
            slot = cur_pos // quarter
            if not M.verify_path(hasher, tuple(proof.fri_roots[li]), leaf_idx,
                                 hasher.host_digest(vals_flat), path):
                _fail("fri", f"layer {li} path")
            vals = _regroup(vals_flat, d)
            if vals[slot] != cur_val:
                _fail("fri", f"layer {li} value mismatch @ {pos}")
            x0 = cur_off * pow(cur_gen, leaf_idx, F.P) % F.P
            xi = fri_xis[li]
            if fold == 4:
                a1 = fold2h(vals[0], vals[2], xi, x0)
                b1 = fold2h(vals[1], vals[3], xi, x0 * i4 % F.P)
                cur_val = fold2h(a1, b1, mul(xi, xi), pow(x0, 2, F.P))
            else:
                cur_val = fold2h(vals[0], vals[1], xi, x0)
            cur_pos = leaf_idx
            cur_n //= fold
            cur_off = pow(cur_off, fold, F.P)
            cur_gen = pow(cur_gen, fold, F.P)
        if remainder[cur_pos] != cur_val:
            _fail("fri", f"remainder mismatch @ {pos}")

    return True


def _periodic_values_at_ext(air, z, d, mul, add, lift, powi):
    """Periodic column polynomial values at the (possibly ext) point z."""
    cols = air.periodic_columns()
    if cols is None:
        return None
    n = air.trace_length
    cols = np.asarray(cols, dtype=object)
    if d == 1:
        # base-field fast path: batched native iNTT + numpy Montgomery dot.
        # The Python-int iNTT+Horner below is O(C * t log t) host work —
        # 10.9 s of the schnorr-128 verify (56 full-trace-length pkey
        # columns at t = 65536) before round 5.
        try:
            from ..utils import native as NAT
            if NAT.available():
                return _periodic_values_native(cols, n, int(z[0]))
        except Exception:  # noqa: BLE001 — fall back to the int path
            pass
    out = []
    for col in cols:
        coeffs = PH.intt([int(v) % F.P for v in col])
        y = powi(z, n // len(col))
        acc = lift(0)
        for c in reversed(coeffs):
            acc = add(mul(acc, y), lift(c))
        out.append(list(acc))
    return out


def _periodic_values_native(cols, n, z):
    """Batched periodic-column evaluation at base point z: per distinct
    column length, one native iNTT over all columns + one numpy limb dot
    with the z-powers table. Identical values to the Python path."""
    from ..ops import ntt as NTT
    from ..utils import native as NAT

    by_len = {}
    for i, col in enumerate(cols):
        by_len.setdefault(len(col), []).append(i)
    out = [None] * len(cols)
    for t, idxs in by_len.items():
        arr = np.array([[int(v) % F.P for v in cols[i]] for i in idxs],
                       dtype=object)
        u = F.pack_u64(F.from_int(arr))                      # [C, t] mont
        coeffs = F.unpack_u64(NAT.intt_coset_batch(u, 1))    # [4, C, t]
        y = pow(z, n // t, F.P)
        ytbl = F.unpack_u64(NAT.powers_mont(y, t))           # [4, t]
        prod = F.mul(coeffs, np.broadcast_to(ytbl[:, None], coeffs.shape),
                     np)
        vals = F.to_int(NTT.sum_reduce(prod, xp=np))         # [C] ints
        for c, i in enumerate(idxs):
            out[i] = [int(vals[c])]
    return out
