"""STARK verifier — the framework's acceptance oracle.

Counterpart of `winterfell::verify::<Air>` (used at src/lib.rs:149 and every
sub-AIR's verify). Runs on host with Python-int field math; the only device use
is re-evaluating the AIR's (vectorized) transition constraints at the single
OOD point z with batch size 1, which guarantees the verifier checks the *same*
constraint code the prover ran (no dual-implementation soundness gap).

Raises VerificationError with a phase tag on any failure.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as F
from ..utils import poly_host as PH
from . import fri as FRI
from . import merkle as M
from .coin import RandomCoin
from .fieldops import BASE
from .hasher import get_hasher


class VerificationError(Exception):
    pass


# cache of jitted constraint evaluators keyed by (air class, n, has_periodic);
# NOTE: assumes evaluate_transition depends on pub inputs only through the
# periodic argument (true for all current AIRs).
_EVAL_CACHE = {}


def _fail(phase, msg=""):
    raise VerificationError(f"{phase}: {msg}")


def verify(air_class, proof, pub_inputs, air_kwargs=None):
    opts = proof.options
    assert opts.extension_degree == 1
    n = proof.trace_length
    air = air_class(n, pub_inputs, opts, **(air_kwargs or {}))
    w = proof.trace_width
    assert w == air.trace_width
    b = opts.blowup
    bn = b * n
    offset = F.GENERATOR
    g_trace = PH.root_of_unity(n)
    hasher = get_hasher(opts.hash_fn)

    # note: proof.pub_inputs is informational only — the coin is seeded from the
    # verifier's own pub_inputs, so tampering is caught cryptographically below.
    coin = RandomCoin(hasher, opts.context_elements(w, n) + air.pub_inputs_elements())
    coin.reseed(proof.trace_root)

    degrees = air.transition_degrees()
    assertions = air.assertions()
    t_alpha = coin.draw_felts(len(degrees))
    t_beta = coin.draw_felts(len(degrees))
    b_alpha = coin.draw_felts(len(assertions))
    b_beta = coin.draw_felts(len(assertions))
    t_coeffs = list(zip(t_alpha, t_beta))
    b_coeffs = list(zip(b_alpha, b_beta))
    k = air.ce_blowup()
    comp_deg = k * n - 1

    coin.reseed(proof.h_root)
    z = coin.draw_felt()
    zg = z * g_trace % F.P
    zk = pow(z, k, F.P)
    coin.reseed(hasher.host_digest(
        list(proof.ood_trace_z) + list(proof.ood_trace_zg) + list(proof.ood_h)))

    # ---- OOD consistency: C(z) from constraints == C(z) from H columns ----
    # The verifier re-runs the SAME vectorized constraint kernel at batch 1.
    cur = jnp.asarray(F.from_int(np.array(proof.ood_trace_z, dtype=object)[:, None]))
    nxt = jnp.asarray(F.from_int(np.array(proof.ood_trace_zg, dtype=object)[:, None]))
    pvals = air.periodic_values_at(z)
    periodic = (jnp.asarray(F.from_int(np.array(pvals, dtype=object)[:, None]))
                if pvals else None)
    def _stacked(c, x, p=None):
        ev = air.evaluate_transition(BASE, c, x, p)
        return jnp.stack(ev, axis=1) if isinstance(ev, (list, tuple)) else ev

    key = (air_class.__name__, n, periodic is None)
    if key not in _EVAL_CACHE:
        if periodic is None:
            _EVAL_CACHE[key] = jax.jit(lambda c, x: _stacked(c, x))
        else:
            _EVAL_CACHE[key] = jax.jit(_stacked)
    evals = (_EVAL_CACHE[key](cur, nxt) if periodic is None
             else _EVAL_CACHE[key](cur, nxt, periodic))
    c_at_z = [int(v) for v in F.to_int(np.asarray(evals))[:, 0]]

    zt = (pow(z, n, F.P) - 1) * pow(z - pow(g_trace, n - 1, F.P), F.P - 2, F.P) % F.P
    zt_inv = pow(zt, F.P - 2, F.P)
    comp_z = 0
    for (alpha, beta), dg, cz in zip(t_coeffs, degrees, c_at_z):
        q = cz * zt_inv % F.P
        adj = comp_deg - (dg.poly_degree(n) - (n - 1))
        comp_z = (comp_z + q * (alpha + beta * pow(z, adj, F.P))) % F.P
    from .boundary import verify_boundary_at
    comp_z = (comp_z + verify_boundary_at(
        assertions, n, g_trace, z, comp_deg,
        [int(v) for v in proof.ood_trace_z], b_coeffs)) % F.P

    h_at_z = sum(hm * pow(z, m, F.P) for m, hm in enumerate(proof.ood_h)) % F.P
    if comp_z % F.P != h_at_z:
        _fail("ood", f"composition mismatch {comp_z} != {h_at_z}")

    # ---- DEEP coefficients & FRI coin replay ------------------------------
    g_z = coin.draw_felts(w)
    g_zg = coin.draw_felts(w)
    g_h = coin.draw_felts(k)

    fri_xis = []
    for root in proof.fri_roots:
        coin.reseed(tuple(root))
        fri_xis.append(coin.draw_felt())
    coin.reseed(hasher.host_digest(list(proof.fri_remainder)))

    if not coin.check_pow(proof.pow_nonce, opts.grinding_bits):
        _fail("pow", "bad nonce")
    coin.reseed(hasher.host_digest([proof.pow_nonce]))
    positions = coin.draw_indices(opts.num_queries, bn)
    if positions != [q.index for q in proof.queries]:
        _fail("queries", "positions mismatch")

    # ---- remainder low-degree check --------------------------------------
    n_layers = len(proof.fri_roots)
    fold = opts.fri_folding
    rem_n = bn // (fold ** n_layers)
    if len(proof.fri_remainder) != rem_n or rem_n > opts.fri_max_remainder:
        _fail("fri", "remainder size")
    rem_offset = pow(offset, fold ** n_layers, F.P)
    if not FRI.verify_remainder(list(proof.fri_remainder), b, rem_offset):
        _fail("fri", "remainder degree too high")

    # ---- per-query checks -------------------------------------------------
    w_big = PH.root_of_unity(bn)
    inv = lambda x: pow(x, F.P - 2, F.P)
    for q in proof.queries:
        pos = q.index
        if not M.verify_path(hasher, proof.trace_root, pos,
                             hasher.host_digest(q.trace_row), q.trace_path):
            _fail("merkle", f"trace path @ {pos}")
        if not M.verify_path(hasher, proof.h_root, pos,
                             hasher.host_digest(q.h_row), q.h_path):
            _fail("merkle", f"h path @ {pos}")
        x = offset * pow(w_big, pos, F.P) % F.P
        deep = 0
        for j in range(w):
            deep += g_z[j] * (q.trace_row[j] - proof.ood_trace_z[j]) % F.P * inv(x - z)
            deep += g_zg[j] * (q.trace_row[j] - proof.ood_trace_zg[j]) % F.P * inv(x - zg)
        for m in range(k):
            deep += g_h[m] * (q.h_row[m] - proof.ood_h[m]) % F.P * inv(x - zk)
        deep %= F.P

        # follow the FRI folding chain
        if len(q.fri_openings) != n_layers:
            _fail("fri", "openings count")
        cur_val = deep
        cur_pos = pos
        cur_n = bn
        cur_off = offset
        cur_gen = w_big
        for li, (vals, path) in enumerate(q.fri_openings):
            quarter = cur_n // fold
            leaf_idx = cur_pos % quarter
            slot = cur_pos // quarter
            if not M.verify_path(hasher, tuple(proof.fri_roots[li]), leaf_idx,
                                 hasher.host_digest(vals), path):
                _fail("fri", f"layer {li} path")
            if vals[slot] % F.P != cur_val % F.P:
                _fail("fri", f"layer {li} value mismatch @ {pos}")
            x0 = cur_off * pow(cur_gen, leaf_idx, F.P) % F.P
            if fold == 4:
                cur_val = FRI.fold4_host(list(vals), fri_xis[li], x0, cur_n)
            else:
                cur_val = FRI.fold2_host(vals[0], vals[1], fri_xis[li], x0)
            cur_pos = leaf_idx
            cur_n //= fold
            cur_off = pow(cur_off, fold, F.P)
            cur_gen = pow(cur_gen, fold, F.P)
        if proof.fri_remainder[cur_pos] % F.P != cur_val % F.P:
            _fail("fri", f"remainder mismatch @ {pos}")

    return True
