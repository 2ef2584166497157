"""FRI low-degree proof: device-side commit/fold, host-side verify helpers.

Counterpart of winterfell's FRI prover (engine-side, consumed via
`Prover::prove`; options fold=4, max remainder 256 per src/lib.rs:84-85).

Folding: one random ext element xi per fold-by-4 layer, applied as two radix-2
folds with xi and xi^2:
    E'(x^2) = (E(x) + E(-x))/2 + xi * (E(x) - E(-x)) / (2x)
On a domain o*<w> the -x partner of index j is index j + n/2, and 1/x comes from
a precomputed inverse-powers table (no field inversions on the fold path).

Layer Merkle leaves group the `folding` evaluations that fold together, so each
query costs one path per layer (matching winterfell's layout).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import field as F
from . import merkle as M
from ..utils import poly_host as PH


def _inv_xs_table(offset: int, gen: int, count: int) -> np.ndarray:
    """[(o*w^j)^-1 for j < count] built from powers of w^-1 (host numpy)."""
    o_inv = pow(offset, F.P - 2, F.P)
    w_inv = pow(gen, F.P - 2, F.P)
    tbl = F.np_powers(w_inv, count)
    return F.mul_const(tbl, F.np_const(o_inv), np)


def fold2_dyn(evals: jnp.ndarray, xi: jnp.ndarray, offset: int, gen: int) -> jnp.ndarray:
    """One radix-2 fold with a traced folding scalar xi [4].

    evals: [4, n] -> [4, n/2]; new domain o^2*<w^2>. Jit-safe: the inverse
    domain table is concrete (static offset/gen), no field inversions.
    """
    n = evals.shape[-1]
    half = n // 2
    e0 = evals[..., :half]
    e1 = evals[..., half:]
    inv2 = F.const(pow(2, F.P - 2, F.P))
    s = F.mul_const(F.add(e0, e1), inv2)                     # (E(x)+E(-x))/2
    d = F.mul_const(F.sub(e0, e1), inv2)                     # (E(x)-E(-x))/2
    invxs = _inv_xs_table(offset, gen, half)                 # concrete (numpy)
    d = F.mul(d, jnp.asarray(invxs))
    d = F.mul(d, jnp.broadcast_to(xi[:, None], d.shape))
    return F.add(s, d)


def fold2(evals: jnp.ndarray, xi: int, offset: int, gen: int) -> jnp.ndarray:
    from ..engine.prover import _limb  # late import to avoid cycle
    return fold2_dyn(evals, _limb(xi), offset, gen)


class FriLayer:
    def __init__(self, tree, n, offset, gen, group):
        self.tree = tree
        self.n = n
        self.offset = offset
        self.gen = gen
        self.group = group  # [4, folding, n/folding] evaluations (device)

    def values_at(self, leaf_idx: int) -> list:
        col = np.asarray(self.group[..., leaf_idx])
        return [int(v) for v in F.to_int(col)]


# ---------------------------------------------------------------------------
# host-side verification helpers
# ---------------------------------------------------------------------------
def fold2_host(e_x: int, e_negx: int, xi: int, x: int) -> int:
    inv2 = pow(2, F.P - 2, F.P)
    s = (e_x + e_negx) * inv2 % F.P
    d = (e_x - e_negx) * inv2 % F.P
    return (s + xi * d * pow(x, F.P - 2, F.P)) % F.P


def fold4_host(vals: list, xi: int, x0: int, n: int, offset_unused=None) -> int:
    """Fold 4 grouped evaluations {E(x), E(gx)...} -> next-layer value.

    vals are the leaf-grouped values [E at j, j+n/4, j+2n/4, j+3n/4] where the
    domain point at j is x0. w^{n/4} = i (4th root), w^{n/2} = -1.
    """
    # pair for first fold2: (j, j+n/2) and (j+n/4, j+3n/4)
    i_unit = PH.root_of_unity(4)
    a = fold2_host(vals[0], vals[2], xi, x0)
    b = fold2_host(vals[1], vals[3], xi, x0 * i_unit % F.P)
    # second fold with xi^2 at point x0^2
    return fold2_host(a, b, xi * xi % F.P, pow(x0, 2, F.P))


def verify_remainder(remainder: list, blowup: int, offset: int) -> bool:
    """Check the remainder evaluations are a degree < n/blowup polynomial over
    the final coset domain."""
    n = len(remainder)
    # interpolate over coset o*<w_n>: scale out offset after intt
    coeffs = PH.intt(list(remainder))
    o_inv = pow(offset, F.P - 2, F.P)
    coeffs = [c * pow(o_inv, i, F.P) % F.P for i, c in enumerate(coeffs)]
    return PH.poly_degree(coeffs) < n // blowup


def fold2_ext(evals, xi, offset: int, gen: int, degree: int):
    """Radix-2 fold for (possibly extension-valued) evaluations [4, d, n]
    with an extension folding scalar xi [4, d]."""
    from ..ops import extfield as XF

    n = evals.shape[-1]
    half = n // 2
    e0 = evals[..., :half]
    e1 = evals[..., half:]
    inv2 = F.const(pow(2, F.P - 2, F.P))
    s = F.mul_const(F.add(e0, e1), inv2)
    dterm = F.mul_const(F.sub(e0, e1), inv2)
    invxs = _inv_xs_table(offset, gen, half)            # [4, half] base
    dterm = F.mul(dterm, jnp.asarray(invxs)[:, None])
    dterm = XF.ext_mul(dterm, xi[:, :, None], degree)
    return F.add(s, dterm)
