"""The native C constraint evaluators (native/air_eval.c) must be
BIT-IDENTICAL to the fused device kernels for every AIR they cover, and the
prover must produce identical proofs through either path."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine import prover as PR
from certificate_stark_tpu.engine.fieldops import BASE
from certificate_stark_tpu.ops import field as F
from certificate_stark_tpu.utils import native as NAT


pytestmark = pytest.mark.skipif(not NAT.available(),
                                reason="native library unavailable")


def _case(kind):
    if kind == "rescue_chain":
        from certificate_stark_tpu.models import rescue_chain as M
        opts = ProofOptions(num_queries=4, blowup=4, hash_fn="blake3")
        ex = M.RescueChainExample(16, opts)
        air = M.RescueChainAir(16 * 8, ex.pub_inputs(), opts)
        return ex, air
    if kind == "schnorr":
        from certificate_stark_tpu.models import schnorr as M
        opts = ProofOptions(num_queries=4, blowup=8, hash_fn="blake3")
        ex = M.SchnorrExample(1, opts)
        air = M.SchnorrAir(ex.trace.shape[-1], ex.pub_inputs(), opts)
    elif kind == "merkle_update":
        from certificate_stark_tpu.models import merkle_update as M
        opts = ProofOptions(num_queries=4, blowup=4, hash_fn="blake3")
        ex = M.MerkleUpdateExample(1, opts, depth=3)
        air = M.MerkleUpdateAir(ex.trace.shape[-1], ex.pub_inputs(), opts,
                                depth=3)
    else:
        from certificate_stark_tpu.models import transaction as M
        opts = ProofOptions(num_queries=4, blowup=8, hash_fn="blake3")
        ex = M.TransactionExample(1, opts, depth=3)
        air = M.TransactionAir(ex.trace.shape[-1], ex.pub_inputs(), opts,
                               depth=3)
    return ex, air


@pytest.mark.parametrize("kind", ["rescue_chain", "schnorr", "merkle_update",
                                  "transaction"])
def test_native_eval_bit_identical(kind):
    ex, air = _case(kind)
    p = PR.Prover(air)
    _, lde = p.phase_trace(ex.trace)
    nxt = jnp.roll(lde, -p.b, axis=-1)
    periodic = jnp.asarray(p._periodic_tiled(p.bn))
    dev = jax.jit(lambda l, n, pp: air.evaluate_transition(BASE, l, n, pp))(
        lde, nxt, periodic)
    ref = F.pack_u64(np.asarray(dev))
    got = NAT.eval_air(kind, F.pack_u64(np.asarray(lde)),
                       F.pack_u64(np.asarray(nxt)),
                       F.pack_u64(np.asarray(periodic)), len(p.degrees))
    assert np.array_equal(got, ref)


def test_native_prover_proof_identical():
    ex, air = _case("schnorr")
    p_native = PR.Prover(air)
    proof_n = p_native.prove(ex.trace)
    os.environ["CSTARK_NATIVE_EVAL"] = "0"
    try:
        proof_d = PR.Prover(air).prove(ex.trace)
    finally:
        del os.environ["CSTARK_NATIVE_EVAL"]
    assert proof_n.to_bytes() == proof_d.to_bytes()
    assert ex.verify(proof_n)
