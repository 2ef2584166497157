"""Packed-LDE memory layout (Prover._pick_pack_lde / field.pack2): the proof
produced with the packed 2x32-bit resident LDE + per-chunk unpacked consumers
must be byte-identical to the plain 4x16-bit-limb pipeline."""
import os

import numpy as np
import jax.numpy as jnp

from certificate_stark_tpu.ops import field as F


def test_pack2_roundtrip():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, F.P, size=(5, 33), dtype=np.uint64)
    limbs = jnp.asarray(F.from_int(vals.astype(object)))
    back = F.unpack2(F.pack2(limbs))
    assert np.array_equal(np.asarray(back), np.asarray(limbs))


def test_packed_proof_bit_identical():
    from certificate_stark_tpu.engine.options import ProofOptions
    from certificate_stark_tpu.engine import prover as PR
    from certificate_stark_tpu.models import rescue_chain as RC

    opts = ProofOptions(num_queries=8, blowup=4, hash_fn="blake3")
    ex = RC.RescueChainExample(64, opts)
    air = RC.RescueChainAir(64 * 8, ex.pub_inputs(), opts)

    env = {"CSTARK_EVAL_CHUNK": "512", "CSTARK_NATIVE_EVAL": "0",
           "CSTARK_NATIVE_NTT": "0", "CSTARK_NATIVE_COMMIT": "0",
           "CSTARK_LDE_COLS": "7"}
    saved = {k: os.environ.get(k) for k in list(env) + ["CSTARK_PACK_LDE"]}
    os.environ.update(env)
    try:
        os.environ["CSTARK_PACK_LDE"] = "1"
        p_packed = PR.Prover(air)
        assert p_packed._pack_lde, "packed gate should be on under the env"
        proof_p = p_packed.prove(ex.trace)

        os.environ["CSTARK_PACK_LDE"] = "0"
        p_plain = PR.Prover(air)
        assert not p_plain._pack_lde
        proof = p_plain.prove(ex.trace)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    assert proof_p.to_bytes() == proof.to_bytes()
    assert ex.verify(proof_p)
