"""The fully distributed prover must produce BIT-IDENTICAL proofs to the
single-device prover (same Fiat-Shamir transcript, same bytes) on a CPU mesh.

Counterpart of the reference's `concurrent`-feature guarantee: winterfell's
rayon parallel prover yields the same proof as the serial one (SURVEY.md §2c);
here the parallel axis is a jax device mesh instead of a thread pool.
"""
import pytest
import numpy as np
import jax

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine import prover as PR
from certificate_stark_tpu.engine import verifier as VR
from certificate_stark_tpu.models import rescue_chain as RC
from certificate_stark_tpu.parallel import prover as SP
from certificate_stark_tpu.parallel.mesh import make_mesh


def test_sharded_proof_bit_identical():
    opts = ProofOptions(num_queries=8, blowup=4, grinding_bits=0,
                        hash_fn="blake3", extension_degree=1,
                        fri_folding=4, fri_max_remainder=256)
    ex = RC.RescueChainExample(16, opts)
    air = RC.RescueChainAir(16 * 8, ex.pub_inputs(), opts)

    single = PR.Prover(air).prove(ex.trace)

    mesh = make_mesh(jax.devices()[:8])
    p = SP.ShardedProver(air, mesh)
    with mesh:
        sharded = p.prove(ex.trace)

    assert sharded.to_bytes() == single.to_bytes()
    assert VR.verify(RC.RescueChainAir, sharded, ex.pub_inputs())


def test_sharded_quadratic_extension():
    opts = ProofOptions(num_queries=4, blowup=4, grinding_bits=0,
                        hash_fn="blake3", extension_degree=2,
                        fri_folding=4, fri_max_remainder=256)
    ex = RC.RescueChainExample(16, opts)
    air = RC.RescueChainAir(16 * 8, ex.pub_inputs(), opts)
    single = PR.Prover(air).prove(ex.trace)
    mesh = make_mesh(jax.devices()[:4])
    with mesh:
        sharded = SP.ShardedProver(air, mesh).prove(ex.trace)
    assert sharded.to_bytes() == single.to_bytes()


@pytest.mark.full
def test_sharded_transaction_bit_identical():
    """The FLAGSHIP composed AIR through the distributed pipeline: 94 columns,
    periodic-column LDE args, grouped boundary tables — proof bytes must equal
    the single-device prover's (depth 3, 2 txs, 8-device CPU mesh)."""
    from certificate_stark_tpu.models import transaction as TX
    opts = ProofOptions(num_queries=8, blowup=8, grinding_bits=0,
                        hash_fn="blake3", extension_degree=1,
                        fri_folding=4, fri_max_remainder=256)
    ex = TX.TransactionExample(2, opts, depth=3, seed=13)
    air = TX.TransactionAir(ex.trace.shape[-1], ex.pub_inputs(), opts, depth=3)

    single = PR.Prover(air).prove(ex.trace)

    mesh = make_mesh(jax.devices()[:8])
    air2 = TX.TransactionAir(ex.trace.shape[-1], ex.pub_inputs(), opts,
                             depth=3)
    p = SP.ShardedProver(air2, mesh)
    with mesh:
        sharded = p.prove(ex.trace)

    assert sharded.to_bytes() == single.to_bytes()
    assert VR.verify(TX.TransactionAir, sharded, ex.pub_inputs(),
                     air_kwargs={"depth": 3})
