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


def test_sharded_matches_packed_chunked_single(monkeypatch):
    """Bit-identity at a configuration where the SINGLE-device prover runs
    the round-2 big-domain machinery (packed-LDE residency + chunked eval +
    column-grouped LDE + compact periodic columns) — the modes the TPU
    flagship uses at 2^23 domains, forced on at small shape via env. The
    sharded prover deliberately routes around those single-chip memory modes
    (its domain shards already bound per-chip memory at bn/D; see
    parallel/prover.py) — the proofs must still be byte-equal."""
    opts = ProofOptions(num_queries=8, blowup=4, hash_fn="blake3")
    ex = RC.RescueChainExample(64, opts)
    air = RC.RescueChainAir(64 * 8, ex.pub_inputs(), opts)

    for k in ("CSTARK_NATIVE_EVAL", "CSTARK_NATIVE_NTT",
              "CSTARK_NATIVE_COMMIT"):
        monkeypatch.setenv(k, "0")
    monkeypatch.setenv("CSTARK_EVAL_CHUNK", "512")
    monkeypatch.setenv("CSTARK_LDE_COLS", "7")
    monkeypatch.setenv("CSTARK_PACK_LDE", "1")
    p_packed = PR.Prover(air)
    assert p_packed._pack_lde and p_packed._eval_chunk == 512
    packed = p_packed.prove(ex.trace)

    for k in ("CSTARK_EVAL_CHUNK", "CSTARK_LDE_COLS", "CSTARK_PACK_LDE"):
        monkeypatch.delenv(k)
    mesh = make_mesh(jax.devices()[:8])
    p = SP.ShardedProver(air, mesh)
    assert not p._pack_lde and p._eval_chunk is None
    with mesh:
        sharded = p.prove(ex.trace)

    assert sharded.to_bytes() == packed.to_bytes()
    assert VR.verify(RC.RescueChainAir, sharded, ex.pub_inputs())


@pytest.mark.full
def test_sharded_transaction_matches_packed_chunked_single(monkeypatch):
    """Same invariant on the FLAGSHIP composed AIR (periodic columns with a
    nontrivial compact block, grouped boundary tables, 94 columns)."""
    from certificate_stark_tpu.models import transaction as TX
    opts = ProofOptions(num_queries=8, blowup=8, hash_fn="blake3")
    ex = TX.TransactionExample(2, opts, depth=3, seed=21)
    air = TX.TransactionAir(ex.trace.shape[-1], ex.pub_inputs(), opts,
                            depth=3)

    for k in ("CSTARK_NATIVE_EVAL", "CSTARK_NATIVE_NTT",
              "CSTARK_NATIVE_COMMIT"):
        monkeypatch.setenv(k, "0")
    # chunk must be a multiple of the compact periodic block
    # (blowup * lcm(cycles) = 8 * 1024); bn = 2 tx * 1024 * 8 = 16384
    monkeypatch.setenv("CSTARK_EVAL_CHUNK", "8192")
    monkeypatch.setenv("CSTARK_LDE_COLS", "16")
    monkeypatch.setenv("CSTARK_PACK_LDE", "1")
    p_packed = PR.Prover(air)
    assert p_packed._pack_lde
    packed = p_packed.prove(ex.trace)

    for k in ("CSTARK_EVAL_CHUNK", "CSTARK_LDE_COLS", "CSTARK_PACK_LDE"):
        monkeypatch.delenv(k)
    air2 = TX.TransactionAir(ex.trace.shape[-1], ex.pub_inputs(), opts,
                             depth=3)
    mesh = make_mesh(jax.devices()[:8])
    p = SP.ShardedProver(air2, mesh)
    with mesh:
        sharded = p.prove(ex.trace)

    assert sharded.to_bytes() == packed.to_bytes()
