"""Phase-level checkpoint/resume (engine/checkpoint.py): resumed proofs are
byte-identical, completed phases are actually skipped, and stale contexts are
never resumed. (The reference has no such subsystem — SURVEY.md §5 requires
it as new TPU-run design territory.)"""
import numpy as np
import jax.numpy as jnp

from certificate_stark_tpu.engine.options import ProofOptions
from certificate_stark_tpu.engine import prover as PR, verifier as VR
from certificate_stark_tpu.models import rescue_chain as RC

OPTS = ProofOptions(num_queries=8, blowup=4, grinding_bits=0)


def test_checkpoint_resume_identical_and_skipping(tmp_path):
    # chain 16 -> LDE domain 512 > max remainder 256: exercises the
    # per-FRI-layer checkpoint branch as well
    ex = RC.RescueChainExample(16, OPTS)
    air = RC.RescueChainAir(128, ex.pub_inputs(), OPTS)
    prover = PR.Prover(air)

    ref = prover.prove(ex.trace).to_bytes()

    ck = prover.checkpointer(str(tmp_path))
    assert prover.prove(ex.trace, checkpoint=ck).to_bytes() == ref
    saved = {p.name for p in tmp_path.iterdir()}
    assert {"trace.npz", "composition.npz", "deep.npz", "fri0.npz",
            "MANIFEST.json"} <= saved

    # resume in a fresh prover, feeding a GARBAGE trace of the right shape:
    # every compute phase must come from the checkpoints, so the proof is
    # still byte-identical (and still verifies)
    prover2 = PR.Prover(RC.RescueChainAir(128, ex.pub_inputs(), OPTS))
    ck2 = prover2.checkpointer(str(tmp_path))
    garbage = jnp.zeros_like(ex.trace)
    proof2 = prover2.prove(garbage, checkpoint=ck2)
    assert proof2.to_bytes() == ref
    assert VR.verify(RC.RescueChainAir, proof2, ex.pub_inputs())


def test_checkpoint_context_mismatch_not_resumed(tmp_path):
    from certificate_stark_tpu.engine.checkpoint import Checkpointer
    a = Checkpointer(str(tmp_path), context=["A", 1])
    a.save("trace", x=np.arange(3))
    b = Checkpointer(str(tmp_path), context=["B", 2])
    assert b.load("trace") is None          # different context -> ignored
    a2 = Checkpointer(str(tmp_path), context=["A", 1])
    assert np.array_equal(a2.load("trace")["x"], np.arange(3))


def test_checkpoint_resume_packed_mode(tmp_path, monkeypatch):
    """Packed-LDE mode (the residency the 2^23-domain proofs force) must
    checkpoint and resume byte-identically: the packed [2, w, bn+b] buffer is
    persisted as-is and every compute phase is skipped on resume."""
    monkeypatch.setenv("CSTARK_EVAL_CHUNK", "512")
    monkeypatch.setenv("CSTARK_NATIVE_EVAL", "0")
    monkeypatch.setenv("CSTARK_NATIVE_NTT", "0")
    monkeypatch.setenv("CSTARK_NATIVE_COMMIT", "0")
    monkeypatch.setenv("CSTARK_LDE_COLS", "7")
    monkeypatch.setenv("CSTARK_PACK_LDE", "1")
    opts = ProofOptions(num_queries=8, blowup=4, hash_fn="blake3")
    ex = RC.RescueChainExample(64, opts)
    air = RC.RescueChainAir(64 * 8, ex.pub_inputs(), opts)
    prover = PR.Prover(air)
    assert prover._pack_lde

    ref = prover.prove(ex.trace).to_bytes()
    ck = prover.checkpointer(str(tmp_path))
    assert prover.prove(ex.trace, checkpoint=ck).to_bytes() == ref

    prover2 = PR.Prover(RC.RescueChainAir(64 * 8, ex.pub_inputs(), opts))
    assert prover2._pack_lde
    ck2 = prover2.checkpointer(str(tmp_path))
    garbage = jnp.zeros_like(ex.trace)
    proof2 = prover2.prove(garbage, checkpoint=ck2)
    assert proof2.to_bytes() == ref
    assert VR.verify(RC.RescueChainAir, proof2, ex.pub_inputs())

    # a layout flip between runs must NOT resume the packed trace artifact
    monkeypatch.setenv("CSTARK_PACK_LDE", "0")
    prover3 = PR.Prover(RC.RescueChainAir(64 * 8, ex.pub_inputs(), opts))
    assert not prover3._pack_lde
    ck3 = prover3.checkpointer(str(tmp_path))
    proof3 = prover3.prove(ex.trace, checkpoint=ck3)
    assert proof3.to_bytes() == ref   # recomputed, still identical
