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
