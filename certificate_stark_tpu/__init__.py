"""certificate_stark_tpu — a TPU-native STARK proving framework with the
capabilities of toposware/certificate-stark (see SURVEY.md for the layer map).

Package layout:
  engine/    generic STARK pipeline (prover, verifier, FRI, Merkle, coin)
  ops/       field / hash / curve compute kernels (JAX limb arithmetic)
  models/    AIR programs (range, merkle, schnorr, composed transaction)
  parallel/  multi-chip sharded prover (mesh, distributed NTT)
  utils/     host-side witness generation, reference oracles, native bindings
  params/    extracted constant tables (Rescue ARK/MDS, curve constants)
"""
import os

# Persistent XLA compilation cache: the EC/Rescue-heavy constraint graphs take
# minutes to compile on TPU; caching makes every process after the first pay
# ~nothing. Opt out with CSTARK_COMPILE_CACHE=0 or JAX_COMPILATION_CACHE_DIR.
if os.environ.get("CSTARK_COMPILE_CACHE", "1") != "0" and \
        "JAX_COMPILATION_CACHE_DIR" not in os.environ and \
        os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
    # (skipped when pinned to XLA:CPU: its AOT loader rejects/degrades cached
    # executables in this environment — see tests/conftest.py)
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/cstark_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
