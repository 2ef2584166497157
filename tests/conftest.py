"""Test configuration: run everything on a simulated 8-device CPU mesh so that
single-chip and multi-chip (sharded) code paths are both exercised without TPU
hardware. Must run before jax is imported anywhere."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# serialize CPU codegen + skip expensive LLVM passes: parallel/optimizing
# LLVM codegen segfaults sporadically on the large constraint-evaluation
# graphs in this environment (and compiles much slower)
if "parallel_codegen" not in flags:
    flags += " --xla_cpu_parallel_codegen_split_count=1"
if "llvm_disable_expensive_passes" not in flags:
    flags += " --xla_llvm_disable_expensive_passes=true"
if "concurrency_optimized" not in flags:
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=true"
os.environ["XLA_FLAGS"] = flags

# Fast tests run the subfield (b=57, 125-bit q) curve instance; the
# reference-strength fp2 instance (the library default) is covered by
# tests/test_curve_params.py and the fp2-marked e2e tests, which call
# curve.set_curve("fp2") explicitly.
os.environ.setdefault("CSTARK_CURVE", "subfield")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache is intentionally NOT enabled — the
# XLA:CPU AOT loader in this environment rejects/degrades cached executables
# (machine-feature mismatch), making it slower than cold compiles.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
