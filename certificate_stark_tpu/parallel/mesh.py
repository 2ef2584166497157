"""Multi-chip sharding for the prover core.

The reference's only parallelism is rayon data-parallelism inside one process
(SURVEY.md §2c). The TPU design shards over a `jax.sharding.Mesh`:

  * `domain` axis — the LDE/evaluation domain (and trace rows): pure data
    parallelism for constraint evaluation, DEEP, FRI folds, and row hashing;
    XLA/GSPMD inserts the NTT stage exchanges (all-to-alls) and the Merkle
    reduction gathers automatically from the sharding annotations.

Scaling roadmap (multi-host): explicit four-step NTT with `shard_map` +
`all_to_all` over ICI so butterfly exchanges never leave the slice; Merkle
subtree roots reduced with `all_gather`; per-FRI-layer commit local + gather.

`sharded_prove_core(prover, mesh)` returns a jitted function running the
trace->composition pipeline with the trace domain-sharded; used by
`__graft_entry__.dryrun_multichip` and (single-chip degenerate) `entry`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "domain") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, (axis,))


def sharded_prove_core(prover, mesh: Mesh, axis: str = "domain"):
    """Jitted (trace, t_alpha, t_beta, b_alpha, b_beta) -> composition leaves,
    with the trace/LDE domain axis sharded over `mesh`."""
    shard = NamedSharding(mesh, P(None, None, axis))
    rep = NamedSharding(mesh, P())

    def core(trace, t_alpha, t_beta, b_alpha, b_beta):
        coeffs, lde = prover.phase_trace(trace)
        h_coeffs, h_lde = prover.phase_composition(
            lde, t_alpha, t_beta, b_alpha, b_beta,
            jnp.asarray(prover._periodic_tiled(prover.bn)), prover._b_evals)
        # h_lde: [4, d, k, bn] -> flatten the ext axis into columns (prove())
        h_rows = h_lde.transpose(0, 2, 1, 3).reshape(4, -1, h_lde.shape[-1])
        return prover.hasher.hash_columns(h_rows)

    return jax.jit(core, in_shardings=(shard, rep, rep, rep, rep))
