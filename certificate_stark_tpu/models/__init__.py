"""AIR programs and their example drivers.

`get_example` mirrors the reference's per-module example dispatch
(src/lib.rs `get_example` and the analogous constructors in
src/{schnorr,merkle,range}/mod.rs): name -> ready-to-prove Example with the
module's default proof options unless overridden.
"""
from __future__ import annotations


def get_example(name: str, size: int = 2, options=None, **kwargs):
    """Build an example by name: 'rescue-chain', 'range', 'merkle-init',
    'merkle-update', 'schnorr', or 'transaction' (the composed
    state-transition AIR). `size` = chain length / value / #txs / #sigs."""
    from ..engine.options import ProofOptions
    # reference get_example defaults: (42, 8, 0, Blake3, None, 4, 256)
    # (src/lib.rs:78-86); ProofOptions itself defaults to the algebraic
    # rescue hasher (DESIGN.md "Algebraic commitments by default")
    opts = options or ProofOptions(hash_fn="blake3")
    if name == "rescue-chain":
        from . import rescue_chain as M
        return M.RescueChainExample(size, opts)
    if name == "range":
        from . import range as M
        return M.RangeExample(size, opts)
    if name == "merkle-init":
        from . import merkle_init as M
        # single-tx leaf-hash program: no size parameter (reference
        # src/merkle/init/mod.rs get_example)
        return M.MerkleInitExample(opts, **kwargs)
    if name == "merkle-update":
        from . import merkle_update as M
        return M.MerkleUpdateExample(size, opts, **kwargs)
    if name == "schnorr":
        from . import schnorr as M
        return M.SchnorrExample(size, opts)
    if name == "transaction":
        from . import transaction as M
        return M.TransactionExample(size, opts, **kwargs)
    raise ValueError(f"unknown example '{name}'")
