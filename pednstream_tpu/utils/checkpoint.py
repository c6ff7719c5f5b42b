"""Mid-run engine state snapshot / restore.

The reference can only persist *finished* time series (its OutputHandler)
and resume MCP stepping within one process (mcp_server.py:249-261) — it
has no engine snapshot.  Here the whole NetworkState pytree serializes to
one .npz, so long simulations and training runs restart exactly where
they stopped (the PRNG key is part of the state, so stochastic
trajectories continue identically).
"""

from typing import Optional

import numpy as np

import jax

from ..state import NetworkState


def save_engine_state(state: NetworkState, path: str) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, num_leaves=len(leaves), **arrays)


def load_engine_state(path: str, like: NetworkState) -> NetworkState:
    """Restore a snapshot; ``like`` supplies the pytree structure (use
    ``scenario.init_state()``)."""
    data = np.load(path)
    n = int(data["num_leaves"])
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    if n != len(leaves_like):
        raise ValueError(
            f"snapshot has {n} leaves, expected {len(leaves_like)} — "
            "was it saved from a different scenario?"
        )
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(ref.shape):
            raise ValueError(
                f"leaf {i} shape {arr.shape} != expected {tuple(ref.shape)}"
            )
        leaves.append(arr.astype(ref.dtype) if hasattr(ref, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
