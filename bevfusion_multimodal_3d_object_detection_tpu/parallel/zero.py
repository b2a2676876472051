"""ZeRO-1-style optimizer-state sharding over the mesh's 'data' axis.

The reference has no distributed training at all (its hardware.gpu.distributed
block is never read — ref: configs/base.yaml:617-624), so this is an additive
TPU-native capability: with plain data parallelism every chip holds a full
replica of the AdamW moments (2x the parameter bytes). Sharding the moments
over the 'data' axis cuts that to 1/N per chip, and XLA's SPMD partitioner
turns the gradient all-reduce + moment update + parameter update into the
ZeRO-1 communication pattern (reduce-scatter the grads into the moment
shards, all-gather the parameter updates) automatically — no hand-written
collectives, just sharding annotations:

- `opt_state_shardings(opt_state, mesh)` picks, per moment leaf, the first
  axis whose size divides by the 'data' mesh size and shards it; scalars and
  indivisible leaves stay replicated.
- `place_opt_state(opt_state, mesh)` lays a freshly initialized (host- or
  device-replicated) optimizer state out onto those shardings. Works in
  multi-process meshes too: every process computes the same deterministic
  init, and each host materializes only its own shards
  (`jax.make_array_from_callback`).
- the train step (train/loop.py) pins the updated optimizer state to the same
  shardings with `with_sharding_constraint`, so the layout is stable across
  steps and the donated buffers are reused in place.

Numerics: identical math, partitioned-reduction float reassociation only
(same ~1e-4 relative tolerance as plain DP — see CLAUDE.md).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .distributed import is_multi_process


def _leaf_spec(shape, n_shard: int) -> P:
    """First axis divisible by the shard count gets the 'data' axis."""
    for i, d in enumerate(shape):
        if d >= n_shard and d % n_shard == 0:
            return P(*([None] * i), "data")
    return P()


def opt_state_shardings(opt_state: Any, mesh: Mesh) -> Any:
    """A pytree of NamedShardings matching `opt_state`: moment tensors
    sharded over 'data' where divisible, everything else replicated."""
    n = int(mesh.shape.get("data", 1))

    def one(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        spec = _leaf_spec(shape, n) if n > 1 else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(one, opt_state)


def place_opt_state(opt_state: Any, mesh: Mesh) -> Any:
    """Place a replicated/host optimizer state onto its ZeRO shardings.

    Leaves that are already jax.Arrays on the target sharding pass through
    untouched — the orbax restore path hands us the live ZeRO-sharded
    opt_state (restored onto the template's shardings), and np.asarray on a
    non-fully-addressable array would raise in the multi-process branch.
    """
    shardings = opt_state_shardings(opt_state, mesh)
    multi = is_multi_process(mesh)

    def mk(leaf, sharding):
        if isinstance(leaf, jax.Array) and leaf.sharding == sharding:
            return leaf  # already placed (e.g. orbax restore-to-template)
        if multi:
            if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                # a global array on some *other* layout: let XLA reshard it
                return jax.device_put(leaf, sharding)
            # every process computed the same full init; each host
            # materializes only the shards it owns
            host = np.asarray(leaf)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx]
            )
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(mk, opt_state, shardings)


def constrain_opt_state(opt_state: Any, mesh: Optional[Mesh]) -> Any:
    """Inside-jit: pin the updated optimizer state to its ZeRO shardings so
    the layout is identical step-over-step (stable donation, no resharding)."""
    if mesh is None:
        return opt_state
    shardings = opt_state_shardings(opt_state, mesh)
    return jax.tree_util.tree_map(
        jax.lax.with_sharding_constraint, opt_state, shardings
    )
