"""Device-mesh parallelism: data-parallel (and camera-view) sharding over ICI.

The reference has NO distributed implementation — its
`hardware.gpu.distributed` config stub is never read
(ref: configs/base.yaml:617-624; no torch.distributed import exists). Here
data parallelism is a first-class, additive capability built the TPU way:

- a `jax.sharding.Mesh` over ('data', 'view'),
- batch arrays sharded over 'data' with `NamedSharding`,
- parameters replicated; `jax.jit` partitions the step and inserts the
  gradient `psum`s over ICI automatically (no hand-written collectives).

Numerics at mesh size 1 are identical to single-chip execution. The 'view'
axis is reserved for sharding the 6-camera axis of the camera encoder (the
heaviest FLOPs consumer) across chips.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_view: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'view') mesh. Defaults to all available devices on
    the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_view < 1 or n_view > len(devices):
        raise ValueError(
            f"view_parallel={n_view} needs that many devices, but only "
            f"{len(devices)} available"
        )
    if n_data is None:
        n_data = len(devices) // n_view
    if n_data < 1:
        raise ValueError(
            f"mesh ({n_data}, {n_view}) has no devices on the 'data' axis"
        )
    if n_data * n_view > len(devices):
        raise ValueError(
            f"mesh ({n_data}, {n_view}) needs {n_data * n_view} devices, "
            f"but only {len(devices)} available"
        )
    if n_data * n_view < len(devices):
        # never silently idle chips on a config typo
        print(
            f"Warning: mesh ({n_data}, {n_view}) uses "
            f"{n_data * n_view} of {len(devices)} devices; the remaining "
            f"{len(devices) - n_data * n_view} stay idle"
        )
    devs = np.asarray(devices[: n_data * n_view]).reshape(n_data, n_view)
    return Mesh(devs, axis_names=("data", "view"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    """Place a host batch dict onto the mesh: batch axis over 'data'; the
    camera axis of `camera_imgs` / `camera_cells` additionally over 'view'.

    Sharding the camera axis makes XLA run the 6 per-camera ResNet passes on
    different chips and turn the mean-over-cameras (fusion.py reference op)
    into an ICI collective — no model changes needed, jit partitions it.
    Non-array entries (e.g. 'tokens') pass through unchanged.
    """
    view_size = mesh.shape.get("view", 1)
    out = {}
    for k, v in batch.items():
        if not isinstance(v, (np.ndarray, jax.Array)):
            out[k] = v
            continue
        if (
            k in ("camera_imgs", "camera_cells")
            and view_size > 1
            and np.ndim(v) >= 2
            and v.shape[1] % view_size == 0
        ):
            spec = P("data", "view", *([None] * (np.ndim(v) - 2)))
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        else:
            out[k] = jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
    return out
