"""AOT serving artifacts via jax.export (portable StableHLO serialization).

The reference's only deployment artifact is the raw torch checkpoint — every
serving process rebuilds the Python model and loads the .pth at startup
(ref: inference.py:24-52, eval.py:21-38). On TPU the analogous production
cost is trace + compile time: the serving graph takes tens of seconds cold.
`jax.export` freezes the already-traced serving computation into a portable
StableHLO blob ONCE; replicas deserialize and execute it without the model
code, the config, or a Python retrace — and the blob is multi-platform
(the platforms recorded at export time, default ('tpu', 'cpu')).

Artifact format: one .npz holding a serialized Exported per wire signature
(float and uint8 cameras — the two jit variants `InferenceServer` warms,
serving.py:175-183) plus a JSON metadata entry (batch size, shapes, model
dtype, git commit) for provenance and load-time validation.

Weights stay ARGUMENTS of the exported computation (the serving graph takes
`variables` explicitly), so an artifact pairs with any checkpoint of the
same config — export once per config, hot-swap weights per deploy.

Persistent-compile-cache interplay (measured round 5, `bench_kernels.py
aotwarm`): the jit of the deserialized `Exported.call` DOES key the
persistent cache like any jit (entries are written and hit). But on the
tunneled single-tenant TPU of this environment a HIT is 2.5-4x SLOWER
than a cold miss (two paired runs: miss 54/252 s vs hit 642/1092 s; the
entry itself is only 6.8 MB): the miss compiles on the TPU server host,
while the hit's executable-deserialize path runs on the weak local core.
Replicas on such a link should start with `BMOD_JAX_CACHE=off`; on a
directly-attached TPU host the hit is a local deserialize and is the
fast path. Absolute warmup also varies ~5x run-to-run with server load
(ARCHITECTURE.md "AOT deployment").
"""

from __future__ import annotations

import json
import subprocess
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def _git_commit() -> Optional[str]:
    try:
        return subprocess.run(
            ["git", "-C", str(Path(__file__).parents[2]), "rev-parse",
             "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        return None


def export_serving_artifact(
    server, path, platforms: Tuple[str, ...] = ("tpu", "cpu")
) -> Dict:
    """Export an `InferenceServer`'s serving graph (forward + decode, both
    wire signatures) to `path` as a portable .npz artifact.

    The server must be constructed (its jitted `_serve` exists before
    `start()`); no warmup/compile is needed — export lowers the trace
    without executing it. Returns the metadata dict also stored in the
    artifact.
    """
    import jax.numpy as jnp
    from jax import export as jexport

    if getattr(server, "mesh", None) is not None:
        raise ValueError(
            "AOT export requires an unpartitioned server (mesh=None): "
            "export single-chip; --data-parallel applies to live serving "
            "only"
        )
    cams, lidar, radars = server._zero_inputs(server.batch_size)
    spec = server.spec
    # BOTH wire signatures are exported even for camera-off configs: the
    # server warms (and clients may send) uint8 camera buffers regardless,
    # and exported computations validate input dtypes strictly
    variants = {
        "f32": cams,
        "u8": jnp.zeros(cams.shape, jnp.uint8),
    }
    blobs = {}
    for name, c in variants.items():
        exp = jexport.export(server._serve, platforms=platforms)(
            server.variables, c, lidar, radars
        )
        blobs[name] = np.frombuffer(exp.serialize(), dtype=np.uint8)

    h, w = spec.camera.image_size
    meta = {
        "format": "bmod-aot-v1",
        "batch_size": int(server.batch_size),
        "image_size": [int(h), int(w)],
        "max_points": int(spec.lidar.max_points),
        "modalities": {
            "camera": bool(spec.use_camera),
            "lidar": bool(spec.use_lidar),
            "radar": bool(spec.use_radar),
        },
        "model_dtype": str(server.model.dtype.__name__),
        "fold_bn": bool(getattr(server, "fold_bn", False)),
        "platforms": list(platforms),
        "signatures": sorted(blobs),
        "git_commit": _git_commit(),
        "exported_at": time.strftime("%Y-%m-%d %H:%M"),
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # save through a file object so np.savez cannot silently append '.npz'
    # and diverge from the path the caller prints / passes to --aot
    with open(path, "wb") as f:
        np.savez(f, meta=np.array(json.dumps(meta)), **blobs)
    return meta


def load_serving_artifact(path) -> Tuple[Dict, Dict]:
    """Load an artifact written by `export_serving_artifact`.

    Returns (calls, meta): `calls` maps signature name ('f32' / 'u8') to an
    executable jitted callable with the serving calling convention
    `(variables, cams, lidar, radars) -> decoded predictions`.
    """
    import jax
    from jax import export as jexport

    with np.load(path) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("format") != "bmod-aot-v1":
            raise ValueError(f"{path}: not a bmod AOT serving artifact")
        calls = {}
        for name in meta["signatures"]:
            exported = jexport.deserialize(z[name].tobytes())
            # jit the call once so repeated batches reuse the executable
            calls[name] = jax.jit(exported.call)
    return calls, meta


def attach_aot_serving(server, path) -> Dict:
    """Swap an `InferenceServer`'s jitted `_serve` for the deserialized
    AOT computation, validating the artifact against the server's
    configuration (shape mismatches must fail at startup, not mid-request).
    Returns the artifact metadata."""
    import jax.numpy as jnp

    calls, meta = load_serving_artifact(path)
    if meta["batch_size"] != server.batch_size:
        raise ValueError(
            f"AOT artifact was exported for batch_size="
            f"{meta['batch_size']}, server uses {server.batch_size}"
        )
    h, w = server.spec.camera.image_size
    if meta["image_size"] != [h, w] or (
        meta["max_points"] != server.spec.lidar.max_points
    ):
        raise ValueError(
            f"AOT artifact shapes {meta['image_size']}/"
            f"{meta['max_points']}pts do not match the server config "
            f"{[h, w]}/{server.spec.lidar.max_points}pts"
        )
    want_mods = {
        "camera": bool(server.spec.use_camera),
        "lidar": bool(server.spec.use_lidar),
        "radar": bool(server.spec.use_radar),
    }
    if meta["modalities"] != want_mods:
        raise ValueError(
            f"AOT artifact modalities {meta['modalities']} do not match "
            f"the server config {want_mods}"
        )
    if meta["model_dtype"] != str(server.model.dtype.__name__):
        raise ValueError(
            f"AOT artifact model dtype {meta['model_dtype']} does not "
            f"match the server's {server.model.dtype.__name__} — export "
            f"and serve with the same --f32 setting"
        )
    if "fold_bn" in meta and meta["fold_bn"] != bool(
        getattr(server, "fold_bn", False)
    ):
        raise ValueError(
            f"AOT artifact was exported with fold_bn={meta['fold_bn']} "
            f"but the server uses fold_bn="
            f"{bool(getattr(server, 'fold_bn', False))} — the variables "
            f"tree baked into the traced signature differs; export and "
            f"serve with the same --no-fold-bn setting"
        )

    def _serve_aot(variables, cams, lidar, radars):
        name = (
            "u8"
            if cams is not None and cams.dtype == jnp.uint8
            else "f32"
        )
        if name not in calls:
            raise ValueError(
                f"AOT artifact has no '{name}' wire signature "
                f"(has {meta['signatures']})"
            )
        return calls[name](variables, cams, lidar, radars)

    server._serve = _serve_aot
    return meta
