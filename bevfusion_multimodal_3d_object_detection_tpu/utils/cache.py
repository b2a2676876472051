"""Persistent XLA compilation cache setup.

First compiles are slow (tens of seconds on TPU, minutes on the 1-core CPU
test environment); the persistent cache makes every subsequent process reuse
them. Called by the CLIs, tests, and bench.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    # BMOD_PLATFORM pins the JAX platform in-process (the environment's
    # sitecustomize overrides the JAX_PLATFORMS env var, and a dead TPU
    # tunnel makes backend init hang — `BMOD_PLATFORM=cpu python train_detect
    # ...` is the escape hatch).
    platform = os.environ.get("BMOD_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass

    env_dir = os.environ.get("BMOD_JAX_CACHE")
    if cache_dir is None and env_dir is not None and (
        env_dir.strip().lower() in ("", "0", "off", "none")
    ):
        # BMOD_JAX_CACHE=off disables the persistent cache. Measured use
        # case (`bench_kernels.py aotwarm`, round 5): on the tunneled
        # single-tenant TPU a persistent-cache HIT on the big AOT serving
        # graph is 2.5-4x SLOWER than a cold miss — the miss compiles
        # server-side, while the hit's executable-deserialize path runs on
        # the 1-core local host. Replicas starting from an AOT artifact on
        # this link should disable the cache; on a directly-attached TPU
        # host the hit path is a local deserialize and helps.
        return
    d = Path(cache_dir or env_dir or _DEFAULT_DIR)
    d.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(d))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions; cache is an optimization only
