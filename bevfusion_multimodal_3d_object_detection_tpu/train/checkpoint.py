"""Checkpoint I/O: fast single-file msgpack (default) or orbax (optional).

The reference checkpoints `{epoch, model_state_dict, optimizer_state_dict,
config}` via torch.save every `save_interval` epochs and on best-mAP
(ref: train_detect.py:768-793) and loads with strict=False (eval.py:211).
Here the same payload (params + batch_stats + opt_state + step/epoch/best)
is serialized with flax msgpack; `backend='orbax'` switches to orbax for
multi-host / sharded use.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import flax.serialization as fser
import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


# one AsyncCheckpointer reused across saves so in-flight writes can be
# awaited (wait_for_checkpoints) before process exit / the next save
_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until all in-flight async checkpoint writes are durable."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def is_committed_checkpoint(p: Path) -> bool:
    """True iff `p` is a durably committed checkpoint artifact.

    Rejects every in-progress/truncated form either backend can leave
    behind: our msgpack '.tmp' staging file and orbax's
    '<name>.orbax-checkpoint-tmp[-...]' staging directory (which would
    otherwise parse to the same epoch as the real checkpoint and shadow
    it). Accepts only a bare directory name (orbax) or a '.msgpack' file.
    """
    if ".orbax-checkpoint-tmp" in p.name:
        return False
    return p.suffix in ("", ".msgpack")


def latest_checkpoint(save_dir: str, prefix: str = "checkpoint_epoch_"):
    """(path, epoch) of the newest epoch checkpoint in `save_dir` (msgpack
    file or orbax directory), or (None, -1). Powers train.resume auto-resume
    after preemption — the fault-tolerance story the reference lacks."""
    d = Path(save_dir)
    if not d.exists():
        return None, -1
    best, best_epoch = None, -1
    for p in d.glob(f"{prefix}*"):
        if not is_committed_checkpoint(p):
            # a crash mid-save leaves a truncated .tmp / orbax
            # *.orbax-checkpoint-tmp next to the last good checkpoint —
            # never resume from it
            continue
        stem = p.stem if p.suffix else p.name
        try:
            epoch = int(stem.replace(prefix, "").split(".")[0])
        except ValueError:
            continue
        if epoch > best_epoch:
            best, best_epoch = p, epoch
    return (str(best), best_epoch) if best else (None, -1)


def save_checkpoint(path: str, payload: Dict[str, Any], backend: str = "msgpack") -> None:
    """`backend`: 'msgpack' (single-file, host-local), 'orbax' (multi-host /
    sharded, blocking), or 'orbax_async' (write proceeds in the background;
    call `wait_for_checkpoints()` to fence — the train loop overlaps the next
    steps with the write)."""
    p = Path(path)
    if backend == "orbax_async":
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # one write in flight at a time
        import orbax.checkpoint as ocp

        ckptr.save(p.absolute(), args=ocp.args.StandardSave(payload), force=True)
        return
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(p.absolute(), payload, force=True)
        return
    p.parent.mkdir(parents=True, exist_ok=True)
    # to_state_dict converts tuples (e.g. optax chain states) into
    # msgpack-serializable nested dicts
    data = fser.msgpack_serialize(
        fser.to_state_dict(_to_numpy_tree(payload))
    )
    tmp = p.with_suffix(p.suffix + ".tmp")
    tmp.write_bytes(data)
    tmp.replace(p)


def _tolerant_merge(
    template: Any, state: Any, path: str = "", keep_on_shape_mismatch: bool = False
) -> Any:
    """strict=False restore semantics (the reference loads with strict=False,
    eval.py:211): keys present in both are restored; keys only in the
    template keep their current values; extra checkpoint keys are ignored.

    A TENSOR SHAPE MISMATCH raises by default — torch's strict=False still
    raises on size mismatch, and silently keeping the random template value
    yields a part-restored model presented as restored. The same applies
    to a container/leaf KIND mismatch (a restructured module): it raises
    unless `keep_on_shape_mismatch=True` opts into warn-and-keep."""

    def kind_mismatch(kind: str):
        if not keep_on_shape_mismatch:
            raise ValueError(
                f"checkpoint structure mismatch at {path or '/'}: "
                f"checkpoint has {type(state).__name__} where the model "
                f"expects {kind} (pass keep_on_shape_mismatch=True to "
                f"keep the current values)"
            )
        print(
            f"Warning: checkpoint structure mismatch at {path or '/'} "
            f"({type(state).__name__} vs {kind}); keeping current values"
        )
        return template

    if isinstance(template, dict):
        if not isinstance(state, dict):
            return kind_mismatch("a dict subtree")
        out = {}
        for k, v in template.items():
            if str(k) in state:
                out[k] = _tolerant_merge(
                    v, state[str(k)], f"{path}/{k}", keep_on_shape_mismatch
                )
            else:
                out[k] = v
        return out
    if isinstance(template, (list, tuple)):
        if not isinstance(state, dict):
            return kind_mismatch("a list subtree")
        merged = [
            _tolerant_merge(
                v, state.get(str(i), None), f"{path}/{i}", keep_on_shape_mismatch
            )
            if str(i) in state
            else v
            for i, v in enumerate(template)
        ]
        return type(template)(merged)
    if state is None:
        return template
    if isinstance(state, dict):  # dict where the model expects an array
        return kind_mismatch("an array leaf")
    arr = np.asarray(state)
    t_arr = np.asarray(template)
    if arr.shape != t_arr.shape:
        if not keep_on_shape_mismatch:
            raise ValueError(
                f"checkpoint shape mismatch at {path}: checkpoint has "
                f"{arr.shape}, model expects {t_arr.shape} (pass "
                f"keep_on_shape_mismatch=True to keep the current value)"
            )
        print(
            f"Warning: checkpoint shape mismatch at {path} "
            f"({arr.shape} vs {t_arr.shape}); keeping current value"
        )
        return template
    return arr.astype(t_arr.dtype)


def load_checkpoint(
    path: str,
    template: Dict[str, Any],
    backend: str = "msgpack",
    keep_on_shape_mismatch: bool = False,
) -> Dict[str, Any]:
    p = Path(path)
    if backend == "orbax" or p.is_dir():
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(p.absolute(), template)
    raw = fser.msgpack_restore(p.read_bytes())
    template_state = fser.to_state_dict(_to_numpy_tree(template))
    merged = _tolerant_merge(
        template_state, raw, keep_on_shape_mismatch=keep_on_shape_mismatch
    )
    restored = fser.from_state_dict(template, merged)
    return jax.tree_util.tree_map(jnp.asarray, restored)
