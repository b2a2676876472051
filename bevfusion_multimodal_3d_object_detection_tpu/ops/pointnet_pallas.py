"""Fused PointNet Pallas kernel: the whole shared-MLP chain + global max-pool
in ONE pass over the point buffer.

The reference PointNet (ref: encoders.py:252-298) is five 1x1 Conv1d + BN +
ReLU layers followed by a global max. Executed naively, every layer
materializes a (B, N, C) intermediate in HBM — ~278 MB of traffic per 35k-pt
sample. This kernel streams point blocks through VMEM instead: each block is
pushed through all five matmuls (MXU) back-to-back and folded into a running
max that lives in VMEM, so HBM sees only the input points once and a single
(feat_dim,) vector at the end.

Inference-path kernel: BatchNorm (inference = affine per channel) is FOLDED
into the matmul weights/biases beforehand (`fold_bn_into_dense`). Training
uses the XLA path in `models/encoders.py` (batch statistics need a global
reduction, which XLA already handles well).

Masking: `mask_padding=True` excludes zero-padded points from the max
(corrected quirk Q13); False reproduces the reference's unmasked max
(encoders.py:298).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def fold_bn_into_dense(
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference-mode BatchNorm into the preceding Dense:
    y = scale * (xW + b - mean) / sqrt(var + eps) + bn_bias."""
    inv = bn_scale / jnp.sqrt(bn_var + eps)
    return kernel * inv[None, :], (bias - bn_mean) * inv + bn_bias


def extract_folded_pointnet_weights(
    params: dict, batch_stats: dict, num_layers: int
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Pull (kernel, bias) pairs with BN folded out of a `_PointMLP`
    params/batch_stats subtree (models/encoders.py)."""
    out = []
    for i in range(1, num_layers + 1):
        k = jnp.asarray(params[f"mlp{i}"]["kernel"])
        b = jnp.asarray(params[f"mlp{i}"]["bias"])
        if f"bn{i}" in (batch_stats or {}):
            bn_p = params[f"bn{i}"]
            bn_s = batch_stats[f"bn{i}"]
            k, b = fold_bn_into_dense(
                k, b, jnp.asarray(bn_p["scale"]), jnp.asarray(bn_p["bias"]),
                jnp.asarray(bn_s["mean"]), jnp.asarray(bn_s["var"]),
            )
        out.append((k, b))
    return out


def _kernel(x_ref, *refs, block_points: int, widths: Sequence[int],
            mask_padding: bool, out_dtype):
    # refs: w1, b1, w2, b2, ..., out_ref
    # out_ref maps the FULL (B, feat) array (TPU block-shape rules require
    # the trailing dims of a block to be 8/128-aligned or whole); each grid
    # step updates only its batch row via a dynamic slice.
    out_ref = refs[-1]
    wb = refs[:-1]
    i = pl.program_id(0)
    j = pl.program_id(1)

    compute_dtype = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[0].astype(compute_dtype)  # (P, C_in)
    if mask_padding:
        valid = jnp.any(x != 0.0, axis=-1, keepdims=True)  # (P, 1)

    for layer in range(len(widths)):
        w = wb[2 * layer][...].astype(compute_dtype)
        b = wb[2 * layer + 1][...].astype(jnp.float32)
        x = jnp.maximum(
            jnp.dot(x, w, preferred_element_type=jnp.float32) + b[None, :],
            0.0,
        ).astype(compute_dtype)

    if mask_padding:
        x = jnp.where(valid, x, _NEG)
    block_max = jnp.max(x, axis=0, keepdims=True)  # (1, feat)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[...] = jnp.full_like(out_ref, _NEG)

    # single-row dynamic stores are tile-unaligned for bf16; update the whole
    # small (B, feat) buffer with a row-masked max instead (aligned, cheap).
    # Full-2D iota/broadcast: Mosaic can't relayout an (B, 1) bool mask.
    full_shape = (out_ref.shape[0], out_ref.shape[1])
    row_ids = jax.lax.broadcasted_iota(jnp.int32, full_shape, 0)
    bm = jnp.broadcast_to(block_max.astype(out_dtype), full_shape)
    update = jnp.where(row_ids == i, bm, jnp.asarray(_NEG, out_dtype))
    out_ref[...] = jnp.maximum(out_ref[...], update)


@functools.partial(
    jax.jit, static_argnames=("mask_padding", "block_points", "interpret")
)
def fused_pointnet(
    points: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    mask_padding: bool = False,
    block_points: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N, C_in) points -> (B, feat_dim) global features.

    `weights[i]`: (C_i, C_{i+1}) with inference BN already folded;
    `biases[i]`: (C_{i+1},). N must be a multiple of `block_points` (pad with
    zeros — with mask_padding=False, zero rows simply behave like the
    reference's zero padding; with True they're excluded anyway).
    """
    b, n, c_in = points.shape
    if n % block_points != 0:
        pad = block_points - n % block_points
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
        n = points.shape[1]
    widths = [w.shape[1] for w in weights]
    feat = widths[-1]
    # f32 accumulator: Mosaic cannot relayout the (B, feat) i1 row mask under
    # bf16's 16-sublane tiling; cast to the input dtype after the kernel
    out_dtype = jnp.float32
    nblocks = n // block_points

    wb_specs = []
    wb_args = []
    for w, bias in zip(weights, biases):
        wb_specs.append(
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        wb_specs.append(
            pl.BlockSpec(bias.shape, lambda i, j: (0,),
                         memory_space=pltpu.VMEM)
        )
        wb_args.extend([w, bias])

    kern = functools.partial(
        _kernel,
        block_points=block_points,
        widths=widths,
        mask_padding=mask_padding,
        out_dtype=out_dtype,
    )

    out = pl.pallas_call(
        kern,
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec(
                (1, block_points, c_in),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            *wb_specs,
        ],
        out_specs=pl.BlockSpec(
            (b, feat), lambda i, j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, feat), out_dtype),
        interpret=interpret,
    )(points, *wb_args)

    # rows where everything was masked degrade to 0
    return jnp.where(out <= _NEG, 0.0, out).astype(points.dtype)


def pointnet_encode_folded(
    points: jnp.ndarray,
    params: dict,
    batch_stats: dict,
    num_layers: int = 5,
    mask_padding: bool = False,
    block_points: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Convenience: run the fused kernel from a `_PointMLP` variables subtree
    (inference only — BN running averages are folded in)."""
    wb = extract_folded_pointnet_weights(params, batch_stats, num_layers)
    weights = [w for w, _ in wb]
    biases = [b for _, b in wb]
    return fused_pointnet(
        points, weights, biases, mask_padding=mask_padding,
        block_points=block_points, interpret=interpret,
    )
