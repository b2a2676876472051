"""Pallas BEVPool v2: sorted-chunk camera-to-BEV pooling with a VMEM
accumulator (the kernel-level alternative to ops/bev_splat.bev_scatter_add's
XLA scatter-add; north star "camera-to-BEV splat/pooling as a segmented
scatter-add").

Design (BEVPoolv2-style, arxiv 2211.17111: move ALL index math to
calibration time):

1. `precompute_bev_chunks` (host, once per calibration): sort frustum points
   by BEV cell id and cut the sorted stream into fixed-size chunks of <= T
   points that each live inside ONE W-cell window (window w = cell block
   w*W..(w+1)*W). Every window gets at least one (possibly empty) chunk, in
   window order. Output is static-shaped: gather indices (n_chunks, T) into
   the unsorted lifted features (pad entries point at a zero row),
   window-local cell ids (n_chunks, T), and a window-block index per chunk
   (n_chunks,).

2. `bev_pool_sorted` (device): one Pallas pass over chunks. The OUTPUT block
   for grid step i is selected by the scalar-prefetched plan
   (`block_idx[i]` -> rows [bW, (b+1)W) of the (num_cells_pad, C) result),
   so the accumulator block stays resident in VMEM across the consecutive
   steps that visit it and is written back to HBM exactly once per window —
   no dynamic VMEM slicing inside the kernel (TPU-mosaic requirement). Each
   step reduces its (T, C) feature chunk to the (W, C) window with ONE
   one-hot matmul on the MXU:

       local[w, c] = sum_t [local_id[t] == w] * feat[t, c]

Why a matmul: TPU has no fast random-access scatter; a (T, W) comparison
matrix contracted on the MXU turns the W-window scatter into dense compute
(2*T*W*C flops ~ 33 MFLOP per chunk at T=W=C=256 — microseconds on a v5e),
while the windowing keeps the inflation factor at W instead of num_cells.

Equality vs the XLA path is tested in tests/test_bev_pool_pallas.py;
bench_kernels.py measures both on real hardware.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Output-block height of the chunked Pallas splat kernels AND the window
# size of the chunk plans that index them: the plan's block_idx values are
# ONLY valid for a kernel compiled with the SAME window, so every default
# below (and any caller that pads num_cells itself, e.g.
# models/fusion.py:GeometricCameraBEV) must use this constant.
DEFAULT_WINDOW = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def precompute_bev_chunks(
    cell_ids: np.ndarray,
    num_cells: int,
    chunk_points: int = 256,
    window: int = DEFAULT_WINDOW,
) -> Dict[str, np.ndarray]:
    """Host-side chunking of one camera-row's frustum cell ids.

    Args:
      cell_ids: (P,) int32 flat BEV cell per frustum point, -1 = out of range
        (from ops/bev_splat.precompute_frustum_cells, flattened).
      num_cells: bev_h * bev_w.
      chunk_points: T, max points per chunk (multiple of 128).
      window: W, output block height (multiple of 8).

    Returns dict with STATIC shapes (derived from P/num_cells only):
      point_idx: (n_chunks, T) int32 gather index into the UNSORTED (P, C)
        features; P (== one-past-end) marks padding and must gather a zero
        row.
      local_ids: (n_chunks, T) int32 in [0, W) (or -1 for padding).
      block_idx: (n_chunks,) int32 window-block index of each chunk,
        NON-DECREASING, covering every block in [0, num_cells_pad / W).
      num_cells_pad: () int — num_cells rounded up to a multiple of `window`.
    """
    p = len(cell_ids)
    t, w = chunk_points, window
    num_cells_pad = _round_up(max(num_cells, w), w)
    num_blocks = num_cells_pad // w
    # worst case: one chunk per window + one extra cut per T points
    n_chunks = num_blocks + (p + t - 1) // t

    valid = cell_ids >= 0
    order = np.argsort(cell_ids[valid], kind="stable")
    pts = np.flatnonzero(valid)[order].astype(np.int32)
    ids = cell_ids[pts]

    point_idx = np.full((n_chunks, t), p, np.int32)
    local_ids = np.full((n_chunks, t), -1, np.int32)
    block_idx = np.zeros((n_chunks,), np.int32)

    # per-window point ranges in the sorted stream
    starts = np.searchsorted(ids, np.arange(num_blocks) * w, side="left")
    ends = np.searchsorted(ids, (np.arange(num_blocks) + 1) * w, side="left")

    ci = 0
    for b in range(num_blocks):
        i, end = int(starts[b]), int(ends[b])
        while True:  # at least one (possibly empty) chunk per window
            j = min(i + t, end)
            count = j - i
            assert ci < n_chunks
            point_idx[ci, :count] = pts[i:j]
            local_ids[ci, :count] = ids[i:j] - b * w
            block_idx[ci] = b
            ci += 1
            i = j
            if i >= end:
                break
    # pad the tail with empty revisits of the LAST block (keeps block_idx
    # non-decreasing; empty chunks contribute zero)
    block_idx[ci:] = num_blocks - 1
    return {
        "point_idx": point_idx,
        "local_ids": local_ids,
        "block_idx": block_idx,
        "num_cells_pad": num_cells_pad,
    }


def _make_weighted_kernel(window: int):
    """Weighted variant: each chunk point carries a scalar weight (its depth
    probability) — the lift-splat contraction fused into the pooling pass
    (ROADMAP #2: weighted one-hot instead of 0/1, same chunk-plan machinery).
    """

    def kernel(blocks_ref, lids_ref, w_ref, feats_ref, out_ref):
        step = pl.program_id(0)
        prev = blocks_ref[jnp.maximum(step - 1, 0)]

        @pl.when(jnp.logical_or(step == 0, prev != blocks_ref[step]))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        t = lids_ref.shape[1]
        lids = lids_ref[pl.ds(step, 1), :].reshape(t, 1)
        w = w_ref[pl.ds(step, 1), :].reshape(t, 1)
        feats = feats_ref[0]
        mask = lids == jax.lax.broadcasted_iota(jnp.int32, (t, window), 1)
        onehot = jnp.where(mask, w, jnp.zeros_like(w)).astype(feats.dtype)
        local = jax.lax.dot_general(
            onehot,
            feats,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[...] += local.astype(out_ref.dtype)

    return kernel


@partial(
    jax.jit,
    static_argnames=("num_cells", "num_cells_pad", "window", "interpret"),
)
def bev_pool_weighted(
    features: jnp.ndarray,
    weights: jnp.ndarray,
    point_idx: jnp.ndarray,
    local_ids: jnp.ndarray,
    block_idx: jnp.ndarray,
    num_cells: int,
    num_cells_pad: int,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weighted BEV pool — the fused lift-splat for one camera row.

    Computes `out[cell, c] = sum_p weights[p] * features[pixel(p), c]` over
    frustum points p whose precomputed cell id maps into [0, num_cells) —
    the full lift-splat (ops/bev_splat.lift_splat) in ONE Pallas pass with
    no lifted tensor and no (HW, cells) weight matrix in HBM.

    Args:
      features: (HW, C) per-PIXEL image features (NOT per frustum point).
      weights:  (P,) per-frustum-point scalar depth probs, laid out to match
        the `cell_ids` flattening the chunk plan was built from (P = D * HW,
        point p = d * HW + pixel).
      point_idx/local_ids/block_idx: plan from `precompute_bev_chunks`.
    """
    hw, c = features.shape
    p = weights.shape[0]
    n_chunks, t = point_idx.shape
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((1, c), features.dtype)], axis=0
    )
    w_pad = jnp.concatenate([weights, jnp.zeros((1,), weights.dtype)])
    # point -> pixel: p = d * HW + pixel; the pad index P gathers zeros
    pix = jnp.where(point_idx >= p, hw, point_idx % hw)
    gathered = feats_pad[pix]  # (n_chunks, T, C)
    w_gath = w_pad[jnp.minimum(point_idx, p)].astype(jnp.float32)

    out = pl.pallas_call(
        _make_weighted_kernel(window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # block_idx
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (n_chunks, t), lambda i, b_ref: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n_chunks, t), lambda i, b_ref: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, t, c), lambda i, b_ref: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (window, c), lambda i, b_ref: (b_ref[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((num_cells_pad, c), jnp.float32),
        interpret=interpret,
    )(block_idx, local_ids, w_gath, gathered)
    return out[:num_cells]


def bev_pool_weighted_rows(
    features: jnp.ndarray,
    weights: jnp.ndarray,
    point_idx: jnp.ndarray,
    local_ids: jnp.ndarray,
    block_idx: jnp.ndarray,
    num_cells: int,
    num_cells_pad: int,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched rows: features (X, HW, C), weights (X, P), plans
    (X, n_chunks, ...) -> (X, num_cells, C)."""
    fn = partial(
        bev_pool_weighted,
        num_cells=num_cells,
        num_cells_pad=num_cells_pad,
        window=window,
        interpret=interpret,
    )
    return jax.vmap(fn)(features, weights, point_idx, local_ids, block_idx)


def _make_kernel(window: int):
    def kernel(blocks_ref, lids_ref, feats_ref, out_ref):
        # (T, W) one-hot of window-local ids contracted on the MXU; padding
        # ids (-1) match no window column and contribute zero
        step = pl.program_id(0)
        prev = blocks_ref[jnp.maximum(step - 1, 0)]

        @pl.when(jnp.logical_or(step == 0, prev != blocks_ref[step]))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        t = lids_ref.shape[1]
        # lids stays whole-array in VMEM (a (1, T) block would violate the
        # TPU (8, 128) tile rule); slice this chunk's row statically-sized
        lids = lids_ref[pl.ds(step, 1), :].reshape(t, 1)
        feats = feats_ref[0]
        onehot = (
            lids == jax.lax.broadcasted_iota(jnp.int32, (t, window), 1)
        ).astype(feats.dtype)
        local = jax.lax.dot_general(
            onehot,
            feats,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[...] += local.astype(out_ref.dtype)

    return kernel


@partial(
    jax.jit,
    static_argnames=("num_cells", "num_cells_pad", "window", "interpret"),
)
def bev_pool_sorted(
    features: jnp.ndarray,
    point_idx: jnp.ndarray,
    local_ids: jnp.ndarray,
    block_idx: jnp.ndarray,
    num_cells: int,
    num_cells_pad: int,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
) -> jnp.ndarray:
    """One camera-row BEV pool: (P, C) unsorted lifted features + chunk plan
    -> (num_cells, C) pooled BEV, f32 accumulation.

    `features` need NOT be pre-gathered: the chunk gather (by `point_idx`,
    pad row = zeros) happens here, then the Pallas pass accumulates each
    window block in VMEM (block selected per grid step by the prefetched
    `block_idx` — consecutive steps visiting the same block accumulate in
    place; the block is flushed to HBM when the plan moves on).
    """
    p, c = features.shape
    n_chunks, t = point_idx.shape
    # pad with one zero row for the padding gather index P
    feats_pad = jnp.concatenate(
        [features, jnp.zeros((1, c), features.dtype)], axis=0
    )
    gathered = feats_pad[point_idx]  # (n_chunks, T, C)

    out = pl.pallas_call(
        _make_kernel(window),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # block_idx
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (n_chunks, t), lambda i, b_ref: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, t, c), lambda i, b_ref: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (window, c), lambda i, b_ref: (b_ref[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((num_cells_pad, c), jnp.float32),
        interpret=interpret,
    )(block_idx, local_ids, gathered)
    return out[:num_cells]


def bev_pool_rows(
    features: jnp.ndarray,
    point_idx: jnp.ndarray,
    local_ids: jnp.ndarray,
    block_idx: jnp.ndarray,
    num_cells: int,
    num_cells_pad: int,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched rows: features (X, P, C), plans (X, n_chunks, ...)
    -> (X, num_cells, C)."""
    fn = partial(
        bev_pool_sorted,
        num_cells=num_cells,
        num_cells_pad=num_cells_pad,
        window=window,
        interpret=interpret,
    )
    return jax.vmap(fn)(features, point_idx, local_ids, block_idx)
