"""Camera-to-BEV splat: segmented scatter-add of per-pixel features into BEV
cells (BEVPool-style), plus the frustum geometry to drive it.

The reference's live camera-to-BEV op is mean-over-cameras + bilinear resize
(ref: fusion.py:233-247) — no geometry at all. This module provides the
GEOMETRIC upgrade path (north star: "camera-to-BEV splat/pooling as a
segmented scatter-add"): a lift-splat pipeline where each image feature pixel
is lifted along D discrete depths and accumulated into the BEV grid.

TPU design notes:
- the splat is a `scatter-add` over flattened cell ids — XLA lowers this to an
  efficient sorted segment-sum on TPU; shapes are fully static (out-of-range
  points are routed to a trash cell and dropped);
- the frustum->BEV cell mapping depends only on calibration, NOT on image
  content: `precompute_frustum_cells` runs once per calibration and its output
  is a constant under jit (the BEVPoolv2 trick: arxiv 2211.17111 — precompute
  indices, runtime is gather+segment-add only);
- depth weights (a small softmax head) multiply features before the splat, so
  the whole lift-splat is one einsum + one scatter-add.

`GeometricCameraBEV` (models side) consumes this; the pseudo-BEV parity mode
stays the default (configs/base.yaml `bev_fusion`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .bev_pool_pallas import DEFAULT_WINDOW, _round_up


@partial(jax.jit, static_argnames=("num_cells",))
def bev_scatter_add(
    features: jnp.ndarray, cell_ids: jnp.ndarray, num_cells: int
) -> jnp.ndarray:
    """Segmented scatter-add: (..., P, C) features + (..., P) int cell ids
    -> (..., num_cells, C). Ids outside [0, num_cells) are dropped."""
    feat_shape = features.shape
    c = feat_shape[-1]
    flat_feat = features.reshape(-1, feat_shape[-2], c)
    flat_ids = cell_ids.reshape(-1, feat_shape[-2])
    # negative ids would WRAP under jnp indexing; push them out of bounds so
    # mode="drop" actually drops them
    flat_ids = jnp.where(flat_ids < 0, num_cells, flat_ids)

    def one(f, i):
        out = jnp.zeros((num_cells, c), f.dtype)
        return out.at[i].add(f, mode="drop")

    out = jax.vmap(one)(flat_feat, flat_ids)
    return out.reshape(feat_shape[:-2] + (num_cells, c))


def precompute_frustum_cells(
    intrinsics: np.ndarray,
    sensor2lidar_rot: np.ndarray,
    sensor2lidar_trans: np.ndarray,
    feat_hw: Tuple[int, int],
    image_hw: Tuple[int, int],
    depth_bins: np.ndarray,
    bev_hw: Tuple[int, int],
    pc_range: Tuple[float, ...],
) -> np.ndarray:
    """Map every (depth, v, u) frustum point of one camera to a flat BEV cell
    id (or -1 when out of range). Runs on host once per calibration.

    Args:
      intrinsics: (3, 3) camera matrix (at full image resolution).
      sensor2lidar_rot/trans: (3, 3), (3,) camera->LiDAR frame transform.
      feat_hw: feature map size (H', W'); image_hw: input image size.
      depth_bins: (D,) metric depths.
    Returns (D, H', W') int32 cell ids.
    """
    fh, fw = feat_hw
    ih, iw = image_hw
    d = len(depth_bins)
    # pixel centers of the feature grid, scaled to image coords
    us = (np.arange(fw) + 0.5) * (iw / fw)
    vs = (np.arange(fh) + 0.5) * (ih / fh)
    uu, vv = np.meshgrid(us, vs)  # (H', W')

    k_inv = np.linalg.inv(intrinsics)
    rays = np.stack([uu, vv, np.ones_like(uu)], axis=-1) @ k_inv.T  # (H',W',3)
    # lift along depths: camera-frame points
    pts = rays[None, :, :, :] * depth_bins[:, None, None, None]  # (D,H',W',3)
    # camera -> lidar
    pts = pts @ sensor2lidar_rot.T + sensor2lidar_trans

    x_min, y_min, _, x_max, y_max, _ = pc_range
    bh, bw = bev_hw
    vx = (x_max - x_min) / bw
    vy = (y_max - y_min) / bh
    ix = np.floor((pts[..., 0] - x_min) / vx).astype(np.int32)
    iy = np.floor((pts[..., 1] - y_min) / vy).astype(np.int32)
    valid = (ix >= 0) & (ix < bw) & (iy >= 0) & (iy < bh)
    cells = np.where(valid, iy * bw + ix, -1)
    return cells.astype(np.int32)


@partial(jax.jit, static_argnames=("num_cells",))
def lift_splat(
    features: jnp.ndarray,
    depth_logits: jnp.ndarray,
    cell_ids: jnp.ndarray,
    num_cells: int,
) -> jnp.ndarray:
    """Lift-splat one camera batch.

    features:     (B, H', W', C) image features.
    depth_logits: (B, H', W', D) per-pixel depth distribution logits.
    cell_ids:     (D, H', W') precomputed BEV cells (-1 = out of range).
    Returns (B, num_cells, C) splatted BEV features.
    """
    b, fh, fw, c = features.shape
    d = depth_logits.shape[-1]
    depth_probs = jax.nn.softmax(depth_logits, axis=-1)
    # outer product: weighted feature per depth bin
    lifted = jnp.einsum("bhwc,bhwd->bdhwc", features, depth_probs)
    lifted = lifted.reshape(b, d * fh * fw, c)
    ids = jnp.broadcast_to(cell_ids.reshape(1, -1), (b, d * fh * fw))
    # -1 ids fall outside [0, num_cells) and are dropped by the scatter
    return bev_scatter_add(lifted, ids, num_cells)


@partial(jax.jit, static_argnames=("num_cells",))
def lift_splat_matmul(
    features: jnp.ndarray,
    depth_logits: jnp.ndarray,
    cell_ids: jnp.ndarray,
    num_cells: int,
) -> jnp.ndarray:
    """`lift_splat` with the scatter/matmul order swapped — the fast TPU
    formulation (1.55x end-to-end on the tri-modal geometric config,
    measured in ARCHITECTURE.md).

    The naive order materializes the lifted (B, D*H'*W', C) tensor in HBM
    (~170 MB/sample at production shapes) and scatter-adds C-vector rows.
    But the splat factors: every frustum point of pixel p carries the SAME
    feature row scaled by its depth prob, so

        bev[cell, c] = sum_hw feat[hw, c] * W[hw, cell],
        W[hw, cell]  = sum_d prob[hw, d] * [cells[d, hw] == cell]

    W is built by scattering SCALAR probs (C times less scatter traffic)
    and the heavy contraction becomes one dense (HW, cells)^T x (HW, C)
    matmul on the MXU. Bitwise it differs from `lift_splat` only in float
    summation order.
    """
    b, fh, fw, c = features.shape
    d = depth_logits.shape[-1]
    hw = fh * fw
    depth_probs = jax.nn.softmax(depth_logits, axis=-1)  # (B, H', W', D)
    # broadcast the shared (D, H', W') plan to per-row ids
    ids = jnp.broadcast_to(
        cell_ids.reshape(1, d * hw), (b, d * hw)
    )
    w = _splat_weights(depth_probs, ids, num_cells)
    flat = features.reshape(b, hw, c)
    return jnp.einsum("bhk,bhc->bkc", w, flat)


def _splat_weights(
    depth_probs: jnp.ndarray, cell_ids: jnp.ndarray, num_cells: int
) -> jnp.ndarray:
    """(B, H', W', D) probs + (B, D*H'*W') cells -> (B, HW, num_cells)
    per-pixel cell-weight matrices (scalar scatter; -1 ids dropped)."""
    b, fh, fw, d = depth_probs.shape
    hw = fh * fw
    ids = cell_ids.reshape(b, d, hw)
    ids = jnp.where(ids < 0, num_cells, ids)
    hw_idx = jnp.broadcast_to(jnp.arange(hw)[None, :], (d, hw)).reshape(-1)

    def weights_one(probs, ids_row):  # (H',W',D), (D, HW)
        w = jnp.zeros((hw, num_cells + 1), probs.dtype)
        p = probs.reshape(hw, d).T  # (D, HW)
        w = w.at[hw_idx, ids_row.reshape(-1)].add(
            p.reshape(-1), mode="drop"
        )
        return w[:, :num_cells]

    return jax.vmap(weights_one)(depth_probs, ids)


@partial(
    jax.jit,
    static_argnames=("num_cells", "num_cells_pad", "window", "interpret"),
)
def lift_splat_pallas_rows(
    features: jnp.ndarray,
    depth_logits: jnp.ndarray,
    point_idx: jnp.ndarray,
    local_ids: jnp.ndarray,
    block_idx: jnp.ndarray,
    num_cells: int,
    num_cells_pad: int,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused lift-splat via the weighted Pallas BEV pool — one kernel pass,
    no lifted tensor and no (HW, cells) weight matrix in HBM (ROADMAP #2).

    features (X, H', W', C), depth_logits (X, H', W', D), plus per-row chunk
    plans from `ops.bev_pool_pallas.precompute_bev_chunks` built over the
    same (D, H', W')-flattened cell ids the other formulations take.
    INFERENCE ONLY: the pallas_call has no VJP — training paths use
    `lift_splat_matmul_rows` (identical math, float-order differences only).
    Returns (X, num_cells, C) float32.
    """
    from .bev_pool_pallas import bev_pool_weighted_rows

    x, fh, fw, c = features.shape
    d = depth_logits.shape[-1]
    hw = fh * fw
    probs = jax.nn.softmax(depth_logits, axis=-1)  # (X, H', W', D)
    # weights in the (D, HW) flattening of the cell-id plan: p = d*HW + pix
    weights = jnp.transpose(probs, (0, 3, 1, 2)).reshape(x, d * hw)
    return bev_pool_weighted_rows(
        features.reshape(x, hw, c),
        weights,
        point_idx,
        local_ids,
        block_idx,
        num_cells=num_cells,
        num_cells_pad=num_cells_pad,
        window=window,
        interpret=interpret,
    )


def precompute_culled_pairs(
    cell_ids: np.ndarray,
    hw: int,
    num_cells: int,
    point_capacity: int = 0,
    pair_capacity: int = 0,
    pad_multiple: int = 1024,
) -> dict:
    """Calibration-time culling + dedup of one camera's frustum plan
    (VERDICT r03 #3: compact the D*H'*W' axis before the lift).

    At production shapes most frustum points land OUTSIDE the BEV range
    (the +-51.2 m grid clips a 1-60 m frustum hard), and along a ray
    several consecutive depth bins land in the SAME cell. Both facts
    depend only on calibration, so the runtime splat never needs to see
    them: keep only in-range points, group them by their unique
    (cell, pixel) pair, and sort pairs lexicographically. The runtime
    lift then gathers T_cull depth probs, segment-sums them into U pair
    weights (segments are calibration-fixed and sorted), and splats U
    weights with a sorted UNIQUE-index scatter — every axis smaller than
    the full D*H'*W' stream and every sort already done on the host.

    Args:
      cell_ids: (P,) int32 flat BEV cell per frustum point in the
        p = d * HW + pixel flattening (-1 = out of range), from
        `precompute_frustum_cells`.
      hw: H' * W' (pixels per camera); P must be a multiple of it.
      num_cells: bev_h * bev_w (pad cells point one past the end).
      point_capacity / pair_capacity: static output sizes; 0 = round the
        actual counts up to `pad_multiple` (callers batching plans across
        samples pass the shared capacity explicitly). Raises ValueError
        if the actual counts exceed a nonzero capacity.

    Returns dict of numpy arrays (all static-shaped):
      seg_idx:   (T_cull,) int32 positions into the (P,) prob flattening,
                 sorted by their (cell, pixel) pair; pad = P (gathers a
                 zero prob).
      seg_id:    (T_cull,) int32 segment in [0, U_cap) per point
                 (non-decreasing); pad entries join the last segment
                 (they carry zero weight).
      pair_cell: (U_cap,) int32 BEV cell per unique pair, non-decreasing;
                 pad entry k = num_cells + k // hw (trash rows, dropped by
                 the splat).
      pair_pix:  (U_cap,) int32 pixel per unique pair; pad entry k =
                 k % hw. Pads are spread over DISTINCT (cell, pixel)
                 coordinates so consumers scattering with
                 unique_indices=True stay within the documented contract
                 (duplicate indices under that flag are undefined
                 behavior, even in a sliced-off trash row).
      n_points / n_pairs: () int actual (unpadded) counts.
    """
    p = len(cell_ids)
    if p % hw != 0:
        raise ValueError(f"len(cell_ids)={p} not a multiple of hw={hw}")
    valid = np.flatnonzero(cell_ids >= 0).astype(np.int32)
    cells = cell_ids[valid].astype(np.int64)
    pix = (valid % hw).astype(np.int64)
    # lexicographic (cell, pixel) sort -> unique pairs are consecutive
    order = np.argsort(cells * hw + pix, kind="stable")
    valid, cells, pix = valid[order], cells[order], pix[order]
    key = cells * hw + pix
    first = np.ones(len(key), bool)
    first[1:] = key[1:] != key[:-1]
    seg = np.cumsum(first) - 1  # (n_points,) segment per point
    n_points = len(valid)
    n_pairs = int(seg[-1]) + 1 if n_points else 0

    t_cap = point_capacity or _round_up(max(n_points, 1), pad_multiple)
    u_cap = pair_capacity or _round_up(max(n_pairs, 1), pad_multiple)
    if n_points > t_cap or n_pairs > u_cap:
        raise ValueError(
            f"culled plan needs {n_points} points / {n_pairs} pairs but "
            f"capacity is {t_cap}/{u_cap} — raise bev_fusion."
            f"splat_cull_points / splat_cull_pairs in the config"
        )
    seg_idx = np.full((t_cap,), p, np.int32)
    seg_idx[:n_points] = valid
    seg_id = np.full((t_cap,), max(n_pairs - 1, 0), np.int32)
    seg_id[:n_points] = seg
    # distinct pad coordinates (see docstring): all >= (num_cells, 0), so
    # they sort after every real pair and keep the sorted+unique contract
    pad_k = np.arange(u_cap - n_pairs)
    pair_cell = np.empty((u_cap,), np.int32)
    pair_pix = np.empty((u_cap,), np.int32)
    pair_cell[n_pairs:] = num_cells + pad_k // hw
    pair_pix[n_pairs:] = pad_k % hw
    if n_pairs:
        pair_cell[:n_pairs] = cells[first]
        pair_pix[:n_pairs] = pix[first]
    return {
        "seg_idx": seg_idx,
        "seg_id": seg_id,
        "pair_cell": pair_cell,
        "pair_pix": pair_pix,
        "n_points": n_points,
        "n_pairs": n_pairs,
    }


def precompute_culled_pairs_batch(
    camera_cells,
    hw: int,
    num_cells: int,
    point_capacity: int = 0,
    pair_capacity: int = 0,
    headroom: float = 1.0,
    pad_multiple: int = 1024,
    sizes_only: bool = False,
) -> Tuple[Optional[dict], Tuple[int, int]]:
    """Shared-capacity culled plans for a stack of cameras.

    The one home of the capacity-sizing policy (dataset loading and the
    benches previously each re-derived it): explicit nonzero capacities
    win; otherwise each capacity is the max actual count across cameras,
    scaled by `headroom`, +1 (so an exact-fit plan keeps a nonzero pad
    region and later overflow raises instead of silently reshaping),
    rounded up to `pad_multiple`.

    Args:
      camera_cells: iterable of per-camera flat cell-id arrays (any shape;
        reshaped to (P,)), e.g. rows of `precompute_frustum_cells` output.
    Returns (plans, (t_cap, u_cap)): plans stacks each per-camera plan
    key along a new leading axis (scalar counts become (N,) arrays).
    """
    rows = [np.asarray(c).reshape(-1) for c in camera_cells]
    if not (point_capacity and pair_capacity):
        sizes = [
            precompute_culled_pairs(r, hw, num_cells, pad_multiple=1)
            for r in rows
        ]

        def cap(key: str) -> int:
            worst = max(p[key] for p in sizes)
            return _round_up(
                max(int(worst * headroom) + 1, 1), pad_multiple
            )

        point_capacity = point_capacity or cap("n_points")
        pair_capacity = pair_capacity or cap("n_pairs")
    if sizes_only:
        # capacity derivation only (e.g. the dataset sizes once from
        # sample 0 and builds per-calibration plans lazily later)
        return None, (point_capacity, pair_capacity)
    plans = [
        precompute_culled_pairs(
            r, hw, num_cells,
            point_capacity=point_capacity, pair_capacity=pair_capacity,
        )
        for r in rows
    ]
    stacked = {
        k: np.stack([np.asarray(p[k]) for p in plans]) for k in plans[0]
    }
    return stacked, (point_capacity, pair_capacity)


def _pair_weights(depth_probs, seg_idx, seg_id, num_pairs: int):
    """(X, H', W', D) probs + culled plan -> (X, U_cap) per-pair weights.
    Gathers only the surviving depth probs and segment-sums them into
    their calibration-fixed (cell, pixel) groups (sorted segments)."""
    x, fh, fw, d = depth_probs.shape
    hw = fh * fw
    # p = d * HW + pixel flattening, one zero row appended for pad gathers
    flat = jnp.transpose(depth_probs, (0, 3, 1, 2)).reshape(x, d * hw)
    flat = jnp.concatenate([flat, jnp.zeros((x, 1), flat.dtype)], axis=1)
    p_sel = jnp.take_along_axis(flat, seg_idx, axis=1)  # (X, T_cull)

    def sums_one(pv, sv):
        return jax.ops.segment_sum(
            pv, sv, num_segments=num_pairs, indices_are_sorted=True
        )

    return jax.vmap(sums_one)(p_sel, seg_id)


@partial(jax.jit, static_argnames=("num_cells",))
def lift_splat_culled_rows(
    features: jnp.ndarray,
    depth_logits: jnp.ndarray,
    seg_idx: jnp.ndarray,
    seg_id: jnp.ndarray,
    pair_cell: jnp.ndarray,
    pair_pix: jnp.ndarray,
    num_cells: int,
) -> jnp.ndarray:
    """Culled lift-splat: `lift_splat_matmul_rows` semantics (identical
    adds, float summation order only) on the compacted plan from
    `precompute_culled_pairs`.

    features (X, H', W', C), depth_logits (X, H', W', D), plan rows
    (X, T_cull) / (X, U_cap) -> (X, num_cells, C).

    The dense (cells, HW) weight matrix is built by ONE sorted
    unique-index scatter of the U pair weights (XLA skips the runtime
    sort/dedup the full path pays for all D*H'*W' points), then the
    feature contraction stays a dense MXU matmul.
    """
    x, fh, fw, c = features.shape
    hw = fh * fw
    depth_probs = jax.nn.softmax(depth_logits, axis=-1)
    u_cap = pair_cell.shape[1]
    w_pair = _pair_weights(depth_probs, seg_idx, seg_id, u_cap)  # (X, U)

    # pads occupy distinct (num_cells + k // hw, k % hw) coordinates (the
    # precompute spreads them so unique_indices=True holds for EVERY entry,
    # not just the live ones); size the trash region to hold the worst case
    trash_rows = 1 + (u_cap - 1) // hw

    def weights_one(wv, cellv, pixv):
        # (cell, pix) pairs are lexicographically sorted and unique;
        # pads (cell >= num_cells) land in the dropped trash rows
        wt = jnp.zeros((num_cells + trash_rows, hw), wv.dtype)
        wt = wt.at[cellv, pixv].add(
            wv, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        return wt[:num_cells]

    wt = jax.vmap(weights_one)(w_pair, pair_cell, pair_pix)  # (X, K, HW)
    flat = features.reshape(x, hw, c)
    return jnp.einsum("bkh,bhc->bkc", wt, flat)


@partial(jax.jit, static_argnames=("num_cells",))
def lift_splat_culled_gather_rows(
    features: jnp.ndarray,
    depth_logits: jnp.ndarray,
    seg_idx: jnp.ndarray,
    seg_id: jnp.ndarray,
    pair_cell: jnp.ndarray,
    pair_pix: jnp.ndarray,
    num_cells: int,
) -> jnp.ndarray:
    """Same semantics as `lift_splat_culled_rows` via row gather +
    segment-sum instead of the dense weight matmul: gather each unique
    pair's feature row, scale by the pair weight, segment-sum by BEV cell
    (sorted segments). Skips the (cells, HW) weight matrix entirely —
    wins when U << HW * cells / C keeps the gather under the matmul's
    HBM traffic."""
    x, fh, fw, c = features.shape
    hw = fh * fw
    depth_probs = jax.nn.softmax(depth_logits, axis=-1)
    u_cap = pair_cell.shape[1]
    w_pair = _pair_weights(depth_probs, seg_idx, seg_id, u_cap)  # (X, U)
    flat = features.reshape(x, hw, c)

    def one(fv, wv, cellv, pixv):
        rows = fv[pixv] * wv[:, None]  # (U, C)
        # pad cells are >= num_cells (distinct trash coordinates): cell ==
        # num_cells lands in the sliced-off row, larger ones are dropped
        # as out-of-range segments; pad weights are zero either way
        out = jax.ops.segment_sum(
            rows, cellv, num_segments=num_cells + 1, indices_are_sorted=True
        )
        return out[:num_cells]

    return jax.vmap(one)(flat, w_pair, pair_cell, pair_pix)


@partial(jax.jit, static_argnames=("num_cells",))
def lift_splat_matmul_rows(
    features: jnp.ndarray,
    depth_logits: jnp.ndarray,
    cell_ids: jnp.ndarray,
    num_cells: int,
) -> jnp.ndarray:
    """Per-row-plan variant of `lift_splat_matmul` (each row has its own
    calibration): features (X, H', W', C), logits (X, H', W', D),
    cell_ids (X, D*H'*W') -> (X, num_cells, C)."""
    x, fh, fw, c = features.shape
    depth_probs = jax.nn.softmax(depth_logits, axis=-1)
    w = _splat_weights(depth_probs, cell_ids, num_cells)
    flat = features.reshape(x, fh * fw, c)
    return jnp.einsum("bhk,bhc->bkc", w, flat)
