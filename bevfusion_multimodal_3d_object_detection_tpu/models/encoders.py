"""Modality encoders (flax/linen, NHWC / channels-last, TPU-native).

Re-designs of the reference encoders (ref: /root/reference/src/encoders.py):

- `ResNetCameraEncoder`  — ResNet-18 truncated after layer3 + 1x1 proj to 512
  (ref: encoders.py:36-189). Multi-view input is folded into the batch axis so
  all 6 cameras run as one large MXU-friendly batch instead of a loop.
- `PointNetLiDAREncoder` — 5 shared point MLPs + global max-pool
  (ref: encoders.py:191-306). The shared 1x1 Conv1d stack is expressed as
  Dense layers over the channel axis: (B, N, C) @ (C, C') is a single large
  matmul on the MXU. Optional masked max (compat Q13).
- `VoxelNetLiDAREncoder` — VFE + dense voxel scatter + 3D convs
  (ref: encoders.py:308-455). The per-batch Python scatter loop is replaced by
  a vectorized segment-max scatter.
- `RadarEncoder` / `MultiRadarEncoder` — PointNet-lite per radar; the 5-radar
  Python loop (ref: encoders.py:641-644) is replaced by folding the radar axis
  into the batch.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import CameraEncoderSpec, LidarEncoderSpec, RadarEncoderSpec
from .resnet import ResNet18Trunk

_NEG_INF = -1e9


class ResNetCameraEncoder(nn.Module):
    """Camera encoder: ResNet-18 trunk (stride 16) + 1x1 conv 256->512 + BN + ReLU.

    Input:  (B, N_cam, H, W, 3) or (B*N_cam, H, W, 3) — NHWC.
    Output: (B, N_cam, H/16, W/16, out_channels) or flat 4-D respectively
    (ref: encoders.py:143-171 accepts both 5-D and 4-D).
    """

    spec: CameraEncoderSpec = CameraEncoderSpec()
    dtype: Any = jnp.float32
    # serving-graph BN folding: weights pre-scaled via
    # utils/fold_bn.fold_bn_params; the graph runs conv(+bias)+relu only
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # freeze_bn: reference puts BN layers into eval mode
        # (ref: encoders.py:125-131); here BN simply keeps running stats.
        bn_train = train and not self.spec.freeze_bn

        multi_view = x.ndim == 5
        if multi_view:
            b, n = x.shape[0], x.shape[1]
            x = x.reshape((b * n,) + x.shape[2:])

        x = ResNet18Trunk(
            dtype=self.dtype, remat=self.spec.remat, fold_bn=self.fold_bn,
            name="trunk",
        )(x, train=bn_train)
        x = nn.Conv(
            self.spec.out_channels,
            (1, 1),
            use_bias=self.fold_bn,
            dtype=self.dtype,
            name="channel_proj",
        )(x)
        if not self.fold_bn:
            x = nn.BatchNorm(
                use_running_average=not bn_train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="channel_proj_bn",
            )(x)
        x = nn.relu(x)

        if multi_view:
            x = x.reshape((b, n) + x.shape[1:])
        return x

    def get_output_shape(self, input_height: int, input_width: int):
        s = self.spec.total_stride
        return (self.spec.out_channels, input_height // s, input_width // s)


class _PointMLP(nn.Module):
    """Shared per-point MLP stack: Dense + (BatchNorm) + ReLU per layer.

    Equivalent to the reference's 1x1 Conv1d + BatchNorm1d chains
    (ref: encoders.py:252-269); a Dense over the last axis of (B, N, C) is
    one (B*N, C) x (C, C') matmul — exactly what the MXU wants.
    BatchNorm normalizes per-channel over (batch, points), matching
    torch BatchNorm1d semantics on (B, C, N).
    """

    layers: Sequence[int]
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, width in enumerate(self.layers):
            x = nn.Dense(width, dtype=self.dtype, name=f"mlp{i + 1}")(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis=-1,
                    # reduce over batch AND point axes (torch BatchNorm1d)
                    axis_name=None,
                    dtype=self.dtype,
                    name=f"bn{i + 1}",
                )(x)
            x = nn.relu(x)
        return x


def masked_max(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int):
    """Max over `axis`; where `mask` (broadcastable bool) is False the element
    is excluded. Falls back to plain max when mask is None (reference behavior,
    quirk Q13: zero-padding participates in the max, encoders.py:298)."""
    if mask is None:
        return jnp.max(x, axis=axis)
    neg = jnp.asarray(_NEG_INF, dtype=x.dtype)
    x = jnp.where(mask, x, neg)
    out = jnp.max(x, axis=axis)
    # all-masked rows degrade to 0 instead of -inf
    return jnp.where(out <= neg, jnp.zeros_like(out), out)


def points_validity_mask(points: jnp.ndarray) -> jnp.ndarray:
    """(..., N, C) -> (..., N, 1) bool: True where any channel is nonzero.

    Zero-padding comes from the fixed-size pad in the pipeline
    (ref: train_detect.py:187-189); a real in-range point is never all-zero.
    """
    return jnp.any(points != 0, axis=-1, keepdims=True)


class PointNetLiDAREncoder(nn.Module):
    """PointNet global feature encoder (ref: encoders.py:191-306).

    Input:  (B, N, C) or (B, C, N) point cloud (zero-padded to fixed N).
    Output: (B, feat_dim) global features.
    """

    spec: LidarEncoderSpec = LidarEncoderSpec()
    dtype: Any = jnp.float32
    mask_padding: bool = False  # compat Q13: reference does NOT mask
    # inference fast path: run the whole MLP chain + max-pool as ONE fused
    # Pallas kernel (BN folded into the matmuls) — avoids materializing the
    # (B, N, width) intermediates in HBM (ops/pointnet_pallas.py)
    use_pallas_infer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = self.spec.input_channels
        # Accept (B, C, N) like the reference (encoders.py:282-284).
        if x.ndim == 3 and x.shape[-1] != c_in and x.shape[1] == c_in:
            x = jnp.swapaxes(x, 1, 2)

        mlp = _PointMLP(
            layers=self.spec.mlp_layers,
            use_bn=self.spec.use_batch_norm,
            dtype=self.dtype,
            name="point_mlp",
        )

        if (
            self.use_pallas_infer
            and not train
            and not self.is_initializing()
        ):
            from ..ops.pointnet_pallas import pointnet_encode_folded

            params = self.get_variable("params", "point_mlp")
            stats = self.get_variable("batch_stats", "point_mlp") or {}
            return pointnet_encode_folded(
                x.astype(self.dtype),
                params,
                stats,
                num_layers=len(self.spec.mlp_layers),
                mask_padding=self.mask_padding,
                interpret=jax.default_backend() == "cpu",
            )

        mask = points_validity_mask(x) if self.mask_padding else None
        feats = mlp(x, train=train)
        return masked_max(feats, mask, axis=1)  # (B, feat_dim)


class RadarEncoder(nn.Module):
    """Single-radar PointNet-lite (ref: encoders.py:458-557).

    Input:  (B, N, 7); Output: (B, feat_dim).
    """

    spec: RadarEncoderSpec = RadarEncoderSpec()
    dtype: Any = jnp.float32
    mask_padding: bool = False
    use_pallas_infer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = self.spec.input_channels
        if x.ndim == 3 and x.shape[-1] != c_in and x.shape[1] == c_in:
            x = jnp.swapaxes(x, 1, 2)

        mlp = _PointMLP(
            layers=self.spec.mlp_layers,
            use_bn=self.spec.use_batch_norm,
            dtype=self.dtype,
            name="point_mlp",
        )
        if (
            self.use_pallas_infer
            and not train
            and not self.is_initializing()
        ):
            from ..ops.pointnet_pallas import pointnet_encode_folded

            params = self.get_variable("params", "point_mlp")
            stats = self.get_variable("batch_stats", "point_mlp") or {}
            return pointnet_encode_folded(
                x.astype(self.dtype),
                params,
                stats,
                num_layers=len(self.spec.mlp_layers),
                mask_padding=self.mask_padding,
                block_points=128,
                interpret=jax.default_backend() == "cpu",
            )

        mask = points_validity_mask(x) if self.mask_padding else None
        feats = mlp(x, train=train)
        return masked_max(feats, mask, axis=1)


class MultiRadarEncoder(nn.Module):
    """Shared RadarEncoder over R radars + cross-radar fusion
    (ref: encoders.py:560-661).

    Input:  (B, R, N, 7) stacked radar points (the reference takes a list of R
    tensors and loops; here the radar axis folds into the batch so the shared
    encoder runs once — the only semantic difference is that BatchNorm batch
    statistics are computed over B*R rather than per-radar).
    Output: (B, feat_dim).
    """

    spec: RadarEncoderSpec = RadarEncoderSpec()
    dtype: Any = jnp.float32
    mask_padding: bool = False
    use_pallas_infer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.stack(x, axis=1)  # list of (B, N, 7) -> (B, R, N, 7)
        b, r = x.shape[0], x.shape[1]
        flat = x.reshape((b * r,) + x.shape[2:])
        feats = RadarEncoder(
            spec=self.spec,
            dtype=self.dtype,
            mask_padding=self.mask_padding,
            use_pallas_infer=self.use_pallas_infer,
            name="shared_radar",
        )(flat, train=train)
        feats = feats.reshape(b, r, -1)  # (B, R, feat_dim)

        method = self.spec.fusion_method
        if method == "concat":
            # Linear (R*feat) -> feat (ref: encoders.py:623-624, 650-653)
            fused = nn.Dense(
                self.spec.feat_dim, dtype=self.dtype, name="fusion"
            )(feats.reshape(b, -1))
        elif method == "max":
            fused = jnp.max(feats, axis=1)
        elif method == "mean":
            fused = jnp.mean(feats, axis=1)
        else:
            raise ValueError(f"Unknown radar fusion method: {method}")
        return fused


class VFELayer(nn.Module):
    """Voxel Feature Encoding layer (ref: encoders.py:312-340):
    Dense + BN + ReLU, then concat per-voxel max back onto each point."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # x: (V, P, C) voxels x points-per-voxel x channels
        half = self.out_channels // 2
        y = nn.Dense(half, dtype=self.dtype, name="dense")(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(y)
        y = nn.relu(y)
        agg = masked_max(y, mask, axis=-2)  # (V, half)
        agg = jnp.broadcast_to(
            agg[..., None, :], y.shape[:-1] + (half,)
        )
        return jnp.concatenate([y, agg], axis=-1)  # (V, P, out)


class VoxelNetLiDAREncoder(nn.Module):
    """VoxelNet-style alternative LiDAR encoder (ref: encoders.py:308-455;
    selected nowhere in the live config, configs/base.yaml:176).

    Points are binned into a coarse (D, H, W) grid with a vectorized
    scatter-max (replacing the reference's per-batch Python loop at
    encoders.py:407-410), then reduced by three stride-2 3D convs.

    Input:  (B, N, C); Output: (B, feat_dim).
    """

    spec: LidarEncoderSpec = LidarEncoderSpec()
    grid: Tuple[int, int, int] = (10, 32, 32)  # (D, H, W) voxel grid
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        d, h, w = self.grid
        x_min, y_min, z_min, x_max, y_max, z_max = self.pc_range

        mask = points_validity_mask(x)  # (B, N, 1)

        # Per-point features via a small shared MLP (the VFE role)
        feats = _PointMLP(
            layers=(32, 64),
            use_bn=self.spec.use_batch_norm,
            dtype=self.dtype,
            name="vfe",
        )(x, train=train)  # (B, N, 64)
        c = feats.shape[-1]

        # Voxel ids per point
        ix = jnp.clip(
            ((x[..., 0] - x_min) / (x_max - x_min) * w).astype(jnp.int32), 0, w - 1
        )
        iy = jnp.clip(
            ((x[..., 1] - y_min) / (y_max - y_min) * h).astype(jnp.int32), 0, h - 1
        )
        iz = jnp.clip(
            ((x[..., 2] - z_min) / (z_max - z_min) * d).astype(jnp.int32), 0, d - 1
        )
        vid = (iz * h + iy) * w + ix  # (B, N) in [0, D*H*W)
        # Route padded points to a trash voxel
        num_voxels = d * h * w
        vid = jnp.where(mask[..., 0], vid, num_voxels)

        # Scatter-max points into voxels: segment max per batch row.
        feats = jnp.where(mask, feats, _NEG_INF)

        def scatter_one(f, v):
            grid0 = jnp.full((num_voxels + 1, c), _NEG_INF, dtype=f.dtype)
            grid0 = grid0.at[v].max(f)
            return grid0[:num_voxels]

        voxels = jax.vmap(scatter_one)(feats, vid)  # (B, V, C)
        voxels = jnp.where(voxels <= _NEG_INF, 0.0, voxels)
        voxels = voxels.reshape(b, d, h, w, c)  # NDHWC

        # 3 stride-2 3D convs (ref: encoders.py:372-390)
        for i, ch in enumerate((64, 128, 256)):
            voxels = nn.Conv(
                ch,
                (3, 3, 3),
                strides=(2, 2, 2),
                padding=((1, 1), (1, 1), (1, 1)),
                dtype=self.dtype,
                name=f"conv3d_{i + 1}",
            )(voxels)
            voxels = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"conv3d_bn{i + 1}",
            )(voxels)
            voxels = nn.relu(voxels)

        pooled = jnp.max(voxels, axis=(1, 2, 3))  # (B, 256)
        return nn.Dense(self.spec.feat_dim, dtype=self.dtype, name="proj")(
            pooled
        )


if __name__ == "__main__":
    # Executable smoke test mirroring the reference's `python encoders.py`
    # self-test (ref: encoders.py:792-882): build every encoder, forward
    # dummy tensors, print shapes.
    import jax

    rng = jax.random.PRNGKey(0)
    print("=== ResNetCameraEncoder ===")
    cam = ResNetCameraEncoder(spec=CameraEncoderSpec(image_size=(64, 128)))
    x = jax.random.normal(rng, (1, 6, 64, 128, 3))
    v = cam.init({"params": rng}, x)
    print(f"  in {x.shape} -> out {cam.apply(v, x).shape}")

    print("=== PointNetLiDAREncoder ===")
    lid = PointNetLiDAREncoder(spec=LidarEncoderSpec(max_points=1024))
    x = jax.random.normal(rng, (2, 1024, 4))
    v = lid.init({"params": rng}, x)
    print(f"  in {x.shape} -> out {lid.apply(v, x).shape}")

    print("=== VoxelNetLiDAREncoder ===")
    vox = VoxelNetLiDAREncoder(spec=LidarEncoderSpec(max_points=1024))
    v = vox.init({"params": rng}, x)
    print(f"  in {x.shape} -> out {vox.apply(v, x).shape}")

    print("=== MultiRadarEncoder ===")
    rad = MultiRadarEncoder(spec=RadarEncoderSpec(max_points_per_sensor=32))
    x = jax.random.normal(rng, (2, 5, 32, 7))
    v = rad.init({"params": rng}, x)
    print(f"  in {x.shape} -> out {rad.apply(v, x).shape}")

    print("\nALL TESTS PASSED!")
