"""Detector assembly + factory (ref: fusion.py:946-1221).

`MultiModal3DDetector` conditionally instantiates the per-modality encoders,
picks the fusion module by `fusion_type`, and the head by
`is_spatial && detection_head == 'centernet'` (ref: fusion.py:1016-1088).

The forward contract mirrors the reference
(`forward(camera_imgs, lidar_points, radar_points)` -> prediction dict,
ref: fusion.py:1090-1137) with TPU-native layouts:

  camera_imgs:  (B, N_cam, H, W, 3)   NHWC
  lidar_points: (B, N, C)
  radar_points: (B, R, N_r, C_r)      stacked (the reference takes a list)

Returns NHWC prediction maps (CenterNet) or {'cls','box'} (MLP head).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import DetectorSpec, load_config
from .encoders import (
    MultiRadarEncoder,
    PointNetLiDAREncoder,
    ResNetCameraEncoder,
    VoxelNetLiDAREncoder,
)
from .fusion import (
    FlexibleAttentionFusion,
    FlexibleBEVFusion,
    FlexibleLateFusion,
)
from .heads import CenterNetHead, MLPDetectionHead


class MultiModal3DDetector(nn.Module):
    spec: DetectorSpec = DetectorSpec()
    dtype: Any = jnp.float32
    mask_padding: bool = False  # compat Q13 (False = reference behavior)
    # fused Pallas PointNet on the inference path (ops/pointnet_pallas.py)
    use_pallas_infer: bool = False
    # serving-graph camera BN folding (utils/fold_bn.py); inference-only
    fold_bn: bool = False
    # BEV spatial partitioning ('sp'): a NamedSharding (e.g. P(None,'view') —
    # spatial axis only; the batch axis propagates from the inputs) pinned
    # onto the fused (B, H, W, C) BEV map so the fusion tail + head convs run
    # spatially sharded — XLA SPMD inserts the halo exchanges for the 3x3
    # convs (collective-permute over ICI). Set via parallel.bev_spatial
    # (train_detect.py); None = no constraint. bev_h must divide by the
    # sharded axis size.
    bev_sharding: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        camera_imgs: Optional[jnp.ndarray] = None,
        lidar_points: Optional[jnp.ndarray] = None,
        radar_points: Optional[jnp.ndarray] = None,
        train: bool = False,
        camera_cells: Optional[jnp.ndarray] = None,
        camera_chunks: Optional[tuple] = None,
        camera_pairs: Optional[tuple] = None,
    ) -> Dict[str, jnp.ndarray]:
        s = self.spec

        cam_feat = None
        if s.use_camera and camera_imgs is not None:
            cam_feat = ResNetCameraEncoder(
                spec=s.camera, dtype=self.dtype, fold_bn=self.fold_bn,
                name="camera_encoder",
            )(camera_imgs, train=train)

        lidar_feat = None
        if s.use_lidar and lidar_points is not None:
            if s.lidar.encoder_type.lower() == "voxelnet":
                lidar_feat = VoxelNetLiDAREncoder(
                    spec=s.lidar,
                    pc_range=s.bev.pc_range,
                    dtype=self.dtype,
                    name="lidar_encoder",
                )(lidar_points, train=train)
            else:
                lidar_feat = PointNetLiDAREncoder(
                    spec=s.lidar,
                    dtype=self.dtype,
                    mask_padding=self.mask_padding,
                    use_pallas_infer=self.use_pallas_infer,
                    name="lidar_encoder",
                )(lidar_points, train=train)

        radar_feat = None
        if s.use_radar and radar_points is not None:
            radar_feat = MultiRadarEncoder(
                spec=s.radar,
                dtype=self.dtype,
                mask_padding=self.mask_padding,
                use_pallas_infer=self.use_pallas_infer,
                name="radar_encoder",
            )(radar_points, train=train)

        if s.fusion_type == "bev":
            fused = FlexibleBEVFusion(
                spec=s.bev,
                use_camera=s.use_camera,
                use_lidar=s.use_lidar,
                use_radar=s.use_radar,
                dtype=self.dtype,
                name="fusion",
            )(
                cam_feat, lidar_feat, radar_feat,
                train=train, camera_cells=camera_cells,
                camera_chunks=camera_chunks, camera_pairs=camera_pairs,
            )
        elif s.fusion_type == "attention":
            fused = FlexibleAttentionFusion(
                spec=s.attention,
                use_camera=s.use_camera,
                use_lidar=s.use_lidar,
                use_radar=s.use_radar,
                dtype=self.dtype,
                name="fusion",
            )(cam_feat, lidar_feat, radar_feat, train=train)
        elif s.fusion_type == "late":
            fused = FlexibleLateFusion(
                spec=s.late,
                use_camera=s.use_camera,
                use_lidar=s.use_lidar,
                use_radar=s.use_radar,
                dtype=self.dtype,
                name="fusion",
            )(cam_feat, lidar_feat, radar_feat, train=train)
        else:
            raise ValueError(f"Unknown fusion type: {s.fusion_type}")

        if self.bev_sharding is not None and fused.ndim == 4:
            import jax

            fused = jax.lax.with_sharding_constraint(fused, self.bev_sharding)

        if s.head_is_centernet:
            preds = CenterNetHead(
                spec=s.centernet, dtype=self.dtype, name="det_head"
            )(fused, train=train)
        else:
            # MLP head for non-spatial fusions (ref: fusion.py:1074-1088)
            preds = MLPDetectionHead(
                spec=s.mlp, dtype=self.dtype, name="det_head"
            )(fused, train=train)
        return preds

    def get_config_str(self) -> str:
        return (
            f"{self.spec.modality_string()}_{self.spec.fusion_type}"
            f"_{self.spec.detection_head}"
        )


def create_detector(
    modality_config: Optional[str] = None,
    fusion_type: Optional[str] = None,
    detection_head: Optional[str] = None,
    num_classes: Optional[int] = None,
    config: Optional[Dict] = None,
    config_path: Optional[str] = None,
    dtype: Any = jnp.float32,
    mask_padding: bool = False,
    use_pallas_infer: bool = False,
    fold_bn: bool = False,
) -> MultiModal3DDetector:
    """Factory mirroring the reference `create_detector`
    (ref: fusion.py:1148-1221): accepts a modality string
    ('camera_only' .. 'camera+lidar+radar' | 'all'), fusion type, head, and/or
    a config dict/path; direct args override config values."""
    if config is None and config_path is not None:
        config = load_config(config_path)
    spec = DetectorSpec.from_config(
        config,
        modality_config=modality_config,
        fusion_type=fusion_type,
        detection_head=detection_head,
        num_classes=num_classes,
    )
    return MultiModal3DDetector(
        spec=spec, dtype=dtype, mask_padding=mask_padding,
        use_pallas_infer=use_pallas_infer, fold_bn=fold_bn,
    )
