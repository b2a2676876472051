"""Fusion modules x modality combinations, heads (mirrors the reference
`test_all_configurations` sweep, ref: fusion.py:1228-1377)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    AttentionFusionSpec,
    BEVFusionSpec,
    CenterNetHeadSpec,
    LateFusionSpec,
    MLPHeadSpec,
)
from bevfusion_multimodal_3d_object_detection_tpu.models.fusion import (
    FlexibleAttentionFusion,
    FlexibleBEVFusion,
    FlexibleLateFusion,
    SpatialReshaper,
    bilinear_resize,
)
from bevfusion_multimodal_3d_object_detection_tpu.models.heads import (
    CenterNetHead,
    MLPDetectionHead,
)

RNG = jax.random.PRNGKey(0)
MODALITY_COMBOS = [
    (True, False, False),
    (False, True, False),
    (False, False, True),
    (True, True, False),
    (True, False, True),
    (False, True, True),
    (True, True, True),
]


def _features(use_camera, use_lidar, use_radar, b=2):
    cam = jax.random.normal(RNG, (b, 6, 4, 8, 512)) if use_camera else None
    lid = jax.random.normal(RNG, (b, 1024)) if use_lidar else None
    rad = jax.random.normal(RNG, (b, 256)) if use_radar else None
    return cam, lid, rad


@pytest.mark.parametrize("combo", MODALITY_COMBOS)
def test_bev_fusion_all_combos(combo):
    uc, ul, ur = combo
    mod = FlexibleBEVFusion(
        spec=BEVFusionSpec(), use_camera=uc, use_lidar=ul, use_radar=ur
    )
    feats = _features(uc, ul, ur)
    variables = mod.init({"params": RNG}, *feats)
    out = mod.apply(variables, *feats)
    assert out.shape == (2, 50, 50, 256)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("combo", MODALITY_COMBOS)
def test_attention_fusion_all_combos(combo):
    uc, ul, ur = combo
    mod = FlexibleAttentionFusion(
        spec=AttentionFusionSpec(), use_camera=uc, use_lidar=ul, use_radar=ur
    )
    feats = _features(uc, ul, ur)
    variables = mod.init({"params": RNG}, *feats)
    out = mod.apply(variables, *feats)
    assert out.shape == (2, 512)


@pytest.mark.parametrize("combo", MODALITY_COMBOS)
def test_late_fusion_all_combos(combo):
    uc, ul, ur = combo
    mod = FlexibleLateFusion(
        spec=LateFusionSpec(), use_camera=uc, use_lidar=ul, use_radar=ur
    )
    feats = _features(uc, ul, ur)
    variables = mod.init({"params": RNG}, *feats)
    out = mod.apply(variables, *feats)
    assert out.shape == (2, 512)


def test_centernet_head_outputs():
    head = CenterNetHead(spec=CenterNetHeadSpec())
    x = jax.random.normal(RNG, (2, 50, 50, 256))
    variables = head.init({"params": RNG}, x)
    out = head.apply(variables, x)
    assert out["heatmap"].shape == (2, 50, 50, 10)
    assert out["offset"].shape == (2, 50, 50, 2)
    assert out["size"].shape == (2, 50, 50, 3)
    assert out["rot"].shape == (2, 50, 50, 2)
    assert out["vel"].shape == (2, 50, 50, 2)
    hm = np.asarray(out["heatmap"])
    assert (hm >= 0).all() and (hm <= 1).all()  # sigmoid applied in forward


def test_centernet_head_heatmap_prior_bias():
    """With N(0,0.001) weights the initial heatmap must sit near the 0.01
    prior (ref init: fusion.py:858-867)."""
    head = CenterNetHead(spec=CenterNetHeadSpec())
    x = jnp.zeros((1, 50, 50, 256))
    variables = head.init({"params": RNG}, x)
    hm = np.asarray(head.apply(variables, x)["heatmap"])
    np.testing.assert_allclose(hm, 0.01, atol=1e-3)


def test_mlp_head_split():
    head = MLPDetectionHead(spec=MLPHeadSpec())
    x = jax.random.normal(RNG, (3, 512))
    variables = head.init({"params": RNG}, x)
    out = head.apply(variables, x)
    assert out["cls"].shape == (3, 10)
    assert out["box"].shape == (3, 7)


def test_spatial_reshaper():
    mod = SpatialReshaper(output_channels=64, bev_h=10, bev_w=10)
    x = jax.random.normal(RNG, (2, 128))
    variables = mod.init({"params": RNG}, x)
    assert mod.apply(variables, x).shape == (2, 10, 10, 64)
    # spatial input passes through untouched
    x4 = jax.random.normal(RNG, (2, 10, 10, 64))
    np.testing.assert_array_equal(
        np.asarray(mod.apply(variables, x4)), np.asarray(x4)
    )


def test_bilinear_resize_matches_torch_align_corners_false():
    """Half-pixel bilinear equivalence with torch F.interpolate
    (the reference's resize mode, fusion.py:242-247)."""
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).rand(1, 5, 7, 3).astype(np.float32)
    ours = np.asarray(bilinear_resize(jnp.asarray(x), 10, 14))
    theirs = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            size=(10, 14),
            mode="bilinear",
            align_corners=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
