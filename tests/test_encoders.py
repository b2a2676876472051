"""Encoder shapes and semantics (mirrors the reference __main__ smoke tests,
ref: encoders.py:792-882, as real unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    CameraEncoderSpec,
    LidarEncoderSpec,
    RadarEncoderSpec,
)
from bevfusion_multimodal_3d_object_detection_tpu.models.encoders import (
    MultiRadarEncoder,
    PointNetLiDAREncoder,
    RadarEncoder,
    ResNetCameraEncoder,
    VoxelNetLiDAREncoder,
    masked_max,
    points_validity_mask,
)

RNG = jax.random.PRNGKey(0)


def test_camera_encoder_multiview_shape():
    enc = ResNetCameraEncoder(spec=CameraEncoderSpec(image_size=(32, 64)))
    x = jnp.zeros((1, 6, 32, 64, 3))
    variables = enc.init({"params": RNG}, x)
    y = enc.apply(variables, x)
    assert y.shape == (1, 6, 2, 4, 512)  # stride 16


def test_camera_encoder_flat_input():
    enc = ResNetCameraEncoder(spec=CameraEncoderSpec(image_size=(32, 64)))
    x = jnp.zeros((2, 32, 64, 3))
    variables = enc.init({"params": RNG}, x)
    y = enc.apply(variables, x)
    assert y.shape == (2, 2, 4, 512)


def test_pointnet_shape_and_channel_order():
    enc = PointNetLiDAREncoder(spec=LidarEncoderSpec(max_points=128))
    x = jax.random.normal(RNG, (2, 128, 4))
    variables = enc.init({"params": RNG}, x)
    y = enc.apply(variables, x)
    assert y.shape == (2, 1024)
    # (B, C, N) accepted too (ref: encoders.py:282-284)
    y2 = enc.apply(variables, jnp.swapaxes(x, 1, 2))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_pointnet_masked_vs_unmasked_padding():
    x = np.random.RandomState(0).randn(1, 64, 4).astype(np.float32)
    x[0, 32:] = 0.0  # zero padding
    unmasked = PointNetLiDAREncoder(
        spec=LidarEncoderSpec(max_points=64), mask_padding=False
    )
    masked = PointNetLiDAREncoder(
        spec=LidarEncoderSpec(max_points=64), mask_padding=True
    )
    vu = unmasked.init({"params": RNG}, jnp.asarray(x))
    yu = unmasked.apply(vu, jnp.asarray(x))
    ym = masked.apply(vu, jnp.asarray(x))  # same params
    # masked max must equal max over only the real points
    x_real = x[:, :32]
    yr = unmasked.apply(vu, jnp.asarray(x_real))
    np.testing.assert_allclose(np.asarray(ym), np.asarray(yr), atol=1e-5)
    # quirk Q13: unmasked may differ (padding leaks through BN+bias)
    assert yu.shape == ym.shape


def test_masked_max_helper():
    x = jnp.asarray([[1.0, 5.0, 3.0]])[..., None]
    mask = jnp.asarray([[True, False, True]])[..., None]
    out = masked_max(x, mask, axis=1)
    assert float(out[0, 0]) == 3.0
    assert float(masked_max(x, None, axis=1)[0, 0]) == 5.0


def test_points_validity_mask():
    pts = jnp.asarray([[[1.0, 0, 0, 0], [0, 0, 0, 0]]])
    m = points_validity_mask(pts)
    assert bool(m[0, 0, 0]) and not bool(m[0, 1, 0])


def test_radar_encoder_shape():
    enc = RadarEncoder(spec=RadarEncoderSpec(max_points_per_sensor=16))
    x = jax.random.normal(RNG, (3, 16, 7))
    variables = enc.init({"params": RNG}, x)
    assert enc.apply(variables, x).shape == (3, 256)


@pytest.mark.parametrize("method", ["concat", "max", "mean"])
def test_multi_radar_fusion_methods(method):
    enc = MultiRadarEncoder(
        spec=RadarEncoderSpec(max_points_per_sensor=16, fusion_method=method)
    )
    x = jax.random.normal(RNG, (2, 5, 16, 7))
    variables = enc.init({"params": RNG}, x)
    assert enc.apply(variables, x).shape == (2, 256)


def test_multi_radar_accepts_list_input():
    enc = MultiRadarEncoder(
        spec=RadarEncoderSpec(max_points_per_sensor=16)
    )
    stacked = jax.random.normal(RNG, (2, 5, 16, 7))
    as_list = [stacked[:, r] for r in range(5)]
    variables = enc.init({"params": RNG}, stacked)
    y1 = enc.apply(variables, stacked)
    y2 = enc.apply(variables, as_list)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_voxelnet_encoder_shape():
    enc = VoxelNetLiDAREncoder(spec=LidarEncoderSpec(max_points=256))
    x = jax.random.normal(RNG, (1, 256, 4)) * 20.0
    variables = enc.init({"params": RNG}, x)
    assert enc.apply(variables, x).shape == (1, 1024)


def test_space_to_depth_stem_matches_direct_conv():
    """s2d conv1 must be numerically identical to the direct 7x7/s2 conv
    with the SAME parameters (checkpoint-compatible)."""
    from bevfusion_multimodal_3d_object_detection_tpu.models.resnet import (
        ResNet18Trunk,
    )

    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 64, 3), jnp.float32
    )
    direct = ResNet18Trunk(space_to_depth=False)
    s2d = ResNet18Trunk(space_to_depth=True)
    variables = direct.init({"params": RNG}, x)
    a = np.asarray(direct.apply(variables, x, train=False))
    b = np.asarray(s2d.apply(variables, x, train=False))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_remat_trunk_matches_and_backprops():
    """remat=True must give identical outputs and gradients (only the
    backward memory schedule changes)."""
    from bevfusion_multimodal_3d_object_detection_tpu.models.resnet import (
        ResNet18Trunk,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 64, 3), jnp.float32)
    plain = ResNet18Trunk(remat=False)
    remat = ResNet18Trunk(remat=True)
    variables = plain.init({"params": RNG}, x)

    def loss(mod, v):
        return lambda p: jnp.sum(
            mod.apply({"params": p, "batch_stats": v["batch_stats"]}, x,
                      train=False) ** 2
        )

    l_plain, g_plain = jax.value_and_grad(loss(plain, variables))(
        variables["params"]
    )
    l_remat, g_remat = jax.value_and_grad(loss(remat, variables))(
        variables["params"]
    )
    np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_remat)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )
