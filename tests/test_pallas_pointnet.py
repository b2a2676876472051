"""Fused PointNet Pallas kernel vs the XLA encoder (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bevfusion_multimodal_3d_object_detection_tpu.config import (
    LidarEncoderSpec,
)
from bevfusion_multimodal_3d_object_detection_tpu.models.encoders import (
    PointNetLiDAREncoder,
)
from bevfusion_multimodal_3d_object_detection_tpu.ops.pointnet_pallas import (
    fold_bn_into_dense,
    fused_pointnet,
    pointnet_encode_folded,
)

RNG = jax.random.PRNGKey(0)


def test_fold_bn_identity():
    k = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
    b = jnp.zeros(8)
    # identity BN: scale 1, bias 0, mean 0, var 1
    k2, b2 = fold_bn_into_dense(
        k, b, jnp.ones(8), jnp.zeros(8), jnp.zeros(8), jnp.ones(8) - 1e-5
    )
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), 0.0, atol=1e-6)


@pytest.mark.parametrize("mask_padding", [False, True])
def test_fused_pointnet_matches_xla_encoder(mask_padding):
    spec = LidarEncoderSpec(
        max_points=128, mlp_layers=(16, 32, 64), input_channels=4
    )
    enc = PointNetLiDAREncoder(spec=spec, mask_padding=mask_padding)
    x = np.random.RandomState(0).randn(2, 128, 4).astype(np.float32)
    x[0, 64:] = 0.0  # padding
    variables = enc.init({"params": RNG}, jnp.asarray(x))
    want = np.asarray(
        enc.apply(variables, jnp.asarray(x), train=False)
    )

    got = np.asarray(
        pointnet_encode_folded(
            jnp.asarray(x),
            variables["params"]["point_mlp"],
            variables["batch_stats"]["point_mlp"],
            num_layers=3,
            mask_padding=mask_padding,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_fused_pointnet_block_splitting():
    """Result must be independent of the block size (running-max accumulation
    across grid steps)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 4), jnp.float32)
    ws = [jnp.asarray(rng.randn(4, 16) * 0.5, jnp.float32),
          jnp.asarray(rng.randn(16, 32) * 0.5, jnp.float32)]
    bs = [jnp.asarray(rng.randn(16), jnp.float32),
          jnp.asarray(rng.randn(32), jnp.float32)]
    a = fused_pointnet(x, ws, bs, block_points=64, interpret=True)
    b = fused_pointnet(x, ws, bs, block_points=16, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_fused_pointnet_pads_ragged_n():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 100, 4), jnp.float32)  # not divisible
    ws = [jnp.asarray(rng.randn(4, 16) * 0.5, jnp.float32)]
    bs = [jnp.asarray(rng.randn(16), jnp.float32)]
    out = fused_pointnet(x, ws, bs, block_points=64, interpret=True)
    assert out.shape == (1, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_pallas_infer_flag_matches_xla():
    """PointNetLiDAREncoder(use_pallas_infer=True) must produce the same
    features as the XLA path with the same params (eval mode)."""
    spec = LidarEncoderSpec(
        max_points=128, mlp_layers=(16, 32), input_channels=4
    )
    x = jnp.asarray(
        np.random.RandomState(3).randn(2, 128, 4), jnp.float32
    )
    ref_enc = PointNetLiDAREncoder(spec=spec)
    variables = ref_enc.init({"params": RNG}, x)
    want = np.asarray(ref_enc.apply(variables, x, train=False))

    fast_enc = PointNetLiDAREncoder(spec=spec, use_pallas_infer=True)
    got = np.asarray(fast_enc.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
