"""Device-side batched preprocessing ops."""

import numpy as np
import jax
import jax.numpy as jnp

from bevfusion_multimodal_3d_object_detection_tpu.ops.preprocess import (
    filter_pad_points,
    normalize_images,
    preprocess_radar_noise,
)

PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def test_normalize_images_matches_host_math():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (2, 3, 8, 10, 3), np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img), size=(8, 10)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    want = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_normalize_images_resizes():
    img = np.zeros((1, 2, 6, 8, 3), np.uint8)
    out = normalize_images(jnp.asarray(img), size=(12, 16))
    assert out.shape == (1, 2, 12, 16, 3)


def test_filter_pad_points_packs_and_pads():
    pts = np.zeros((1, 6, 5), np.float32)
    pts[0, 0] = [10, 10, 0, 1, 9]      # valid
    pts[0, 1] = [999, 0, 0, 2, 9]      # out of range x
    pts[0, 2] = [-20, 30, -1, 3, 9]    # valid
    pts[0, 3] = [0, 0, -10, 4, 9]      # out of range z
    pts[0, 4] = [51.2, 0, 0, 5, 9]     # boundary: excluded (strict <)
    pts[0, 5] = [1, 1, 1, 6, 9]        # valid
    out = np.asarray(
        filter_pad_points(jnp.asarray(pts), max_points=8, out_channels=4,
                          pc_range=PC_RANGE)
    )
    assert out.shape == (1, 8, 4)
    np.testing.assert_allclose(out[0, 0], [10, 10, 0, 1])
    np.testing.assert_allclose(out[0, 1], [-20, 30, -1, 3])
    np.testing.assert_allclose(out[0, 2], [1, 1, 1, 6])
    np.testing.assert_allclose(out[0, 3:], 0.0)


def test_filter_pad_points_subsample_with_key():
    rng = np.random.RandomState(1)
    pts = (rng.randn(2, 500, 4) * 10).astype(np.float32)
    out = np.asarray(
        filter_pad_points(
            jnp.asarray(pts), max_points=64, out_channels=4,
            pc_range=PC_RANGE, key=jax.random.PRNGKey(0),
        )
    )
    assert out.shape == (2, 64, 4)
    # all rows must be real (500 in-range gaussian pts >> 64)
    # tolist() gives exact f64 representations of the same f32 values
    src = {tuple(r) for r in pts[0].reshape(-1, 4).tolist()}
    for row in out[0].tolist():
        assert tuple(row) in src


def test_radar_noise_shape():
    out = preprocess_radar_noise(jax.random.PRNGKey(0), batch=3)
    assert out.shape == (3, 5, 125, 7)


def test_jpeg_draft_decode_close_to_full_decode(tmp_path):
    """dataset.jpeg_draft_decode (opt-in loader speedup): reduced-DCT-scale
    JPEG decode + bilinear must land within JPEG-noise distance of the full
    decode + resize path, and be a no-op when no downscale is possible."""
    import numpy as np
    from PIL import Image

    from bevfusion_multimodal_3d_object_detection_tpu.data.dataset import (
        _decode_image,
    )

    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:256, 0:512]
    img = np.clip(
        (yy * 0.7 + xx * 0.4)[..., None] % 256
        + rng.randint(0, 25, (256, 512, 3)),
        0, 255,
    ).astype(np.uint8)
    path = tmp_path / "cam.jpg"
    Image.fromarray(img).save(path, quality=90)

    full = np.asarray(_decode_image(path, 64, 128, draft=False), np.float32)
    draft = np.asarray(_decode_image(path, 64, 128, draft=True), np.float32)
    assert full.shape == draft.shape == (64, 128, 3)
    assert np.mean(np.abs(full - draft)) < 4.0  # JPEG-noise scale, not content

    # upscale target: draft cannot help and must not distort
    full_up = np.asarray(
        _decode_image(path, 300, 600, draft=False), np.float32
    )
    draft_up = np.asarray(
        _decode_image(path, 300, 600, draft=True), np.float32
    )
    np.testing.assert_array_equal(full_up, draft_up)
