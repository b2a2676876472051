"""Geometric camera-to-BEV splat ops."""

import numpy as np
import jax
import jax.numpy as jnp

from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
    bev_scatter_add,
    lift_splat,
    precompute_frustum_cells,
)


def test_scatter_add_accumulates_and_drops():
    feat = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]]])  # (1,3,2)
    ids = jnp.asarray([[1, 1, -1]])  # two into cell 1, one dropped
    out = np.asarray(bev_scatter_add(feat, ids, num_cells=4))
    np.testing.assert_allclose(out[0, 1], [4.0, 6.0])
    np.testing.assert_allclose(out[0, 0], 0.0)
    np.testing.assert_allclose(out.sum(), 10.0)  # the (10,20) row dropped


def test_frustum_cells_geometry():
    """A pixel ray straight ahead at depth d must land d meters in front of
    the sensor."""
    intr = np.array([[100.0, 0, 32.0], [0, 100.0, 16.0], [0, 0, 1.0]])
    # camera->lidar: camera z-forward becomes lidar x-forward
    rot = np.array([[0, 0, 1.0], [-1.0, 0, 0], [0, -1.0, 0]])
    trans = np.zeros(3)
    depths = np.array([10.0, 30.0])
    cells = precompute_frustum_cells(
        intr, rot, trans,
        feat_hw=(32, 64), image_hw=(32, 64),
        depth_bins=depths, bev_hw=(50, 50),
        pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    )
    assert cells.shape == (2, 32, 64)
    # principal-point pixel: u=32, v=16 -> feature pixel (16, 32) with +0.5
    # center ~ on axis; at depth 10 the lidar point is (10, ~0)
    cell = cells[0, 15, 31]
    iy, ix = divmod(int(cell), 50)
    # world (10, 0) -> pixel x = (10+51.2)/2.048 = 29.9 -> 29; y = 25
    assert ix == 29 and iy in (24, 25)
    # out-of-range depths give -1 somewhere (edges of image at far depth)
    far = precompute_frustum_cells(
        intr, rot, trans, (32, 64), (32, 64), np.array([200.0]),
        (50, 50), (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    )
    assert (far == -1).any()


def test_lift_splat_mass_conservation():
    """With all cells in range, total splatted mass equals total feature mass
    (depth softmax sums to 1 per pixel)."""
    rng = np.random.RandomState(0)
    b, fh, fw, c, d = 2, 4, 4, 3, 5
    feats = jnp.asarray(rng.rand(b, fh, fw, c), jnp.float32)
    logits = jnp.asarray(rng.randn(b, fh, fw, d), jnp.float32)
    cells = jnp.asarray(rng.randint(0, 25, (d, fh, fw)), jnp.int32)
    out = np.asarray(lift_splat(feats, logits, cells, num_cells=25))
    assert out.shape == (b, 25, c)
    np.testing.assert_allclose(
        out.sum(axis=1), np.asarray(feats).sum(axis=(1, 2)), rtol=1e-4
    )


def test_geometric_camera_bev_module():
    import jax
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        BEVFusionSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models.fusion import (
        GeometricCameraBEV,
    )

    spec = BEVFusionSpec(bev_h=10, bev_w=10, bev_channels=16, depth_bins=4)
    mod = GeometricCameraBEV(spec=spec)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, 2, 3, 5, 8), jnp.float32)  # B,N,H,W,C
    cells = jnp.asarray(rng.randint(-1, 100, (1, 2, 4, 3, 5)), jnp.int32)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, feats, cells)
    out = mod.apply(variables, feats, cells)
    assert out.shape == (1, 10, 10, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_geometric_bev_through_detector_and_train_step():
    """camera_to_bev='geometric': frustum cells flow through the detector
    forward AND the jitted train step."""
    import dataclasses

    import jax
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        TrainSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer
    from conftest import TINY_IMAGE, tiny_batch, TINY_POINTS, TINY_RADAR_POINTS
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        BEVFusionSpec,
        CameraEncoderSpec,
        DetectorSpec,
        LidarEncoderSpec,
        RadarEncoderSpec,
    )

    spec = DetectorSpec(
        camera=CameraEncoderSpec(image_size=TINY_IMAGE),
        lidar=LidarEncoderSpec(max_points=TINY_POINTS),
        radar=RadarEncoderSpec(max_points_per_sensor=TINY_RADAR_POINTS),
        bev=BEVFusionSpec(camera_to_bev="geometric", depth_bins=4),
    )
    model = MultiModal3DDetector(spec=spec)
    batch = tiny_batch()
    rng = np.random.RandomState(0)
    fh, fw = TINY_IMAGE[0] // 16, TINY_IMAGE[1] // 16
    batch["camera_cells"] = rng.randint(
        -1, 2500, (2, 6, 4, fh, fw)
    ).astype(np.int32)

    trainer = Trainer(model, TrainSpec(batch_size=2), CompatFlags())
    trainer.init_state(batch)
    assert "geometric_camera_bev" in trainer.state.params["fusion"]
    state, losses = trainer.train_step(trainer.state, batch, trainer.rng)
    assert np.isfinite(float(losses["total_loss"]))
    decoded = trainer.eval_step(state, batch)
    assert np.asarray(decoded["boxes"]).shape[-1] == 7


def test_lift_splat_matmul_matches_scatter():
    """The scalar-prob-scatter + MXU-matmul formulation equals the naive
    lifted-tensor scatter-add up to float summation order."""
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
        lift_splat,
        lift_splat_matmul,
        lift_splat_matmul_rows,
    )

    rng = np.random.RandomState(7)
    b, fh, fw, c, d, num_cells = 2, 4, 6, 16, 5, 100
    feats = rng.randn(b, fh, fw, c).astype(np.float32)
    logits = rng.randn(b, fh, fw, d).astype(np.float32)
    cells = rng.randint(-1, num_cells, (d, fh, fw)).astype(np.int32)

    want = np.asarray(
        lift_splat(jnp.asarray(feats), jnp.asarray(logits),
                   jnp.asarray(cells), num_cells)
    )
    got = np.asarray(
        lift_splat_matmul(jnp.asarray(feats), jnp.asarray(logits),
                          jnp.asarray(cells), num_cells)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # per-row-plan variant with differing calibrations per row
    cells_rows = rng.randint(
        -1, num_cells, (b, d * fh * fw)
    ).astype(np.int32)
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
        bev_scatter_add,
    )

    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    lifted = np.einsum("xhwc,xhwd->xdhwc", feats, probs).reshape(
        b, d * fh * fw, c
    )
    want_rows = np.asarray(
        bev_scatter_add(
            jnp.asarray(lifted), jnp.asarray(cells_rows), num_cells
        )
    )
    got_rows = np.asarray(
        lift_splat_matmul_rows(
            jnp.asarray(feats), jnp.asarray(logits),
            jnp.asarray(cells_rows), num_cells,
        )
    )
    np.testing.assert_allclose(got_rows, want_rows, atol=1e-5, rtol=1e-5)


def test_lift_splat_culled_matches_matmul():
    """The calibration-time culled + (cell, pixel)-deduped plan reproduces
    `lift_splat_matmul_rows` exactly up to float summation order — both the
    dense sorted-unique-scatter formulation and the gather+segment-sum one
    (VERDICT r03 #3)."""
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
        lift_splat_culled_gather_rows,
        lift_splat_culled_rows,
        lift_splat_matmul_rows,
        precompute_culled_pairs,
    )

    rng = np.random.RandomState(11)
    x, fh, fw, c, d, num_cells = 3, 4, 6, 16, 7, 100
    hw = fh * fw
    feats = rng.randn(x, fh, fw, c).astype(np.float32)
    logits = rng.randn(x, fh, fw, d).astype(np.float32)
    # ~60% out of range, many duplicate (cell, pixel) pairs (small cell pool)
    cells_rows = np.where(
        rng.rand(x, d * hw) < 0.6,
        -1,
        rng.randint(0, num_cells, (x, d * hw)),
    ).astype(np.int32)

    plans = [
        precompute_culled_pairs(
            cells_rows[i], hw, num_cells, pad_multiple=64
        )
        for i in range(x)
    ]
    t_cap = max(p["seg_idx"].shape[0] for p in plans)
    u_cap = max(p["pair_cell"].shape[0] for p in plans)
    plans = [
        precompute_culled_pairs(
            cells_rows[i], hw, num_cells,
            point_capacity=t_cap, pair_capacity=u_cap,
        )
        for i in range(x)
    ]
    stack = lambda k: jnp.asarray(np.stack([p[k] for p in plans]))

    want = np.asarray(
        lift_splat_matmul_rows(
            jnp.asarray(feats), jnp.asarray(logits),
            jnp.asarray(cells_rows), num_cells,
        )
    )
    for fn in (lift_splat_culled_rows, lift_splat_culled_gather_rows):
        got = np.asarray(
            fn(
                jnp.asarray(feats), jnp.asarray(logits),
                stack("seg_idx"), stack("seg_id"),
                stack("pair_cell"), stack("pair_pix"),
                num_cells,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # the plan actually culls: fewer points than the full frustum stream,
    # and dedup leaves at most one pair per surviving (cell, pixel)
    assert plans[0]["n_points"] < d * hw
    assert plans[0]["n_pairs"] <= plans[0]["n_points"]

    # capacity overflow is a hard error, never a silent drop
    import pytest

    with pytest.raises(ValueError, match="capacity"):
        precompute_culled_pairs(
            cells_rows[0], hw, num_cells, point_capacity=1
        )


def test_geometric_pallas_splat_matches_matmul():
    """splat_mode='pallas' + chunk plans through GeometricCameraBEV equals
    the matmul formulation; during train=True it falls back to matmul
    exactly (the pallas path is inference-only: no VJP)."""
    import jax
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        BEVFusionSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models.fusion import (
        GeometricCameraBEV,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_pool_pallas import (
        precompute_bev_chunks,
    )

    rng = np.random.RandomState(7)
    b, n, fh, fw, c, d = 1, 2, 4, 6, 8, 5
    num_cells = 100
    feats = jnp.asarray(rng.rand(b, n, fh, fw, c), jnp.float32)
    cells_np = rng.randint(-1, num_cells, (b, n, d, fh, fw)).astype(np.int32)
    cells = jnp.asarray(cells_np)

    spec_mm = BEVFusionSpec(
        bev_h=10, bev_w=10, bev_channels=16, depth_bins=d,
        splat_mode="matmul",
    )
    spec_pl = BEVFusionSpec(
        bev_h=10, bev_w=10, bev_channels=16, depth_bins=d,
        splat_mode="pallas",
    )
    mod_mm = GeometricCameraBEV(spec=spec_mm)
    mod_pl = GeometricCameraBEV(spec=spec_pl)
    variables = mod_mm.init({"params": jax.random.PRNGKey(0)}, feats, cells)

    plans = [
        precompute_bev_chunks(cells_np[0, i].reshape(-1), num_cells)
        for i in range(n)
    ]
    chunks = tuple(
        jnp.asarray(np.stack([p[k] for p in plans]))[None]
        for k in ("point_idx", "local_ids", "block_idx")
    )

    want = mod_mm.apply(variables, feats, cells)
    got = mod_pl.apply(variables, feats, cells, camera_chunks=chunks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )
    # train=True: must not touch the pallas path (mutable BN stats updated,
    # gradients well-defined) — output equals the matmul train path
    want_tr, _ = mod_mm.apply(
        variables, feats, cells, train=True, mutable=["batch_stats"]
    )
    got_tr, _ = mod_pl.apply(
        variables, feats, cells, train=True, camera_chunks=chunks,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(got_tr), np.asarray(want_tr), atol=1e-5
    )


def test_geometric_culled_splat_matches_matmul_module():
    """splat_mode='culled' + pair plans through GeometricCameraBEV equals
    the matmul formulation, in BOTH eval and train (the culled path is
    differentiable, unlike pallas)."""
    import jax
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        BEVFusionSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models.fusion import (
        GeometricCameraBEV,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
        precompute_culled_pairs,
    )

    rng = np.random.RandomState(3)
    b, n, fh, fw, c, d = 1, 2, 4, 6, 8, 5
    hw = fh * fw
    num_cells = 100
    feats = jnp.asarray(rng.rand(b, n, fh, fw, c), jnp.float32)
    cells_np = rng.randint(-1, num_cells, (b, n, d, fh, fw)).astype(np.int32)
    cells = jnp.asarray(cells_np)

    spec_mm = BEVFusionSpec(
        bev_h=10, bev_w=10, bev_channels=16, depth_bins=d,
        splat_mode="matmul",
    )
    spec_cu = BEVFusionSpec(
        bev_h=10, bev_w=10, bev_channels=16, depth_bins=d,
        splat_mode="culled",
    )
    mod_mm = GeometricCameraBEV(spec=spec_mm)
    mod_cu = GeometricCameraBEV(spec=spec_cu)
    variables = mod_mm.init({"params": jax.random.PRNGKey(0)}, feats, cells)

    plans = [
        precompute_culled_pairs(
            cells_np[0, i].reshape(-1), hw, num_cells,
            point_capacity=d * hw, pair_capacity=d * hw,
        )
        for i in range(n)
    ]
    pairs = tuple(
        jnp.asarray(np.stack([p[k] for p in plans]))[None]
        for k in ("seg_idx", "seg_id", "pair_cell", "pair_pix")
    )

    want = mod_mm.apply(variables, feats, cells)
    # the culled branch never reads camera_cells — pass None like the
    # dataset does in culled mode
    got = mod_cu.apply(variables, feats, None, camera_pairs=pairs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )

    want_tr, _ = mod_mm.apply(
        variables, feats, cells, train=True, mutable=["batch_stats"]
    )
    got_tr, _ = mod_cu.apply(
        variables, feats, None, train=True, camera_pairs=pairs,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(got_tr), np.asarray(want_tr), atol=1e-4, rtol=1e-4
    )

    # gradients flow through the culled splat (pallas can't do this)
    def loss_fn(v):
        return jnp.sum(
            mod_cu.apply(v, feats, None, camera_pairs=pairs) ** 2
        )

    g = jax.grad(loss_fn)(variables)
    gnorm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_dataset_pair_plans_and_culled_train_step(tmp_path):
    """splat_mode: culled end-to-end: the dataset emits pair plans for
    EVERY split (differentiable path), omits raw camera_cells, and the
    jitted train step consumes them."""
    from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
        write_synthetic_infos,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data.dataset import (
        NuScenesDataset,
    )

    root = str(tmp_path / "nusc")
    write_synthetic_infos(root, samples_per_split=2)
    # back the infos with real tiny files so __getitem__ can load samples
    import pickle

    from PIL import Image

    rng = np.random.RandomState(0)
    with open(f"{root}/nuscenes_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)["infos"]
    for info in infos:
        (rng.randn(64, 5).astype(np.float32)).tofile(info["lidar_path"])
        for cam in info["cams"].values():
            Image.fromarray(
                rng.randint(0, 255, (36, 60, 3), np.uint8)
            ).save(f"{root}/{cam['filename']}")
    config = {
        "dataset": {
            "data_root": root,
            "cameras": {"image_size": [32, 64]},
            "max_points": {"lidar": 64, "radar_per_sensor": 8},
        },
        "model": {
            "bev_fusion": {
                "camera_to_bev": "geometric",
                "splat_mode": "culled",
                "depth_bins": 4,
            }
        },
    }
    ds = NuScenesDataset(data_root=root, split="train", config=config)
    assert ds.return_camera_pairs and not ds.return_camera_cells
    s = ds[0]
    assert "camera_cells" not in s
    n_cam = s["camera_seg_idx"].shape[0]
    assert s["camera_seg_idx"].shape == s["camera_seg_id"].shape
    assert s["camera_pair_cell"].shape == s["camera_pair_pix"].shape
    assert s["camera_seg_idx"].shape[0] == n_cam
    # capacities are static across samples
    s1 = ds[1]
    assert s1["camera_seg_idx"].shape == s["camera_seg_idx"].shape
    assert s1["camera_pair_cell"].shape == s["camera_pair_cell"].shape

    # one jitted train step consumes the pair plans (differentiable path)
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        DetectorSpec,
        TrainSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer

    spec = DetectorSpec.from_config(config)
    assert spec.bev.splat_mode == "culled"
    model = MultiModal3DDetector(spec=spec)

    # through the REAL collate so a regression dropping the pair-plan keys
    # from the batch (as an early version did) fails here
    from bevfusion_multimodal_3d_object_detection_tpu.data.dataset import (
        collate_fn,
    )

    batch = collate_fn([s, s1], max_objects=8)
    batch.pop("tokens")
    for k in ("camera_seg_idx", "camera_seg_id",
              "camera_pair_cell", "camera_pair_pix"):
        assert k in batch and batch[k].shape[0] == 2, k
    trainer = Trainer(model, TrainSpec(batch_size=2), CompatFlags())
    trainer.init_state(batch)
    _, losses = trainer.train_step(trainer.state, batch, trainer.rng)
    assert np.isfinite(float(losses["total_loss"]))


def test_dataset_chunk_plans_roundtrip():
    """return_camera_chunks: plans match a direct precompute from the
    sample's own camera_cells and are cached across samples."""
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_pool_pallas import (
        precompute_bev_chunks,
    )

    class _FakeDS:
        bev_h, bev_w = 10, 10
        _chunk_cache = {}

    from bevfusion_multimodal_3d_object_detection_tpu.data.dataset import (
        NuScenesDataset,
    )

    rng = np.random.RandomState(0)
    cells = rng.randint(-1, 100, (2, 3, 4, 6)).astype(np.int32)
    ds = _FakeDS()
    plans = NuScenesDataset._chunk_plans(ds, cells)
    want = precompute_bev_chunks(cells[1].reshape(-1), 100)
    np.testing.assert_array_equal(plans["point_idx"][1], want["point_idx"])
    np.testing.assert_array_equal(plans["local_ids"][1], want["local_ids"])
    np.testing.assert_array_equal(plans["block_idx"][1], want["block_idx"])
    assert len(ds._chunk_cache) == 2
    # second call hits the cache (same arrays)
    plans2 = NuScenesDataset._chunk_plans(ds, cells)
    np.testing.assert_array_equal(
        plans2["point_idx"], plans["point_idx"]
    )
    assert len(ds._chunk_cache) == 2


def test_chunk_plans_skipped_for_train_split(tmp_path):
    """splat_mode: pallas emits chunk plans only for non-train splits — the
    Pallas splat is inference-only, and a train batch must not ship dead
    multi-MB int32 plans to the device every step."""
    from bevfusion_multimodal_3d_object_detection_tpu.data.converter import (
        write_synthetic_infos,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.data.dataset import (
        NuScenesDataset,
    )

    root = str(tmp_path / "nusc")
    write_synthetic_infos(root, samples_per_split=2)
    config = {
        "dataset": {"data_root": root},
        "model": {
            "bev_fusion": {
                "camera_to_bev": "geometric",
                "splat_mode": "pallas",
                "depth_bins": 4,
            }
        },
    }
    train_ds = NuScenesDataset(data_root=root, split="train", config=config)
    val_ds = NuScenesDataset(data_root=root, split="val", config=config)
    assert train_ds.return_camera_cells and val_ds.return_camera_cells
    assert not train_ds.return_camera_chunks
    assert val_ds.return_camera_chunks
