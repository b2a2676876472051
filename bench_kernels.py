#!/usr/bin/env python
"""Kernel-level TPU benchmarks (VERDICT r1 items 4/7/8):

  python bench_kernels.py [pointnet] [bevpool] [foldbn] [trunk]

- pointnet: fused Pallas PointNet (ops/pointnet_pallas.py) vs the XLA path,
  35k points, batches 8..128.
- bevpool:  Pallas BEVPool v2 (ops/bev_pool_pallas.py) vs XLA scatter-add
  (ops/bev_splat.py), 50x50 and 100x100 grids, D=40.
- foldbn:   camera trunk with/without serving-graph BN folding.
- trunk:    ResNet trunk step time at the production shape (roofline point).

Prints one human line per measurement plus a JSON summary to stderr-free
stdout at the end. Run with BMOD_PLATFORM unset (TPU) — CPU runs are
meaningless for these comparisons.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _sync(x) -> float:
    return float(np.asarray(x).ravel()[0])


def _time(fn, *args, warmup=2, iters=10) -> float:
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_pointnet(results):
    import jax
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        LidarEncoderSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models.encoders import (
        PointNetLiDAREncoder,
    )

    spec = LidarEncoderSpec(max_points=35000)
    rng = jax.random.PRNGKey(0)
    for use_pallas in (False, True):
        enc = PointNetLiDAREncoder(
            spec=spec, dtype=jnp.bfloat16, use_pallas_infer=use_pallas
        )
        for bs in (8, 32, 128):
            x = jax.random.normal(rng, (bs, 35000, 4), jnp.bfloat16)
            variables = enc.init({"params": rng}, x[:1])
            fn = jax.jit(lambda v, x: jnp.sum(enc.apply(v, x, train=False)))
            try:
                dt = _time(fn, variables, x)
            except Exception as e:
                print(f"# pointnet pallas={use_pallas} bs={bs} FAILED: {e}")
                continue
            key = f"pointnet_{'pallas' if use_pallas else 'xla'}_b{bs}"
            results[key] = dt * 1e3
            print(f"# {key}: {dt * 1e3:.3f} ms ({bs / dt:.0f} samples/s)")


def bench_bevpool(results):
    import jax
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_pool_pallas import (
        bev_pool_rows,
        precompute_bev_chunks,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
        bev_scatter_add,
        precompute_frustum_cells,
    )

    rs = np.random.RandomState(0)
    d, fh, fw, c = 40, 28, 50, 256
    p = d * fh * fw
    rows = 6  # cameras
    # realistic frustum ids from a synthetic calibration
    intr = np.array([[1200.0, 0, 800], [0, 1200.0, 450], [0, 0, 1]])
    cells_grid = {}
    for bev in (50, 100):
        cells = precompute_frustum_cells(
            intr, np.eye(3), np.zeros(3), (fh, fw), (448, 800),
            np.linspace(1.0, 60.0, d), (bev, bev),
            (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        ).reshape(-1)
        cells_grid[bev] = cells

    for bev in (50, 100):
        num_cells = bev * bev
        ids = cells_grid[bev]
        feats = jnp.asarray(
            rs.randn(rows, p, c).astype(np.float32)
        )
        ids_rows = jnp.asarray(np.broadcast_to(ids, (rows, p)).copy())

        xla = jax.jit(
            lambda f, i: jnp.sum(bev_scatter_add(f, i, num_cells))
        )
        dt = _time(xla, feats, ids_rows)
        results[f"bevpool_xla_{bev}x{bev}"] = dt * 1e3
        print(f"# bevpool_xla_{bev}x{bev}: {dt * 1e3:.3f} ms")

        plan = precompute_bev_chunks(ids, num_cells)
        pi = jnp.asarray(np.broadcast_to(
            plan["point_idx"], (rows,) + plan["point_idx"].shape).copy())
        li = jnp.asarray(np.broadcast_to(
            plan["local_ids"], (rows,) + plan["local_ids"].shape).copy())
        ba = jnp.asarray(np.broadcast_to(
            plan["block_idx"], (rows,) + plan["block_idx"].shape).copy())

        pallas_fn = jax.jit(
            lambda f, a, b, cc: jnp.sum(
                bev_pool_rows(
                    f, a, b, cc,
                    num_cells=num_cells,
                    num_cells_pad=plan["num_cells_pad"],
                )
            )
        )
        try:
            dt = _time(pallas_fn, feats, pi, li, ba)
            results[f"bevpool_pallas_{bev}x{bev}"] = dt * 1e3
            print(f"# bevpool_pallas_{bev}x{bev}: {dt * 1e3:.3f} ms")
        except Exception as e:
            print(f"# bevpool_pallas_{bev}x{bev} FAILED: {e}")


def bench_liftsplat(results):
    """The three geometric lift-splat formulations at production shapes
    (ROADMAP #2 / VERDICT r02 item 4): naive lifted-tensor scatter, the
    shipped scalar-scatter+matmul, and the fused weighted Pallas pool."""
    import jax
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_pool_pallas import (
        bev_pool_weighted_rows,
        precompute_bev_chunks,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.ops.bev_splat import (
        lift_splat,
        lift_splat_matmul_rows,
        precompute_frustum_cells,
    )

    rs = np.random.RandomState(0)
    d, fh, fw, c = 40, 28, 50, 256
    hw = fh * fw
    rows = 6  # cameras of one sample
    bev = 50
    num_cells = bev * bev
    intr = np.array([[1200.0, 0, 800], [0, 1200.0, 450], [0, 0, 1]])
    cells = precompute_frustum_cells(
        intr, np.eye(3), np.zeros(3), (fh, fw), (448, 800),
        np.linspace(1.0, 60.0, d), (bev, bev),
        (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    )  # (D, H', W')

    feats = jnp.asarray(rs.randn(rows, fh, fw, c).astype(np.float32))
    logits = jnp.asarray(rs.randn(rows, fh, fw, d).astype(np.float32))
    cells_rows = jnp.asarray(
        np.broadcast_to(cells.reshape(1, -1), (rows, d * hw)).copy()
    )

    naive = jax.jit(
        lambda f, l: jnp.sum(lift_splat(f, l, jnp.asarray(cells), num_cells))
    )
    dt = _time(naive, feats, logits)
    results["liftsplat_scatter_ms"] = dt * 1e3
    print(f"# liftsplat_scatter (6 cams): {dt * 1e3:.3f} ms")

    matmul = jax.jit(
        lambda f, l, i: jnp.sum(lift_splat_matmul_rows(f, l, i, num_cells))
    )
    dt = _time(matmul, feats, logits, cells_rows)
    results["liftsplat_matmul_ms"] = dt * 1e3
    print(f"# liftsplat_matmul (6 cams): {dt * 1e3:.3f} ms")

    plan = precompute_bev_chunks(cells.reshape(-1), num_cells)
    pi = jnp.asarray(np.broadcast_to(
        plan["point_idx"], (rows,) + plan["point_idx"].shape).copy())
    li = jnp.asarray(np.broadcast_to(
        plan["local_ids"], (rows,) + plan["local_ids"].shape).copy())
    bi = jnp.asarray(np.broadcast_to(
        plan["block_idx"], (rows,) + plan["block_idx"].shape).copy())

    def pallas_fused(f, l, a, b, cc):
        probs = jax.nn.softmax(l, axis=-1)  # (X, H, W, D)
        w = jnp.transpose(probs, (0, 3, 1, 2)).reshape(rows, d * hw)
        return jnp.sum(
            bev_pool_weighted_rows(
                f.reshape(rows, hw, c), w, a, b, cc,
                num_cells=num_cells,
                num_cells_pad=plan["num_cells_pad"],
            )
        )

    try:
        fn = jax.jit(pallas_fused)
        dt = _time(fn, feats, logits, pi, li, bi)
        results["liftsplat_pallas_ms"] = dt * 1e3
        print(f"# liftsplat_pallas (6 cams): {dt * 1e3:.3f} ms")
    except Exception as e:
        print(f"# liftsplat_pallas FAILED: {e}")


def bench_foldbn(results):
    import jax
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CameraEncoderSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models.encoders import (
        ResNetCameraEncoder,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.utils.fold_bn import (
        fold_bn_params,
    )

    rng = jax.random.PRNGKey(0)
    spec = CameraEncoderSpec(image_size=(448, 800))
    x = jax.random.normal(rng, (32, 448, 800, 3), jnp.bfloat16)

    enc = ResNetCameraEncoder(spec=spec, dtype=jnp.bfloat16)
    variables = enc.init({"params": rng}, x[:1])
    plain = jax.jit(lambda v, x: jnp.sum(enc.apply(v, x, train=False)))
    dt = _time(plain, variables, x)
    results["camera_trunk_bn_b32"] = dt * 1e3
    print(f"# camera_trunk_bn_b32: {dt * 1e3:.2f} ms")

    folded_params = fold_bn_params(
        variables["params"], variables["batch_stats"]
    )
    enc_f = ResNetCameraEncoder(spec=spec, dtype=jnp.bfloat16, fold_bn=True)
    folded = jax.jit(
        lambda p, x: jnp.sum(enc_f.apply({"params": p}, x, train=False))
    )
    dt = _time(folded, folded_params, x)
    results["camera_trunk_folded_b32"] = dt * 1e3
    print(f"# camera_trunk_folded_b32: {dt * 1e3:.2f} ms")


def bench_trunk_stages(results):
    """Per-stage camera-trunk attribution at the production shape (VERDICT
    r02 item 3: where do the 14 ms at b=32 go?). Times nested prefixes of
    the trunk (stem, stem+stage1, ...) and reports per-stage delta ms, XLA
    cost-analysis FLOPs, and the implied MXU utilization (v5e bf16 peak
    ~197 TFLOP/s)."""
    import jax
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.models.resnet import (
        ResNet18Trunk,
    )

    b, h, w = 192, 448, 800  # 32 samples x 6 cameras
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, h, w, 3), jnp.bfloat16)

    # nested trunk prefixes truncated via stage_sizes; stage deltas between
    # consecutive prefixes attribute time/FLOPs to each stage
    full_stages = (2, 2, 2)
    chans = (64, 128, 256)
    prev_ms = 0.0
    prev_flops = 0.0
    peak = 197e12  # v5e bf16
    for k in range(0, len(full_stages) + 1):
        model = ResNet18Trunk(
            dtype=jnp.bfloat16,
            stage_sizes=full_stages[:k],
            stage_channels=chans[:k],
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, x[:1])
        fn = jax.jit(lambda v, xx: jnp.sum(model.apply(v, xx)))
        lowered = fn.lower(variables, x)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        dt = _time(fn, variables, x)
        name = "stem" if k == 0 else f"stage{k}"
        d_ms = dt * 1e3 - prev_ms
        d_fl = flops - prev_flops
        mfu = d_fl / (d_ms * 1e-3) / peak if d_ms > 0 else 0.0
        results[f"trunk_{name}_cum_ms"] = dt * 1e3
        results[f"trunk_{name}_delta_ms"] = d_ms
        results[f"trunk_{name}_mfu"] = mfu
        print(
            f"# trunk upto {name}: {dt * 1e3:.2f} ms cumulative, "
            f"+{d_ms:.2f} ms, {d_fl / 1e9:.1f} GFLOP delta, "
            f"{100 * mfu:.1f}% MXU util"
        )
        prev_ms = dt * 1e3
        prev_flops = flops


def bench_model_stages(results):
    """End-to-end flagship attribution at b=32 bf16: per-submodule times
    (camera/lidar/radar encoders, fusion, head, decode) alongside the full
    forward+decode, so the non-trunk share of the inference budget is
    measured rather than inferred (trunkstages covers inside the trunk)."""
    import jax
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        DetectorSpec,
        load_config,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models.encoders import (
        MultiRadarEncoder,
        PointNetLiDAREncoder,
        ResNetCameraEncoder,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models.fusion import (
        FlexibleBEVFusion,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models.heads import (
        CenterNetHead,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.ops.decode import (
        decode_centernet_predictions,
    )

    cfg = load_config("configs/base.yaml")
    spec = DetectorSpec.from_config(cfg)
    compat = CompatFlags.from_config(cfg)
    model = MultiModal3DDetector(spec=spec, dtype=jnp.bfloat16)

    bs = 32
    h, w = spec.camera.image_size
    rs = np.random.RandomState(0)
    cams = jnp.asarray(rs.randn(bs, 6, h, w, 3), jnp.bfloat16)
    lidar = jnp.asarray(rs.randn(bs, spec.lidar.max_points, 4), jnp.bfloat16)
    radars = jnp.asarray(
        rs.randn(bs, spec.radar.num_radars, spec.radar.max_points_per_sensor, 7),
        jnp.bfloat16,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, cams[:1], lidar[:1], radars[:1],
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def sub_vars(name):
        v = {"params": params[name]}
        if name in batch_stats:
            v["batch_stats"] = batch_stats[name]
        return v

    cam_enc = ResNetCameraEncoder(spec=spec.camera, dtype=jnp.bfloat16)
    lid_enc = PointNetLiDAREncoder(spec=spec.lidar, dtype=jnp.bfloat16)
    rad_enc = MultiRadarEncoder(spec=spec.radar, dtype=jnp.bfloat16)
    fusion = FlexibleBEVFusion(spec=spec.bev, dtype=jnp.bfloat16)
    head = CenterNetHead(spec=spec.centernet, dtype=jnp.bfloat16)

    def scalarized(fn):
        # reduce to ONE scalar inside the jit: timing must transfer a tiny
        # output, never the full activation (the tunnel is ~60 MB/s and
        # would dominate any measurement — CLAUDE.md)
        def wrapped(*args):
            out = fn(*args)
            return sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(out)
            )

        return jax.jit(wrapped)

    cam_fn = scalarized(lambda v, x: cam_enc.apply(v, x, train=False))
    lid_fn = scalarized(lambda v, x: lid_enc.apply(v, x, train=False))
    rad_fn = scalarized(lambda v, x: rad_enc.apply(v, x, train=False))
    # features for the fusion/head stage inputs (device-resident)
    cam_feat = jax.jit(lambda v, x: cam_enc.apply(v, x, train=False))(
        sub_vars("camera_encoder"), cams
    )
    lid_feat = jax.jit(lambda v, x: lid_enc.apply(v, x, train=False))(
        sub_vars("lidar_encoder"), lidar
    )
    rad_feat = jax.jit(lambda v, x: rad_enc.apply(v, x, train=False))(
        sub_vars("radar_encoder"), radars
    )
    fus_fn = scalarized(
        lambda v, c, l, r: fusion.apply(v, c, l, r, train=False)
    )
    fused = jax.jit(
        lambda v, c, l, r: fusion.apply(v, c, l, r, train=False)
    )(sub_vars("fusion"), cam_feat, lid_feat, rad_feat)
    head_fn = scalarized(lambda v, x: head.apply(v, x, train=False))

    fwd_fn = scalarized(
        lambda v, c, l, r: model.apply(v, c, l, r, train=False)
    )

    def full(v, c, l, r):
        p = model.apply(v, c, l, r, train=False)
        return decode_centernet_predictions(
            p,
            max_detections=spec.centernet.max_detections,
            voxel_size=2.048,
            pc_range=spec.bev.pc_range,
            class_always_zero=compat.decode_class_always_zero,
        )

    full_fn = scalarized(full)

    stages = {
        "camera_encoder": (cam_fn, (sub_vars("camera_encoder"), cams)),
        "lidar_encoder": (lid_fn, (sub_vars("lidar_encoder"), lidar)),
        "radar_encoder": (rad_fn, (sub_vars("radar_encoder"), radars)),
        "fusion": (fus_fn, (sub_vars("fusion"), cam_feat, lid_feat, rad_feat)),
        "head": (head_fn, (sub_vars("det_head"), fused)),
        "forward": (fwd_fn, (variables, cams, lidar, radars)),
        "forward+decode": (full_fn, (variables, cams, lidar, radars)),
    }
    total = None
    for name, (fn, args) in stages.items():
        ms = _time(fn, *args) * 1e3
        results[f"model_{name}_ms_b{bs}"] = ms
        print(f"# {name}: {ms:.2f} ms at b={bs}")
        if name == "forward+decode":
            total = ms
    if total:
        print(f"# -> {bs / (total / 1e3):.1f} samples/s end-to-end")


def bench_train(results):
    """Full jitted train step (fwd + on-device targets + loss + grads +
    AdamW + clip) at production shapes, device-resident batch, b=8,
    f32 vs mixed precision (bf16 compute / f32 params)."""
    import jax
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        DetectorSpec,
        TrainSpec,
        load_config,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer

    cfg = load_config("configs/base.yaml")
    spec = DetectorSpec.from_config(cfg)
    h, w = spec.camera.image_size
    bs, max_objects = 8, 500
    rs = np.random.RandomState(0)
    boxes = np.zeros((bs, max_objects, 7), np.float32)
    labels = np.full((bs, max_objects), -1, np.int64)
    boxes[:, :10, 0:2] = rs.uniform(-45, 45, (bs, 10, 2))
    boxes[:, :10, 3:6] = rs.uniform(1, 5, (bs, 10, 3))
    labels[:, :10] = rs.randint(0, 10, (bs, 10))
    batch = {
        "camera_imgs": rs.randn(bs, 6, h, w, 3).astype(np.float32),
        "lidar_points": rs.randn(
            bs, spec.lidar.max_points, 4
        ).astype(np.float32),
        "radar_points": rs.randn(
            bs, spec.radar.num_radars, spec.radar.max_points_per_sensor, 7
        ).astype(np.float32),
        "gt_boxes": boxes,
        "gt_labels": labels,
        "gt_velocities": np.zeros((bs, max_objects, 2), np.float32),
    }

    for mixed in (False, True):
        # mixed precision = bf16 compute dtype with f32 params, exactly as
        # train_detect.py wires train.mixed_precision
        trainer = Trainer(
            MultiModal3DDetector(
                spec=spec,
                dtype=jnp.bfloat16 if mixed else jnp.float32,
            ),
            TrainSpec(batch_size=bs, mixed_precision=mixed),
            CompatFlags(),
        )
        trainer.init_state(batch)
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        state = trainer.state

        def step(state):
            state, losses = trainer.train_step(state, dev, trainer.rng)
            return state, losses

        # warmup (compile) + timed loop; sync via a small loss fetch
        for _ in range(2):
            state, losses = step(state)
            _sync(losses["total_loss"])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, losses = step(state)
        _sync(losses["total_loss"])
        dt = (time.perf_counter() - t0) / iters
        key = f"train_{'mixed' if mixed else 'f32'}_b{bs}"
        results[key] = dt * 1e3
        print(f"# {key}: {dt * 1e3:.1f} ms ({bs / dt:.1f} samples/s)")
        del trainer, state


def main():
    from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax

    print(f"# backend: {jax.default_backend()} devices: {jax.devices()}")
    which = set(sys.argv[1:]) or {"pointnet", "bevpool", "foldbn"}
    results = {}
    if "pointnet" in which:
        bench_pointnet(results)
    if "bevpool" in which:
        bench_bevpool(results)
    if "liftsplat" in which:
        bench_liftsplat(results)
    if "foldbn" in which or "trunk" in which:
        bench_foldbn(results)
    if "trunkstages" in which:
        bench_trunk_stages(results)
    if "modelstages" in which:
        bench_model_stages(results)
    if "train" in which:
        bench_train(results)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
