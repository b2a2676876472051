"""Input pipeline: pickle-info dataset, collate to fixed-shape numpy batches.

Re-design of the reference dataset/loader (ref: train_detect.py:34-242) with
TPU-friendly STATIC shapes end-to-end:

- images: PIL decode + bilinear resize + ImageNet normalize, emitted NHWC
  (B, N_cam, H, W, 3) (ref: train_detect.py:123-145);
- LiDAR: .bin read, range filter, pad-or-random-subsample to `max_points`
  (ref: train_detect.py:147-161, 181-189). Quirk Q5: the reference parses the
  5-float nuScenes stream as 4 floats/point (train_detect.py:151) —
  reproduced by default, correct parse behind `lidar_four_float_parse=False`;
- radar: quirk Q4 — the reference substitutes np.random.randn dummy points
  (train_detect.py:173-177); reproduced by default. With
  `random_radar_points=False` a minimal binary-PCD reader parses the real
  nuScenes radar files ([x, y, z, vx, vy, rcs, t] channels), zero-padded;
- GT: boxes/labels/velocities padded to a FIXED `max_objects` (vs. the
  reference's pad-to-batch-max, train_detect.py:209-233, which is
  jit-hostile), label -1 padding.

`SyntheticNuScenesDataset` generates config-shaped random samples with
plantable GT boxes — the executable-test vehicle (the reference itself proves
the pipeline on random tensors, encoders.py:828-843, train_detect.py:175).
"""

from __future__ import annotations

import pickle
import threading
import queue as queue_mod
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..config import CAMERA_ORDER, RADAR_ORDER, DEFAULT_CLASSES, CompatFlags, DataSpec

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _decode_image(path: Path, h: int, w: int, draft: bool) -> "Image.Image":
    """PIL decode + bilinear resize -> RGB image at (w, h).

    `draft=True` asks the JPEG decoder for the smallest power-of-two DCT
    scale >= the target (1600x900 -> 800x450 for the production 448x800),
    roughly halving decode cost; the bilinear resize to the exact size still
    runs. Off by default — pixel values differ slightly from the
    reference's full decode (ref: train_detect.py:129-137)."""
    from PIL import Image

    img = Image.open(path)
    if draft:
        img.draft("RGB", (w, h))
    return img.convert("RGB").resize((w, h), Image.BILINEAR)


def _load_image(
    path: Path, h: int, w: int, draft: bool = False
) -> np.ndarray:
    """PIL decode + bilinear resize + [0,1] + ImageNet normalize -> (H, W, 3)."""
    arr = np.asarray(_decode_image(path, h, w, draft), np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def parse_radar_pcd(path: Path) -> np.ndarray:
    """Minimal nuScenes radar .pcd parser -> (N, 7) float32
    [x, y, z, vx, vy, rcs, t(=0)] (unpadded). Returns (0, 7) on any parse
    failure. The reference never parses radar files (quirk Q4); this is the
    corrected path."""
    empty = np.zeros((0, 7), np.float32)
    try:
        raw = Path(path).read_bytes()
        header_end = raw.index(b"DATA binary\n") + len(b"DATA binary\n")
        header = raw[:header_end].decode("ascii", "ignore").splitlines()
        fields: List[str] = []
        sizes: List[int] = []
        types: List[str] = []
        count = 0
        for line in header:
            if line.startswith("FIELDS"):
                fields = line.split()[1:]
            elif line.startswith("SIZE"):
                sizes = [int(v) for v in line.split()[1:]]
            elif line.startswith("TYPE"):
                types = line.split()[1:]
            elif line.startswith("POINTS"):
                count = int(line.split()[1])
        if not fields or count == 0:
            return empty
        fmt_map = {("F", 4): "f4", ("F", 8): "f8", ("I", 1): "i1",
                   ("I", 2): "i2", ("I", 4): "i4", ("U", 1): "u1",
                   ("U", 2): "u2", ("U", 4): "u4"}
        dtype = np.dtype(
            [
                (name, fmt_map[(t, s)])
                for name, t, s in zip(fields, types, sizes)
            ]
        )
        pts = np.frombuffer(
            raw[header_end : header_end + count * dtype.itemsize], dtype=dtype
        )
        out = np.zeros((len(pts), 7), np.float32)
        wanted = ["x", "y", "z", "vx", "vy", "rcs"]
        for ci, name in enumerate(wanted):
            if name in pts.dtype.names:
                out[:, ci] = pts[name].astype(np.float32)
        return out
    except Exception:
        return empty


def read_radar_pcd(path: Path, max_points: int) -> np.ndarray:
    """`parse_radar_pcd` zero-padded / truncated to (max_points, 7)."""
    pts = parse_radar_pcd(path)[:max_points]
    out = np.zeros((max_points, 7), np.float32)
    out[: len(pts)] = pts
    return out


class NuScenesDataset:
    """Pickle-backed dataset (same `nuscenes_infos_{split}.pkl` schema as the
    reference converter, ref: data_converter.py:140-161, 336-356)."""

    def __init__(
        self,
        data_root: str = "./data/nuscenes",
        split: str = "train",
        max_points: int = 35000,
        max_radar_points: int = 125,
        image_size=(448, 800),
        max_objects: int = 500,
        classes=DEFAULT_CLASSES,
        pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        compat: CompatFlags = CompatFlags(),
        config: Optional[Dict] = None,
        seed: Optional[int] = None,
        return_camera_cells: bool = False,
        return_camera_chunks: bool = False,
        return_camera_pairs: bool = False,
        cull_points: int = 0,
        cull_pairs: int = 0,
        bev_h: int = 50,
        bev_w: int = 50,
        depth_bins: int = 40,
        depth_min: float = 1.0,
        depth_max: float = 60.0,
        use_native: bool = True,
        emit_uint8: bool = False,
        num_sweeps: int = 1,
        radar_num_sweeps: int = 1,
        jpeg_draft_decode: bool = False,
    ):
        if config is not None:
            ds = DataSpec.from_config(config)
            data_root = ds.data_root
            max_points = ds.max_lidar_points
            max_radar_points = ds.max_radar_points
            image_size = ds.image_size
            classes = ds.classes
            pc_range = ds.pc_range
            num_sweeps = ds.num_sweeps
            radar_num_sweeps = ds.radar_num_sweeps
            jpeg_draft_decode = ds.jpeg_draft_decode
            compat = CompatFlags.from_config(config)
            # the geometric camera-to-BEV path needs per-sample frustum
            # cells (and, for splat_mode: pallas, the sorted chunk plans) —
            # derive them from the model config so the CLIs wire the
            # geometric inputs automatically
            bev_cfg = (
                (config.get("model", {}) or {}).get("bev_fusion", {}) or {}
            )
            if bev_cfg.get("camera_to_bev", "pseudo") == "geometric":
                return_camera_cells = True
                # chunk plans feed the fused Pallas splat, an INFERENCE-only
                # path (the module falls back to matmul when train=True) —
                # emitting them for the train split would ship multi-MB of
                # dead int32 arrays to the device every step
                return_camera_chunks = (
                    bev_cfg.get("splat_mode", "matmul") == "pallas"
                    and split != "train"
                )
                # culled pair plans (splat_mode: culled) are differentiable
                # and replace the raw cells entirely — the model's culled
                # branch never reads camera_cells, so shipping both would
                # waste device bandwidth
                return_camera_pairs = (
                    bev_cfg.get("splat_mode", "matmul") == "culled"
                )
                if return_camera_pairs:
                    return_camera_cells = False
                cull_points = bev_cfg.get("splat_cull_points", 0)
                cull_pairs = bev_cfg.get("splat_cull_pairs", 0)
                dataset_cfg = config.get("dataset", {}) or {}
                bev_h = bev_cfg.get("bev_h", dataset_cfg.get("bev_h", 50))
                bev_w = bev_cfg.get("bev_w", dataset_cfg.get("bev_w", 50))
                depth_bins = bev_cfg.get("depth_bins", 40)
                depth_min = bev_cfg.get("depth_min", 1.0)
                depth_max = bev_cfg.get("depth_max", 60.0)

        self.data_root = Path(data_root)
        self.split = split
        self.max_points = max_points
        self.max_radar_points = max_radar_points
        self.image_size = tuple(image_size)
        self.max_objects = max_objects
        self.classes = list(classes)
        self.pc_range = tuple(pc_range)
        self.compat = compat
        # per-sample RNG is derived from (seed, index) in __getitem__ so
        # loading is deterministic and thread-safe regardless of access order
        self.seed = 0 if seed is None else int(seed)
        self.return_camera_cells = return_camera_cells
        # chunk plans for the fused Pallas splat (splat_mode: pallas) —
        # calibration-only index math, cached per distinct cells array
        self.return_camera_chunks = return_camera_chunks
        self._chunk_cache: Dict[bytes, Dict[str, np.ndarray]] = {}
        # culled pair plans (splat_mode: culled) — calibration-only index
        # math, cached per distinct cells array; capacities fixed on first
        # use (or from config) so batch shapes stay static across samples
        self.return_camera_pairs = return_camera_pairs
        self._pair_cache: Dict[bytes, Dict[str, np.ndarray]] = {}
        self._cull_caps = (
            (int(cull_points), int(cull_pairs))
            if cull_points and cull_pairs
            else None
        )
        # guards the one-time capacity derivation: without it, two loader
        # threads could size caps from DIFFERENT samples and emit
        # mixed-shape plans into the same batch
        self._cull_caps_lock = threading.Lock()
        self.use_native = use_native
        self.emit_uint8 = emit_uint8
        self.num_sweeps = num_sweeps
        self.radar_num_sweeps = radar_num_sweeps
        self.jpeg_draft_decode = jpeg_draft_decode
        self.bev_h, self.bev_w = bev_h, bev_w
        self.depth_bins = depth_bins
        self.depth_min, self.depth_max = depth_min, depth_max

        pkl_path = self.data_root / f"nuscenes_infos_{split}.pkl"
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        self.infos = data["infos"]
        meta_classes = data.get("metadata", {}).get("classes")
        if meta_classes:
            self.classes = list(meta_classes)
        print(f"Loaded {len(self.infos)} samples for {split} split")

    def __len__(self) -> int:
        return len(self.infos)

    def _encode_labels(self, names) -> np.ndarray:
        label_map = {n: i for i, n in enumerate(self.classes)}
        return np.array(
            [label_map.get(n, -1) for n in names], dtype=np.int64
        )

    def _load_cameras(self, info) -> np.ndarray:
        h, w = self.image_size
        if self.emit_uint8:
            # ship raw bytes; normalization happens on device inside the
            # jitted step (ops/preprocess.normalize_images)
            imgs = [
                np.asarray(
                    _decode_image(
                        self.data_root / info["cams"][cam]["filename"],
                        h, w, self.jpeg_draft_decode,
                    ),
                    np.uint8,
                )
                for cam in CAMERA_ORDER
            ]
        else:
            imgs = [
                _load_image(
                    self.data_root / info["cams"][cam]["filename"], h, w,
                    self.jpeg_draft_decode,
                )
                for cam in CAMERA_ORDER
            ]
        return np.stack(imgs)  # (6, H, W, 3)

    def _load_lidar(self, info, rng) -> np.ndarray:
        if self.num_sweeps > 1 and info.get("sweeps"):
            return self._load_multi_sweep(info, rng)
        record = 4 if self.compat.lidar_four_float_parse else 5
        if self.use_native:
            from .native import load_lidar_native

            out = load_lidar_native(
                str(info["lidar_path"]), record, self.max_points, 4,
                self.pc_range, seed=rng.randint(1 << 31),
            )
            if out is not None:
                return out
        raw = np.fromfile(str(info["lidar_path"]), dtype=np.float32)
        # Q5 (record=4): misaligned 4-float parse, reproducing the reference
        pts = raw[: (raw.size // record) * record].reshape(-1, record)[:, :4]
        x0, y0, z0, x1, y1, z1 = self.pc_range
        m = (
            (pts[:, 0] > x0) & (pts[:, 0] < x1)
            & (pts[:, 1] > y0) & (pts[:, 1] < y1)
            & (pts[:, 2] > z0) & (pts[:, 2] < z1)
        )
        return self._pad_or_subsample(pts[m], self.max_points, rng)

    def _load_multi_sweep(self, info, rng) -> np.ndarray:
        """Aggregate the key sweep + prior sweeps with ego-motion compensation
        and a time-lag channel -> (max_points, 5) [x, y, z, intensity, dt]
        (north-star multi-sweep aggregation; requires pickles converted with
        dataset.num_sweeps > 1)."""
        from .converter import transform_points_between_sensors

        record = 4 if self.compat.lidar_four_float_parse else 5

        def read_bin(path):
            raw = np.fromfile(str(path), dtype=np.float32)
            return raw[: (raw.size // record) * record].reshape(-1, record)[
                :, :4
            ]

        key_pose = info["lidar_pose"]
        key_calib = info["lidar_calibrated_sensor"]
        clouds = []
        key_pts = read_bin(info["lidar_path"])
        clouds.append(
            np.concatenate(
                [key_pts, np.zeros((len(key_pts), 1), np.float32)], axis=1
            )
        )
        for sweep in info["sweeps"][: self.num_sweeps - 1]:
            try:
                pts = read_bin(sweep["lidar_path"])
            except (OSError, FileNotFoundError):
                continue
            pts = transform_points_between_sensors(
                pts, sweep["pose"], sweep["calib"], key_pose, key_calib
            )
            dt = np.full(
                (len(pts), 1), float(sweep.get("time_lag_s", 0.0)), np.float32
            )
            clouds.append(np.concatenate([pts, dt], axis=1))
        pts = np.concatenate(clouds, axis=0)

        x0, y0, z0, x1, y1, z1 = self.pc_range
        m = (
            (pts[:, 0] > x0) & (pts[:, 0] < x1)
            & (pts[:, 1] > y0) & (pts[:, 1] < y1)
            & (pts[:, 2] > z0) & (pts[:, 2] < z1)
        )
        return self._pad_or_subsample(pts[m], self.max_points, rng)

    def _load_radars(self, info, rng) -> np.ndarray:
        out = []
        for radar in RADAR_ORDER:
            if self.compat.random_radar_points:
                # Q4: dummy gaussian points (ref: train_detect.py:173-177)
                out.append(
                    rng.randn(self.max_radar_points, 7).astype(np.float32)
                )
                continue
            entry = info["radars"][radar]
            if self.radar_num_sweeps > 1 and entry.get("sweeps"):
                out.append(self._load_radar_multi_sweep(entry, rng))
            else:
                path = self.data_root / entry["filename"]
                out.append(read_radar_pcd(path, self.max_radar_points))
        return np.stack(out)  # (5, Nr, 7)

    def _load_radar_multi_sweep(self, entry, rng) -> np.ndarray:
        """Aggregate one radar's key frame + prior sweeps into the key radar
        frame: positions are ego-motion compensated, (vx, vy) rotated into the
        key frame, and the t channel carries the sweep's time lag (0 for the
        key frame). Requires pickles converted with
        dataset.radar_num_sweeps > 1 (per-entry 'pose'/'sweeps' keys)."""
        from .converter import (
            sensor_to_global,
            transform_points_between_sensors,
        )

        key_pose, key_calib = entry["pose"], entry["calibrated_sensor"]
        clouds = [parse_radar_pcd(self.data_root / entry["filename"])]
        r_key, _ = sensor_to_global(key_pose, key_calib)
        for sweep in entry["sweeps"][: self.radar_num_sweeps - 1]:
            pts = parse_radar_pcd(Path(sweep["path"]))
            if not len(pts):
                continue
            pts = transform_points_between_sensors(
                pts, sweep["pose"], sweep["calib"], key_pose, key_calib
            )
            # rotate the radial velocity vector (vx, vy, 0) into the key
            # frame: v_key = R_key^T R_sweep v  (pure rotation — velocities
            # don't translate)
            r_sweep, _ = sensor_to_global(sweep["pose"], sweep["calib"])
            r_rel = r_key.T @ r_sweep
            v = np.concatenate(
                [pts[:, 3:5], np.zeros((len(pts), 1), np.float32)], axis=1
            )
            pts[:, 3:5] = (v @ r_rel.T)[:, :2].astype(np.float32)
            pts[:, 6] = float(sweep.get("time_lag_s", 0.0))
            clouds.append(pts)
        pts = np.concatenate([c for c in clouds if len(c)] or clouds, axis=0)
        return self._pad_or_subsample(pts, self.max_radar_points, rng)

    def _pad_or_subsample(self, pts: np.ndarray, n: int, rng) -> np.ndarray:
        if pts.shape[0] >= n:
            idx = rng.choice(pts.shape[0], n, replace=False)
            return pts[idx].astype(np.float32)
        pad = np.zeros((n - pts.shape[0], pts.shape[1]), np.float32)
        return np.concatenate([pts.astype(np.float32), pad], axis=0)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        info = self.infos[idx]
        rng = np.random.RandomState(self.seed * 1000003 + idx)
        gt_boxes = np.asarray(info["gt_boxes"], np.float32).reshape(-1, 7)
        gt_labels = self._encode_labels(info["gt_names"])
        gt_vel = np.asarray(info["gt_velocity"], np.float32).reshape(-1, 2)
        sample = {
            "camera_imgs": self._load_cameras(info),
            "lidar_points": self._load_lidar(info, rng),
            "radar_points": self._load_radars(info, rng),
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_velocities": gt_vel,
            "token": info["token"],
        }
        if (
            self.return_camera_cells
            or self.return_camera_chunks
            or self.return_camera_pairs
        ):
            cells = self._frustum_cells(info)
            if self.return_camera_cells or self.return_camera_chunks:
                sample["camera_cells"] = cells
            if self.return_camera_chunks:
                plans = self._chunk_plans(cells)
                sample["camera_point_idx"] = plans["point_idx"]
                sample["camera_local_ids"] = plans["local_ids"]
                sample["camera_block_idx"] = plans["block_idx"]
            if self.return_camera_pairs:
                plans = self._pair_plans(cells)
                sample["camera_seg_idx"] = plans["seg_idx"]
                sample["camera_seg_id"] = plans["seg_id"]
                sample["camera_pair_cell"] = plans["pair_cell"]
                sample["camera_pair_pix"] = plans["pair_pix"]
        cam_front = info.get("cams", {}).get("CAM_FRONT", {})
        if "calibrated_sensor" in cam_front and "lidar_calibrated_sensor" in info:
            # front-camera projection data for the visualization path
            # (intrinsics scaled from the native 1600x900 to image_size)
            from ..utils.box_geometry import lidar_to_cam_transform

            h, w = self.image_size
            cs = cam_front["calibrated_sensor"]
            intr = np.asarray(cs["camera_intrinsic"], np.float64)
            scale = np.diag([w / 1600.0, h / 900.0, 1.0])
            rot, trans = lidar_to_cam_transform(
                cs, info["lidar_calibrated_sensor"]
            )
            sample["cam_front_projection"] = {
                "intrinsic": scale @ intr,
                "rot": rot,
                "trans": trans,
            }
        return sample

    def _chunk_plans(self, camera_cells: np.ndarray) -> Dict[str, np.ndarray]:
        """Per-camera sorted-chunk plans (ops.bev_pool_pallas.
        precompute_bev_chunks) for the fused Pallas splat: point_idx /
        local_ids (N, n_chunks, T), block_idx (N, n_chunks). Cached by the
        cells bytes — calibrations repeat across a scene's samples."""
        from ..ops.bev_pool_pallas import precompute_bev_chunks

        num_cells = self.bev_h * self.bev_w
        per_cam = []
        for cam_cells in camera_cells:  # (D, H', W')
            key = cam_cells.tobytes()
            plan = self._chunk_cache.get(key)
            if plan is None:
                plan = precompute_bev_chunks(
                    cam_cells.reshape(-1), num_cells
                )
                if len(self._chunk_cache) > 256:  # bound host memory
                    self._chunk_cache.clear()
                self._chunk_cache[key] = plan
            per_cam.append(plan)
        return {
            k: np.stack([p[k] for p in per_cam])
            for k in ("point_idx", "local_ids", "block_idx")
        }

    def _pair_plans(self, camera_cells: np.ndarray) -> Dict[str, np.ndarray]:
        """Per-camera culled + (cell, pixel)-deduped splat plans
        (ops.bev_splat.precompute_culled_pairs) for splat_mode: culled:
        seg_idx / seg_id (N, T_cull), pair_cell / pair_pix (N, U_cap).
        Capacities are fixed once (5% headroom over SAMPLE 0's calibration
        — deterministic regardless of which sample a loader thread touches
        first, so plan shapes agree across threads, epochs, and hosts — or
        the config's splat_cull_points/pairs) so batch shapes stay static;
        a later sample overflowing them raises with the config keys to
        set. Cached by cells bytes like the chunk plans."""
        from ..ops.bev_splat import (
            precompute_culled_pairs,
            precompute_culled_pairs_batch,
        )

        num_cells = self.bev_h * self.bev_w
        hw = camera_cells.shape[-2] * camera_cells.shape[-1]
        if self._cull_caps is None:
            with self._cull_caps_lock:
                if self._cull_caps is None:
                    ref_cells = self._frustum_cells(self.infos[0])
                    _, self._cull_caps = precompute_culled_pairs_batch(
                        ref_cells, hw, num_cells, headroom=1.05,
                        sizes_only=True,
                    )
        t_cap, u_cap = self._cull_caps
        per_cam = []
        for cam_cells in camera_cells:  # (D, H', W')
            key = cam_cells.tobytes()
            plan = self._pair_cache.get(key)
            if plan is None:
                plan = precompute_culled_pairs(
                    cam_cells.reshape(-1), hw, num_cells,
                    point_capacity=t_cap, pair_capacity=u_cap,
                )
                if len(self._pair_cache) > 256:  # bound host memory
                    self._pair_cache.clear()
                self._pair_cache[key] = plan
            per_cam.append(plan)
        return {
            k: np.stack([p[k] for p in per_cam])
            for k in ("seg_idx", "seg_id", "pair_cell", "pair_pix")
        }

    def _frustum_cells(self, info) -> np.ndarray:
        """(N_cam, D, H', W') precomputed BEV cell ids for the geometric
        camera-to-BEV path (ops.bev_splat.precompute_frustum_cells); -1 for
        out-of-range frustum points."""
        from ..ops.bev_splat import precompute_frustum_cells
        from .converter import quat_rotation_matrix

        h, w = self.image_size
        fh, fw = h // 16, w // 16  # camera encoder stride
        depths = np.linspace(
            self.depth_min, self.depth_max, self.depth_bins
        )
        lc = info["lidar_calibrated_sensor"]
        lidar_rot = quat_rotation_matrix(lc["rotation"])  # lidar->ego
        lidar_trans = np.asarray(lc["translation"], np.float64)
        out = []
        for cam in CAMERA_ORDER:
            cs = info["cams"][cam]["calibrated_sensor"]
            intr = np.asarray(cs["camera_intrinsic"], np.float64)
            cam_rot = quat_rotation_matrix(cs["rotation"])  # cam->ego
            cam_trans = np.asarray(cs["translation"], np.float64)
            # cam->lidar = inv(lidar->ego) . (cam->ego)
            rot = lidar_rot.T @ cam_rot
            trans = lidar_rot.T @ (cam_trans - lidar_trans)
            # scale intrinsics from original image resolution to the
            # resized input (nuScenes cameras are 1600x900)
            scale = np.diag([w / 1600.0, h / 900.0, 1.0])
            out.append(
                precompute_frustum_cells(
                    scale @ intr, rot, trans,
                    feat_hw=(fh, fw), image_hw=(h, w),
                    depth_bins=depths, bev_hw=(self.bev_h, self.bev_w),
                    pc_range=self.pc_range,
                )
            )
        return np.stack(out)


class SyntheticNuScenesDataset:
    """Config-shaped random dataset for tests and benchmarks (no files)."""

    def __init__(
        self,
        num_samples: int = 8,
        image_size=(448, 800),
        max_points: int = 35000,
        max_radar_points: int = 125,
        num_cameras: int = 6,
        num_radars: int = 5,
        max_gt: int = 12,
        num_classes: int = 10,
        pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        seed: int = 0,
    ):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.max_points = max_points
        self.max_radar_points = max_radar_points
        self.num_cameras = num_cameras
        self.num_radars = num_radars
        self.max_gt = max_gt
        self.num_classes = num_classes
        self.pc_range = pc_range
        self.seed = seed
        self.classes = list(DEFAULT_CLASSES)[:num_classes]

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        h, w = self.image_size
        n_gt = rng.randint(1, self.max_gt + 1)
        x0, y0, _, x1, y1, _ = self.pc_range
        boxes = np.zeros((n_gt, 7), np.float32)
        boxes[:, 0] = rng.uniform(x0 * 0.9, x1 * 0.9, n_gt)
        boxes[:, 1] = rng.uniform(y0 * 0.9, y1 * 0.9, n_gt)
        boxes[:, 2] = rng.uniform(-2.0, 0.5, n_gt)
        boxes[:, 3:6] = rng.uniform(0.5, 6.0, (n_gt, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
        return {
            "camera_imgs": rng.randn(self.num_cameras, h, w, 3).astype(
                np.float32
            ),
            "lidar_points": rng.randn(self.max_points, 4).astype(np.float32),
            "radar_points": rng.randn(
                self.num_radars, self.max_radar_points, 7
            ).astype(np.float32),
            "gt_boxes": boxes,
            "gt_labels": rng.randint(0, self.num_classes, n_gt).astype(
                np.int64
            ),
            "gt_velocities": np.zeros((n_gt, 2), np.float32),
            "token": f"synthetic_{idx}",
        }


def collate_fn(
    samples: List[Dict[str, np.ndarray]], max_objects: int = 500
) -> Dict[str, np.ndarray]:
    """Stack samples into a fixed-shape batch. GT padded to `max_objects`
    (label -1), replacing the reference's pad-to-batch-max
    (ref: train_detect.py:197-242) with jit-static shapes."""
    batch_size = len(samples)
    out: Dict[str, np.ndarray] = {
        "camera_imgs": np.stack([s["camera_imgs"] for s in samples]),
        "lidar_points": np.stack([s["lidar_points"] for s in samples]),
        "radar_points": np.stack([s["radar_points"] for s in samples]),
    }
    if "camera_cells" in samples[0]:
        out["camera_cells"] = np.stack([s["camera_cells"] for s in samples])
    for k in (
        "camera_point_idx", "camera_local_ids", "camera_block_idx",
        "camera_seg_idx", "camera_seg_id",
        "camera_pair_cell", "camera_pair_pix",
    ):
        if k in samples[0]:
            out[k] = np.stack([s[k] for s in samples])
    gt_boxes = np.zeros((batch_size, max_objects, 7), np.float32)
    gt_labels = np.full((batch_size, max_objects), -1, np.int64)
    gt_vel = np.zeros((batch_size, max_objects, 2), np.float32)
    for i, s in enumerate(samples):
        n = min(len(s["gt_labels"]), max_objects)
        gt_boxes[i, :n] = s["gt_boxes"][:n]
        gt_labels[i, :n] = s["gt_labels"][:n]
        gt_vel[i, :n] = s["gt_velocities"][:n]
    out["gt_boxes"] = gt_boxes
    out["gt_labels"] = gt_labels
    out["gt_velocities"] = gt_vel
    out["tokens"] = [s["token"] for s in samples]
    return out


class DataLoader:
    """Minimal batching iterator with optional background prefetch.

    The reference relies on torch DataLoader worker processes
    (train_detect.py:685-701); here a single prefetch thread overlaps host
    decode with device compute (the device step is async-dispatched anyway).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 4,
        shuffle: bool = False,
        drop_last: bool = False,
        max_objects: int = 500,
        prefetch: int = 2,
        seed: int = 0,
        num_workers: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.max_objects = max_objects
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        # thread pool for per-sample loads (PIL decode and np.fromfile
        # release the GIL, so threads parallelize the IO-heavy work without
        # torch-style worker processes)
        self.num_workers = num_workers
        # multi-host data sharding: every process computes the SAME epoch
        # permutation (seeded rng) and takes a disjoint strided slice of it,
        # so N hosts cover the epoch exactly once with per-host batches
        # (parallel/distributed.form_global_batch assembles them on device)
        self.process_index = process_index
        self.process_count = max(1, process_count)

    def _fetch(self, indices) -> List[Dict[str, np.ndarray]]:
        if self.num_workers and self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.num_workers) as pool:
                return list(pool.map(self.dataset.__getitem__, indices))
        return [self.dataset[int(i)] for i in indices]

    def _local_count(self) -> int:
        n = len(self.dataset)
        if self.process_count > 1:
            # strided slice truncated to the MINIMUM per-process count so
            # every host runs the same number of batches — unequal counts
            # would deadlock the collectives at epoch end (up to P-1 tail
            # samples are dropped per epoch)
            n = n // self.process_count
        return n

    def __len__(self) -> int:
        n = self._local_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        if self.process_count > 1:
            # equal-length shards (see _local_count): every process takes
            # the same number of strided samples
            idx = idx[self.process_index :: self.process_count]
            idx = idx[: self._local_count()]
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        if self.prefetch <= 0:
            for b in batches:
                yield collate_fn(self._fetch(b), self.max_objects)
            return

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            # A loader error must surface in the consumer, not silently end
            # the epoch early — enqueue the exception and re-raise it below.
            try:
                for b in batches:
                    q.put(collate_fn(self._fetch(b), self.max_objects))
                q.put(sentinel)
            except BaseException as e:  # noqa: BLE001
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
