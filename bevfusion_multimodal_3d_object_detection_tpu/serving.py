"""Batched inference server — the production serving wrapper (ROADMAP 7).

The reference has no serving story at all (its `InferenceEngine` reloads the
model per call — quirk Q17, ref: inference.py:164-165). This module provides
the TPU deployment path:

- ONE jitted forward+decode graph, compiled once at startup for a fixed
  `batch_size` (static shapes — no recompiles in steady state);
- a background dispatch thread that coalesces concurrent requests into
  full batches (partial batches are padded; padding rows are dropped on the
  way out), trading at most `max_delay_ms` of latency for MXU utilization;
- bf16 compute by default (f32 decode outputs), optional serving-graph BN
  folding (utils/fold_bn.py) and the fused Pallas PointNet
  (ops/pointnet_pallas.py);
- per-request futures: `submit()` returns a `concurrent.futures.Future`,
  `infer()` is the blocking convenience wrapper.

Synchronization note: results are fetched with a small host transfer (the
tunneled platform's `block_until_ready` is unreliable; CLAUDE.md).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional

import numpy as np

from .config import CompatFlags, DetectorSpec, load_config


class ServerStoppedError(RuntimeError):
    """The InferenceServer is stopped / draining — requests are
    unavailability (HTTP 503, retryable), not internal errors. A dedicated
    type so the HTTP layer never classifies by message text."""


class InferenceServer:
    def __init__(
        self,
        model_path: Optional[str] = None,
        config_path: str = "configs/base.yaml",
        config: Optional[Dict] = None,
        batch_size: int = 8,
        max_delay_ms: float = 5.0,
        score_threshold: float = 0.3,
        use_bf16: bool = True,
        fold_bn: bool = True,
        use_pallas: bool = False,
        variables: Optional[Dict] = None,
        mesh=None,
        aot_path: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        from .models import MultiModal3DDetector
        from .ops.decode import decode_centernet_predictions

        self.config = config if config is not None else load_config(config_path)
        self.spec = DetectorSpec.from_config(self.config)
        self.compat = CompatFlags.from_config(self.config)
        self.batch_size = batch_size
        # multi-chip serving: a ('data','view') jax.sharding.Mesh shards
        # every coalesced batch over 'data' (and the camera axis over
        # 'view' when configured) — jit partitions the serving graph over
        # ICI with no other changes (parallel/mesh.py)
        self.mesh = mesh
        if mesh is not None:
            n_data = int(mesh.shape.get("data", 1))
            if batch_size % max(n_data, 1):
                raise ValueError(
                    f"batch_size {batch_size} must divide by the mesh's "
                    f"data axis ({n_data}) for sharded serving"
                )
        self.max_delay_s = max_delay_ms / 1000.0
        self.score_threshold = score_threshold
        self.fold_bn = fold_bn
        # resurrected inference.post_processing (fallback: test section;
        # compat switch; ops/decode.py): score threshold + BEV NMS + cap
        self.post_process = None
        if not self.compat.ignore_post_processing_config:
            from .config import PostProcessSpec

            self.post_process = PostProcessSpec.from_config(
                self.config, ("inference", "test")
            )
            self.score_threshold = self.post_process.score_threshold
        dtype = jnp.bfloat16 if use_bf16 else jnp.float32

        self.model = MultiModal3DDetector(
            spec=self.spec,
            dtype=dtype,
            mask_padding=not self.compat.unmasked_point_padding,
            use_pallas_infer=use_pallas,
            fold_bn=fold_bn,
        )

        if variables is None:
            # shared restore flow (utils/restore.py): restore into the
            # unfolded tree (native ckpt, reference .pth, or pretrained
            # camera init), then fold for serving if requested
            from .utils.restore import load_serving_variables

            variables = load_serving_variables(
                self.spec,
                model_path=model_path,
                dtype=dtype,
                mask_padding=not self.compat.unmasked_point_padding,
                fold_bn=fold_bn,
            )
        elif fold_bn:
            from .utils.fold_bn import fold_camera_variables

            variables = fold_camera_variables(variables)
        if mesh is not None:
            # replicate the weights onto the mesh ONCE — otherwise every
            # coalesced batch re-broadcasts the full tree from device 0
            # (measured 3.5x per-call cost on the 8-device CPU backend)
            from .parallel import replicate

            variables = jax.device_put(variables, replicate(mesh))
        self.variables = variables

        if self.compat.eval_decode_voxel_0512:
            voxel_size = 0.512  # Q3
        else:
            # per-axis (decode matches targets.py for non-square grids)
            x0, y0, _, x1, y1, _ = self.spec.bev.pc_range
            voxel_size = (
                (x1 - x0) / self.spec.bev.bev_w,
                (y1 - y0) / self.spec.bev.bev_h,
            )

        spec = self.spec

        model_dtype = dtype

        @jax.jit
        def _serve(variables, cams, lidar, radars):
            if cams is not None and cams.dtype == jnp.uint8:
                # uint8-on-the-wire (4x less host->device traffic than f32;
                # same trick as the train pipeline): normalize + resize on
                # device inside the serving graph
                from .ops.preprocess import normalize_images

                cams = normalize_images(
                    cams, size=spec.camera.image_size
                ).astype(model_dtype)
            preds = self.model.apply(
                variables,
                cams if spec.use_camera else None,
                lidar if spec.use_lidar else None,
                radars if spec.use_radar else None,
                train=False,
            )
            return decode_centernet_predictions(
                preds,
                max_detections=spec.centernet.max_detections,
                voxel_size=voxel_size,
                pc_range=spec.bev.pc_range,
                class_always_zero=self.compat.decode_class_always_zero,
            )

        self._serve = _serve
        if aot_path is not None:
            # AOT deployment (utils/aot.py): replace the jitted trace with
            # the deserialized StableHLO artifact — no model retrace, and
            # startup validates shapes/dtype/modalities against the config
            if mesh is not None:
                raise ValueError(
                    "aot_path and mesh are mutually exclusive: the AOT "
                    "artifact was traced unpartitioned"
                )
            from .utils.aot import attach_aot_serving

            self.aot_meta = attach_aot_serving(self, aot_path)
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        # serializes submit()'s stopped-check+put against stop()'s drain so
        # a racing submit cannot land in a dead queue
        self._submit_lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self.stats = {
            "requests": 0, "batches": 0, "padded_rows": 0,
            "total_latency_s": 0.0,
        }

    # -- lifecycle -------------------------------------------------------------
    def start(self, warmup: bool = True) -> "InferenceServer":
        if self._stop.is_set():
            # the dispatch loop and any queued futures were torn down;
            # restarting would run with a poisoned stop latch and hang
            # clients — fail loudly instead
            raise ServerStoppedError(
                "InferenceServer cannot be restarted after stop(); "
                "construct a new server"
            )
        if warmup:
            # warm BOTH wire signatures (float and uint8 cameras compile to
            # different jit variants; the first uint8 request must not eat a
            # cold compile behind a green /healthz)
            self._run_batch([self._zero_sample()] * self.batch_size)
            u8 = self._zero_sample()
            u8["camera_imgs"] = u8["camera_imgs"].astype(np.uint8)
            self._run_batch([u8] * self.batch_size)
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
        # fail any requests still queued so no client future hangs forever
        # (the lock fences concurrent submit()s: they either landed before
        # this drain or raise)
        with self._submit_lock:
            while True:
                try:
                    _, fut, _ = self._queue.get_nowait()
                except queue.Empty:
                    break
                if not fut.done():
                    fut.set_exception(ServerStoppedError("InferenceServer stopped"))

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- API ---------------------------------------------------------------------
    def submit(self, sample: Dict[str, np.ndarray]) -> Future:
        """Enqueue one sample (dataset-format dict); resolves to a detections
        dict {boxes (K, 9), scores (K,), labels (K,)} above score_threshold.

        Shapes are validated here against the compiled serving graph (static
        shapes — a mismatch raises immediately instead of triggering a
        recompile or poisoning a coalesced batch)."""
        self._validate(sample)
        fut: Future = Future()
        with self._submit_lock:
            if self._stop.is_set():
                raise ServerStoppedError("InferenceServer stopped")
            self._queue.put((sample, fut, time.perf_counter()))
        return fut

    def _validate(self, sample: Dict[str, np.ndarray]) -> None:
        s = self.spec
        h, w = s.camera.image_size
        if np.shape(sample["camera_imgs"]) != (6, h, w, 3):
            raise ValueError(
                f"camera_imgs must be (6, {h}, {w}, 3) "
                f"(float normalized, or uint8 normalized on device), "
                f"got {np.shape(sample['camera_imgs'])}"
            )
        want_lidar = (s.lidar.max_points, s.lidar.input_channels)
        if np.shape(sample["lidar_points"]) != want_lidar:
            raise ValueError(
                f"lidar_points must be {want_lidar}, "
                f"got {np.shape(sample['lidar_points'])}"
            )
        want_radar = (
            s.radar.num_radars,
            s.radar.max_points_per_sensor,
            s.radar.input_channels,
        )
        if np.shape(sample["radar_points"]) != want_radar:
            raise ValueError(
                f"radar_points must be {want_radar}, "
                f"got {np.shape(sample['radar_points'])}"
            )

    def infer(self, sample: Dict[str, np.ndarray], timeout: float = 60.0):
        return self.submit(sample).result(timeout=timeout)

    # -- internals ---------------------------------------------------------------
    def _zero_inputs(self, b: int):
        import jax.numpy as jnp

        h, w = self.spec.camera.image_size
        return (
            jnp.zeros((b, 6, h, w, 3), self.model.dtype),
            jnp.zeros(
                (b, self.spec.lidar.max_points, self.spec.lidar.input_channels),
                self.model.dtype,
            ),
            jnp.zeros(
                (
                    b,
                    self.spec.radar.num_radars,
                    self.spec.radar.max_points_per_sensor,
                    self.spec.radar.input_channels,
                ),
                self.model.dtype,
            ),
        )

    def _zero_sample(self) -> Dict[str, np.ndarray]:
        h, w = self.spec.camera.image_size
        return {
            "camera_imgs": np.zeros((6, h, w, 3), np.float32),
            "lidar_points": np.zeros(
                (self.spec.lidar.max_points, self.spec.lidar.input_channels),
                np.float32,
            ),
            "radar_points": np.zeros(
                (
                    self.spec.radar.num_radars,
                    self.spec.radar.max_points_per_sensor,
                    self.spec.radar.input_channels,
                ),
                np.float32,
            ),
        }

    def _collect(self, poll_s: float = 0.05) -> Optional[list]:
        """Block for the first request, then coalesce up to batch_size within
        max_delay. Returns [(sample, future, t_enq), ...] or None on idle."""
        try:
            first = self._queue.get(timeout=poll_s)
        except queue.Empty:
            return None
        batch = [first]
        deadline = time.perf_counter() + self.max_delay_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _dispatch(self) -> None:
        """Two-stage software pipeline: the device executes batch N+1 while
        this thread fetches batch N's (small) results to host — jax dispatch
        is async, so `_launch` returns as soon as the work is enqueued and
        the transfer in `_finish` overlaps the next batch's compute."""
        pending = None  # (device_out, futures, n, t_enqs)
        while not self._stop.is_set():
            # short poll while a batch is in flight so its results flush
            # promptly under light load
            batch = self._collect(poll_s=0.002 if pending else 0.05)
            if batch is None:
                if pending is not None:
                    self._finish(*pending)
                    pending = None
                continue
            # transition futures to RUNNING; drops client-cancelled ones and
            # makes later set_result race-free (cancel() can no longer win)
            batch = [b for b in batch if b[1].set_running_or_notify_cancel()]
            if not batch:
                continue
            samples = [b[0] for b in batch]
            futures = [b[1] for b in batch]
            t_enqs = [b[2] for b in batch]
            try:
                out = self._launch(samples)
            except Exception as e:  # surface server errors to callers
                for fut in futures:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            if pending is not None:
                self._finish(*pending)
            pending = (out, futures, len(batch), t_enqs)
        if pending is not None:
            self._finish(*pending)

    def _launch(self, samples: List[Dict]):
        """Stage + enqueue one device batch; returns device arrays without
        synchronizing."""
        import jax.numpy as jnp

        n = len(samples)
        pad = self.batch_size - n
        # a batch mixing uint8-wire and float-wire cameras cannot ship as
        # one array: np.stack would silently promote the uint8 rows to
        # float WITHOUT normalization. Normalize the uint8 minority on host
        # for mixed batches (rare); uniform batches keep their wire format.
        dtypes = {np.asarray(s["camera_imgs"]).dtype for s in samples}
        if len(dtypes) > 1:
            from .data.dataset import IMAGENET_MEAN, IMAGENET_STD

            samples = [
                dict(
                    s,
                    camera_imgs=(
                        (np.asarray(s["camera_imgs"], np.float32) / 255.0
                         - IMAGENET_MEAN) / IMAGENET_STD
                        if np.asarray(s["camera_imgs"]).dtype == np.uint8
                        else s["camera_imgs"]
                    ),
                )
                for s in samples
            ]
        # pad rows mirror the first sample's dtypes so a partial batch keeps
        # the same jit signature (uint8 wire stays uint8)
        pad_sample = {k: np.zeros_like(v) for k, v in samples[0].items()}
        padded = samples + [pad_sample] * pad
        cam_stack = np.stack([s["camera_imgs"] for s in padded])
        if self.mesh is not None:
            # one placement per array (host -> mesh shards); the unsharded
            # staging below would land a full copy on the default device
            # first and pay a second device->mesh copy
            cams, lidar, radars = self._stage_mesh_batch(padded, cam_stack)
        else:
            cams = (
                jnp.asarray(cam_stack)
                if cam_stack.dtype == np.uint8
                else jnp.asarray(cam_stack, self.model.dtype)
            )
            lidar = jnp.asarray(
                np.stack([s["lidar_points"] for s in padded]),
                self.model.dtype,
            )
            radars = jnp.asarray(
                np.stack([s["radar_points"] for s in padded]),
                self.model.dtype,
            )
        return self._serve(self.variables, cams, lidar, radars)

    def _stage_mesh_batch(self, padded, cam_stack):
        """Mesh path: ONE placement per array (host -> mesh shards), casting
        on host via ml_dtypes so no staging copy lands on the default device
        first. Returns (cams, lidar, radars) mesh-sharded."""
        import ml_dtypes

        from .parallel import shard_batch

        np_dtype = (
            ml_dtypes.bfloat16
            if self.model.dtype.__name__ == "bfloat16"
            else np.float32
        )
        batch = {
            "camera_imgs": (
                cam_stack
                if cam_stack.dtype == np.uint8
                else cam_stack.astype(np_dtype)
            ),
            "lidar_points": np.stack(
                [s["lidar_points"] for s in padded]
            ).astype(np_dtype),
            "radar_points": np.stack(
                [s["radar_points"] for s in padded]
            ).astype(np_dtype),
        }
        placed = shard_batch(self.mesh, batch)
        return (
            placed["camera_imgs"],
            placed["lidar_points"],
            placed["radar_points"],
        )

    def _finish(self, out, futures, n: int, t_enqs: List[float]) -> None:
        """Fetch one launched batch's results and resolve its futures."""
        try:
            results = self._fetch(out, n)
        except Exception as e:
            for fut in futures:
                if not fut.done():
                    fut.set_exception(e)
            return
        for fut, res in zip(futures, results):
            if not fut.done():  # RUNNING (cancel can't win) but be safe
                fut.set_result(res)
        now = time.perf_counter()
        self.stats["requests"] += n
        self.stats["batches"] += 1
        self.stats["padded_rows"] += self.batch_size - n
        # per-REQUEST latency sum, so /stats' total/requests is a true mean
        self.stats["total_latency_s"] += sum(now - t for t in t_enqs)

    def _fetch(self, out, n: int) -> List[Dict]:
        # ONE small host transfer for the whole batch; boxes ship as
        # (K, 9) = [x y z w l h yaw vx vy] (decode returns 7-col boxes with
        # velocities separate)
        boxes = np.concatenate(
            [
                np.asarray(out["boxes"], np.float32),
                np.asarray(out["velocities"], np.float32),
            ],
            axis=-1,
        )
        scores = np.asarray(out["scores"], np.float32)
        labels = np.asarray(out["labels"], np.int64)
        results = []
        for i in range(n):
            keep = scores[i] > self.score_threshold
            res = {
                "boxes": boxes[i][keep],
                "scores": scores[i][keep],
                "labels": labels[i][keep],
            }
            if self.post_process is not None:
                from .ops.decode import nms_bev

                res = nms_bev(res, self.post_process.nms_threshold)
                cap = self.post_process.max_detections
                if len(res["scores"]) > cap:
                    res = {k: v[:cap] for k, v in res.items()}
            results.append(res)
        return results

    def _run_batch(self, samples: List[Dict]) -> List[Dict]:
        """Synchronous convenience path (warmup, tests): launch + fetch."""
        return self._fetch(self._launch(samples), len(samples))


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib http.server; the network deployment surface)
# ---------------------------------------------------------------------------


def make_http_server(
    server: InferenceServer,
    host: str,
    port: int,
    max_request_bytes: int = 64 * 1024 * 1024,
):
    """A ThreadingHTTPServer wrapping an InferenceServer.

    Requests with Content-Length above `max_request_bytes` (default 64 MiB,
    ~10x a full uint8 tri-modal sample) get 413 without reading the body.

    Endpoints:
      GET  /healthz -> {"status": "ok"} once the jitted graph is warm.
      GET  /stats   -> request/batch/latency counters + uptime.
      POST /infer   -> one sample, two wire formats:
          application/x-npz: np.savez({camera_imgs, lidar_points,
              radar_points}) bytes — the efficient path;
          application/json:  the same keys as nested lists.
        Response: {"boxes": (K, 9) [x y z w l h yaw vx vy], "scores": (K,),
        "labels": (K,)} as JSON lists.

    Concurrent requests coalesce into device batches through the
    InferenceServer dispatch thread (threaded HTTP handlers block on their
    per-request futures).
    """
    import io
    import json as _json
    import zipfile
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    t_start = time.time()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: Dict):
            body = _json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats":
                st = dict(server.stats)
                st["uptime_s"] = time.time() - t_start
                if st["batches"]:
                    st["mean_latency_s"] = (
                        st["total_latency_s"] / st["requests"]
                    )
                self._reply(200, st)
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/infer":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_request_bytes:
                    self._reply(
                        413,
                        {
                            "error": "request too large: "
                            f"{n} > {max_request_bytes} bytes"
                        },
                    )
                    return
                raw = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "application/json")
                try:
                    if "npz" in ctype:
                        with np.load(io.BytesIO(raw)) as z:
                            # uint8 camera arrays stay uint8 (the low-traffic
                            # wire format; normalized on device)
                            sample = {
                                k: (
                                    np.asarray(z[k])
                                    if z[k].dtype == np.uint8
                                    else np.asarray(z[k], np.float32)
                                )
                                for k in z
                            }
                    else:
                        sample = {
                            k: np.asarray(v, np.float32)
                            for k, v in _json.loads(raw).items()
                        }
                except (zipfile.BadZipFile, OSError) as e:
                    # np.load raises BadZipFile on truncated/garbage zip
                    # bodies and OSError on unreadable buffers — client
                    # faults, same class as a JSON parse error. Scoped to
                    # the parse so a reply-write OSError is NOT mislabeled.
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                res = server.infer(sample, timeout=120.0)
                self._reply(
                    200,
                    {
                        "boxes": res["boxes"].tolist(),
                        "scores": res["scores"].tolist(),
                        "labels": res["labels"].tolist(),
                    },
                )
            except (ValueError, KeyError, _json.JSONDecodeError) as e:
                # malformed request: parse / shape-contract errors
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except TimeoutError:
                # the inference WAS accepted and may still complete — 504 so
                # clients do not retry (at-most-once; retrying would double
                # device work exactly when the server is overloaded)
                self._reply(504, {"error": "inference timed out"})
            except ServerStoppedError:
                # unavailability (drain/stop): retryable, no internals leak
                self._reply(503, {"error": "server unavailable"})
            except RuntimeError:
                self._reply(500, {"error": "internal error"})
            except Exception:
                self._reply(500, {"error": "internal error"})

    return ThreadingHTTPServer((host, port), Handler)
