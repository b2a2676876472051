#!/usr/bin/env python
"""Benchmark: tri-modal end-to-end inference samples/sec on one TPU chip.

Prints ONE JSON line per completed measurement (each line is a complete,
parseable best-so-far result — the LAST line is the final answer):
  {"metric": "...", "value": N, "unit": "samples/sec", "vs_baseline": N, ...}

- value: steady-state samples/sec of the flagship tri-modal detector
  (camera+lidar+radar, BEV fusion, CenterNet head) running forward + on-device
  decode in bfloat16, best over batch sizes.
- vs_baseline: ratio vs. the measured torch-CPU reference-equivalent
  (the reference publishes no throughput numbers — BASELINE.md; its exact
  code cannot run here since torchvision is absent, so an architecture- and
  FLOP-identical torch model is timed instead; cached in bench_baseline.json).
- train_samples_per_sec (extra key): mixed-precision train-step throughput,
  measured after the inference sweep if budget remains.

Architecture: the measurements run in a CHILD process that streams one
"RESULT {...}" line per completed batch size; the PARENT's main thread only
blocks on pipe reads, so SIGTERM/SIGINT always reach it and a driver kill
still yields a final valid JSON line (the r02 failure mode — rc=124 with
zero parsed output — cannot recur). The TPU tunnel is known-flaky
(CLAUDE.md): a child that dies or hangs before producing any result is
killed and respawned with backoff while budget remains.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
BASELINE_CACHE = REPO / "bench_baseline.json"

TOTAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 600.0))
# no PHASE/RESULT line yet within this window -> the child's MAIN thread is
# hung (dead-tunnel backend init) -> kill + respawn with backoff. Heartbeats
# intentionally do NOT count: they come from a daemon thread and keep
# flowing while the main thread hangs.
ATTEMPT_STARTUP_TIMEOUT_S = 240.0
METRIC = (
    "tri-modal inference samples/sec (1 TPU chip, bf16, "
    "forward + on-device decode)"
)
# MFU denominator: TPU v5e (lite) peak bf16 matmul throughput per chip.
PEAK_BF16_FLOPS = 197e12


def get_cpu_baseline():
    if BASELINE_CACHE.exists():
        return json.load(open(BASELINE_CACHE))["cpu_samples_per_sec"]
    return None  # never burn TPU-bench budget measuring torch-CPU here


# ---------------------------------------------------------------------------
# child: actually measure on the device; stream one RESULT line per batch
# ---------------------------------------------------------------------------


def child_main(deadline_s: float) -> None:
    import threading

    # liveness heartbeat on STDOUT: long compiles are silent for minutes and
    # must not be treated as hangs. Heartbeats are printed from a daemon
    # thread, so they do NOT prove the main thread is alive — the parent's
    # stall detector therefore keys on the PHASE lines below (printed from
    # the MAIN thread), not on heartbeats: a child whose main thread hangs
    # in backend init on a dead tunnel stops producing phases and is killed
    # + respawned.
    stop_hb = threading.Event()

    def _hb():
        while not stop_hb.wait(15.0):
            print("HEARTBEAT", flush=True)

    threading.Thread(target=_hb, daemon=True).start()

    from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    devices = jax.devices()  # backend init: hangs here when the tunnel died
    print("PHASE devices-ok", flush=True)
    print(f"# devices: {devices}", file=sys.stderr, flush=True)
    print(
        "RESULT " + json.dumps({"kind": "meta", "device": str(devices[0])}),
        flush=True,
    )

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        DetectorSpec,
        load_config,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.ops.decode import (
        decode_centernet_predictions,
    )

    def emit(kind: str, **kw) -> None:
        print("RESULT " + json.dumps({"kind": kind, **kw}), flush=True)

    cfg = load_config(str(REPO / "configs" / "base.yaml"))
    spec = DetectorSpec.from_config(cfg)
    compat = CompatFlags.from_config(cfg)
    model = MultiModal3DDetector(spec=spec, dtype=jnp.bfloat16)

    h, w = spec.camera.image_size
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng},
        jnp.zeros((1, 6, h, w, 3), jnp.bfloat16),
        jnp.zeros((1, spec.lidar.max_points, 4), jnp.bfloat16),
        jnp.zeros(
            (1, spec.radar.num_radars, spec.radar.max_points_per_sensor, 7),
            jnp.bfloat16,
        ),
        train=False,
    )

    @jax.jit
    def infer(variables, cams, lidar, radars):
        preds = model.apply(variables, cams, lidar, radars, train=False)
        return decode_centernet_predictions(
            preds,
            max_detections=spec.centernet.max_detections,
            voxel_size=2.048,
            pc_range=spec.bev.pc_range,
            class_always_zero=compat.decode_class_always_zero,
        )

    def sync(out):
        # host transfer of a small output: forces completion of all queued
        # device work (block_until_ready alone is unreliable on the
        # experimental tunneled platform)
        return float(np.asarray(out["scores"]).sum())

    cost_flops = _cost_flops

    got_one = False
    # b=32 first: cheapest good compile on a COLD cache (a first number in
    # the bank beats everything), then b=64 (the best-known config,
    # ARCHITECTURE.md r02: 532 samples/s). The train-step measurement runs
    # BEFORE the b=8 tail so the driver-verifiable train number (VERDICT r02
    # item 7) outranks a third inference point when budget runs short.
    def measure_infer(bs: int) -> bool:
        try:
            # inputs are generated ON DEVICE: a host randn at b=64 is 5.5 GB
            # of float64 plus a ~1.4 GB transfer over the ~60 MB/s tunnel —
            # minutes of harness overhead per batch size that starved the
            # train measurement out of the driver budget
            k = jax.random.PRNGKey(bs)
            kc, kl, kr = jax.random.split(k, 3)
            cams = jax.random.normal(kc, (bs, 6, h, w, 3), jnp.bfloat16)
            lidar = jax.random.normal(
                kl, (bs, spec.lidar.max_points, 4), jnp.bfloat16
            )
            radars = jax.random.normal(
                kr,
                (
                    bs, spec.radar.num_radars,
                    spec.radar.max_points_per_sensor, 7,
                ),
                jnp.bfloat16,
            )
            for _ in range(2):
                sync(infer(variables, cams, lidar, radars))
            t0 = time.perf_counter()
            iters = 8
            for _ in range(iters):
                out = infer(variables, cams, lidar, radars)
            sync(out)
            elapsed = time.perf_counter() - t0
            flops = cost_flops(infer, variables, cams, lidar, radars)
            mfu = (
                round(flops * iters / elapsed / PEAK_BF16_FLOPS, 4)
                if flops else None
            )
            emit("infer", batch=bs, sps=round(bs * iters / elapsed, 3),
                 ms_per_iter=round(1000 * elapsed / iters, 2), mfu=mfu)
            return True
        except Exception as e:  # OOM at large batch etc.
            print(f"# batch={bs} failed: {e}", file=sys.stderr, flush=True)
            return False

    for bs in (32, 64):
        if got_one and time.monotonic() > deadline_s:
            print(f"# budget: skipping batch={bs}", file=sys.stderr, flush=True)
            continue
        got_one = measure_infer(bs) or got_one

    # train-step throughput (driver-verifiable; VERDICT r02 item 7) — only
    # with leftover budget; the warm .jax_cache makes this cheap
    if got_one and time.monotonic() < deadline_s - 30:
        try:
            train_sps, train_mfu = _measure_train_step(spec)
            emit("train", batch=16, sps=round(train_sps, 3), mfu=train_mfu)
        except Exception as e:
            print(f"# train measurement failed: {e}", file=sys.stderr,
                  flush=True)

    # small-batch latency point last — least informative, first to drop on
    # budget, but ALSO the fallback when both large batches failed (e.g.
    # memory pressure): better one small number than none
    if (not got_one) or time.monotonic() < deadline_s:
        measure_infer(8)


def _cost_flops(jitted, *args):
    """Per-call FLOPs from XLA cost analysis (for MFU). lower() is a cheap
    retrace; compile() hits the in-process executable cache when the jit
    already ran at these shapes."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception as e:
        print(f"# cost_analysis failed: {e}", file=sys.stderr, flush=True)
        return None


def _measure_train_step(spec) -> tuple:
    """Mixed-precision (bf16 compute / f32 params) train-step samples/sec at
    the best-known batch (b=16, ARCHITECTURE.md)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        CompatFlags,
        TrainSpec,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.models import (
        MultiModal3DDetector,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.train import Trainer

    bs = 16
    model = MultiModal3DDetector(spec=spec, dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainSpec(batch_size=bs), CompatFlags())
    h, w = spec.camera.image_size
    max_objects = 32
    boxes = np.zeros((bs, max_objects, 7), np.float32)
    labels = np.full((bs, max_objects), -1, np.int64)
    boxes[:, 0] = [5.0, 5.0, 0.0, 2.0, 4.0, 1.5, 0.3]
    labels[:, 0] = 0
    # sensor tensors generated ON DEVICE (a host randn + device_put would
    # cost GBs of host float64 plus a ~350 MB tunnel transfer — harness
    # overhead, not step time); gt arrays are tiny and stay host-built
    kc, kl, kr = jax.random.split(jax.random.PRNGKey(0), 3)
    batch = {
        "camera_imgs": jax.random.normal(
            kc, (bs, 6, h, w, 3), jnp.float32
        ),
        "lidar_points": jax.random.normal(
            kl, (bs, spec.lidar.max_points, 4), jnp.float32
        ),
        "radar_points": jax.random.normal(
            kr,
            (bs, spec.radar.num_radars, spec.radar.max_points_per_sensor, 7),
            jnp.float32,
        ),
        "gt_boxes": jax.device_put(boxes),
        "gt_labels": jax.device_put(labels),
        "gt_velocities": jax.device_put(
            np.zeros((bs, max_objects, 2), np.float32)
        ),
    }
    trainer.init_state(batch)
    state = trainer.state
    jax.block_until_ready(batch)
    # warmup (compile)
    state, losses = trainer.train_step(state, batch, trainer.rng)
    float(losses["total_loss"])
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters):
        state, losses = trainer.train_step(state, batch, trainer.rng)
    float(losses["total_loss"])  # sync
    elapsed = time.perf_counter() - t0
    flops = _cost_flops(trainer.train_step, state, batch, trainer.rng)
    mfu = (
        round(flops * iters / elapsed / PEAK_BF16_FLOPS, 4) if flops else None
    )
    return bs * iters / elapsed, mfu


# ---------------------------------------------------------------------------
# parent: spawn/respawn the child, stream results, always end with valid JSON
# ---------------------------------------------------------------------------


LAST_GOOD_CACHE = REPO / "bench_last_good.json"


def _git_commit():
    try:
        head = subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if not head:
            return None
        dirty = subprocess.run(
            ["git", "-C", str(REPO), "status", "--porcelain"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        return head + ("-dirty" if dirty else "")
    except Exception:
        return None


def _config_hash():
    import hashlib

    try:
        blob = (REPO / "configs" / "base.yaml").read_bytes()
        return hashlib.sha256(blob).hexdigest()[:16]
    except OSError:
        return None


class Reporter:
    """Holds best-so-far and guarantees the final JSON line exactly once."""

    def __init__(self):
        self.best_infer = None
        self.best_mfu = None
        self.train_sps = None
        self.train_mfu = None
        self.device = None
        self.cpu_sps = get_cpu_baseline()
        self.finalized = False
        # provenance: ties every recorded number (and the last-good fallback
        # it becomes) to the exact code + config under judgment
        self.git_commit = _git_commit()
        self.config_hash = _config_hash()

    def record(self, res: dict) -> None:
        if res.get("kind") == "meta":
            self.device = res.get("device")
            return  # context only — don't print a result line for it
        if res.get("kind") == "infer":
            if self.best_infer is None or res["sps"] > self.best_infer:
                self.best_infer = res["sps"]
                self.best_mfu = res.get("mfu")
        elif res.get("kind") == "train":
            self.train_sps = res["sps"]
            self.train_mfu = res.get("mfu")
        payload = self._payload()
        try:  # persist for the TPU-unavailable fallback annotation
            json.dump(
                {**payload, "recorded_at": time.strftime("%Y-%m-%d %H:%M")},
                open(LAST_GOOD_CACHE, "w"),
            )
        except OSError:
            pass
        print(json.dumps(payload), flush=True)

    def _payload(self) -> dict:
        out = {
            "metric": METRIC,
            "value": self.best_infer,
            "unit": "samples/sec",
            "vs_baseline": (
                round(self.best_infer / self.cpu_sps, 2)
                if self.best_infer and self.cpu_sps
                else None
            ),
        }
        if self.best_mfu is not None:
            out["mfu"] = self.best_mfu
        if self.train_sps is not None:
            out["train_samples_per_sec"] = self.train_sps
            if self.train_mfu is not None:
                out["train_mfu"] = self.train_mfu
        out["git_commit"] = self.git_commit
        out["config_hash"] = self.config_hash
        if self.device is not None:
            out["device"] = self.device
        if self.best_infer is None:
            out["error"] = "no completed measurement (TPU unavailable?)"
            # the tunneled chip goes down for hours at a time; surface the
            # last run that DID complete so the artifact stays informative
            # (value stays null — this is context, not a measurement)
            if LAST_GOOD_CACHE.exists():
                try:
                    out["last_good_run"] = json.load(open(LAST_GOOD_CACHE))
                except (OSError, json.JSONDecodeError):
                    pass
        return out

    def finalize(self) -> None:
        if not self.finalized:
            self.finalized = True
            # single atomic write with a LEADING newline: finalize() can run
            # from the SIGTERM handler between the bytecodes of a record()
            # print, and the final line must stay parseable even if it lands
            # mid-line (the r02 failure mode)
            payload = json.dumps(self._payload())
            os.write(1, ("\n" + payload + "\n").encode())


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(deadline_s=float(sys.argv[2]))
        return

    reporter = Reporter()
    deadline = time.monotonic() + TOTAL_BUDGET_S
    proc = None

    def on_term(signum, frame):
        if proc is not None and proc.poll() is None:
            proc.kill()
        reporter.finalize()
        sys.exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        remaining = deadline - time.monotonic()
        proc = subprocess.Popen(
            [sys.executable, __file__, "--child", str(time.monotonic() + remaining - 20)],
            stdout=subprocess.PIPE,
            text=True,
            bufsize=1,
        )
        got_any = False
        got_phase = False
        last_progress_t = time.monotonic()
        while True:
            if time.monotonic() > deadline:
                proc.kill()
                break
            # main thread produced no PHASE/RESULT line -> backend init is
            # hung on the dead tunnel; kill and retry (heartbeats don't
            # count, see ATTEMPT_STARTUP_TIMEOUT_S)
            if (
                not got_any
                and not got_phase
                and time.monotonic() - last_progress_t
                > ATTEMPT_STARTUP_TIMEOUT_S
            ):
                print(
                    f"# attempt {attempt}: no main-thread progress for "
                    f"{ATTEMPT_STARTUP_TIMEOUT_S:.0f}s, killing child",
                    file=sys.stderr, flush=True,
                )
                proc.kill()
                break
            line = _readline_with_timeout(proc, 5.0)
            if line is None:  # EOF: child exited
                break
            if not line or line.startswith("HEARTBEAT"):
                continue
            last_progress_t = time.monotonic()
            if line.startswith("PHASE "):
                got_phase = True
                continue
            if line.startswith("RESULT "):
                try:
                    res = json.loads(line[len("RESULT "):])
                except json.JSONDecodeError:
                    continue
                reporter.record(res)
                # meta lines (device banner) are progress, not measurements —
                # counting them as results would suppress the kill-and-respawn
                # retry when the child dies before producing any number
                if res.get("kind") != "meta":
                    got_any = True
        try:
            rc = proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            rc = None
        if got_any and rc == 0:
            break  # clean complete run
        if got_any:
            break  # partial results are results; don't redo the sweep
        wait = min(20.0 * attempt, 60.0, max(deadline - time.monotonic(), 0))
        if wait <= 0:
            break
        print(
            f"# attempt {attempt} produced nothing (rc={rc}); "
            f"retrying in {wait:.0f}s",
            file=sys.stderr, flush=True,
        )
        time.sleep(wait)

    reporter.finalize()


def _readline_with_timeout(proc, timeout_s: float):
    """One stdout line, or '' on timeout, or None on EOF. select() keeps the
    parent's main thread interruptible so the SIGTERM handler always runs."""
    import select

    r, _, _ = select.select([proc.stdout], [], [], timeout_s)
    if not r:
        if proc.poll() is not None:
            return None
        return ""
    line = proc.stdout.readline()
    if line == "":
        return None
    return line.strip()


if __name__ == "__main__":
    main()
