"""Python client for the serving HTTP API (serve.py / serving.make_http_server).

The reference has no serving stack at all (SURVEY §5 — inference is a batch
CLI, ref: inference.py); this client completes the deployment surface added
here: npz wire encoding (uint8 camera pass-through for the low-traffic path),
bounded retries with exponential backoff on transient failures (connection
errors, 503), and no retries on client errors (4xx).

    from bevfusion_multimodal_3d_object_detection_tpu.client import (
        InferenceClient,
    )
    client = InferenceClient("http://127.0.0.1:8080")
    det = client.infer({"camera_imgs": imgs, "lidar_points": pts,
                        "radar_points": radar})
    det["boxes"], det["scores"], det["labels"]

Stdlib-only (urllib): importable anywhere the framework runs, no extra deps.
"""

from __future__ import annotations

import io
import json
import socket
import time
import urllib.error
import urllib.request
from typing import Dict, Optional

import numpy as np


class ServerError(RuntimeError):
    """5xx/503 from the server (retried up to the configured budget)."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class ClientError(ValueError):
    """4xx from the server — the request itself is wrong; never retried."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


# the serving wire contract (serving.py _validate): anything else a dataset
# sample carries — token strings, gt_* arrays, plan arrays — is not model
# input and must not be shipped (a raw dataset[i] is the natural argument)
WIRE_KEYS = ("camera_imgs", "lidar_points", "radar_points")


def encode_npz(sample: Dict[str, np.ndarray]) -> bytes:
    """np.savez the model-input keys of the sample dict. uint8 arrays
    (camera images on the compact wire — serving.py normalizes on device)
    stay uint8; everything else is cast to float32. Non-wire keys (token,
    gt_*, precomputed plans) are dropped so `client.infer(dataset[i])`
    works as-is."""
    wire = {k: sample[k] for k in WIRE_KEYS if k in sample}
    if not wire:
        raise ValueError(
            f"sample has none of the wire keys {WIRE_KEYS}; got "
            f"{sorted(sample)}"
        )
    buf = io.BytesIO()
    np.savez(
        buf,
        **{
            k: (
                np.asarray(v)
                if np.asarray(v).dtype == np.uint8
                else np.asarray(v, np.float32)
            )
            for k, v in wire.items()
        },
    )
    return buf.getvalue()


class InferenceClient:
    def __init__(
        self,
        base_url: str = "http://127.0.0.1:8080",
        timeout_s: float = 120.0,
        retries: int = 3,
        backoff_s: float = 0.5,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s
        self.retries = retries
        self.backoff_s = backoff_s

    # -- low-level ---------------------------------------------------------

    def _request(
        self,
        path: str,
        data: Optional[bytes] = None,
        content_type: str = "application/x-npz",
        retryable: bool = True,
    ) -> Dict:
        last: Exception = RuntimeError("no attempt")
        attempts = self.retries + 1 if retryable else 1
        for attempt in range(attempts):
            if attempt:
                time.sleep(self.backoff_s * (2 ** (attempt - 1)))
            req = urllib.request.Request(
                self.base_url + path,
                data=data,
                headers=(
                    {"Content-Type": content_type} if data is not None else {}
                ),
                method="POST" if data is not None else "GET",
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    return json.loads(r.read().decode())
            except urllib.error.HTTPError as e:
                body = e.read().decode(errors="replace")
                try:
                    msg = json.loads(body).get("error", body)
                except json.JSONDecodeError:
                    msg = body
                if 400 <= e.code < 500:
                    raise ClientError(e.code, msg) from None
                last = ServerError(e.code, msg)
                # 503 = unavailable (drain/stop): safe to retry. 504 = the
                # inference WAS accepted and timed out; 500 = unknown server
                # fault — retrying either can duplicate device work.
                if e.code != 503:
                    raise last from None
            except TimeoutError as e:
                # socket timeout: a POST may have been accepted and still be
                # in flight — retrying duplicates work; only GETs retry
                if data is not None:
                    raise
                last = e
            except (urllib.error.URLError, OSError) as e:
                if data is not None:
                    # POST: retry ONLY pre-connection failures (refused, DNS)
                    # where the server provably never saw the request. A
                    # reset/broken pipe can arrive AFTER the request was
                    # accepted — retrying would duplicate device work (same
                    # at-most-once rule as timeouts and 504).
                    cause = getattr(e, "reason", e)
                    if not isinstance(
                        cause, (ConnectionRefusedError, socket.gaierror)
                    ):
                        raise
                last = e  # refused/DNS (any method), or any GET failure
        raise last

    # -- API ---------------------------------------------------------------

    def infer(self, sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """One sample -> {"boxes": (K, 9) f32, "scores": (K,) f32,
        "labels": (K,) i32}. Retries only connection failures and 503
        (server draining/stopped) — NOT 504 (inference accepted but timed
        out), 500, or a socket timeout mid-POST, all of which may duplicate
        accepted work."""
        out = self._request("/infer", data=encode_npz(sample))
        return {
            "boxes": np.asarray(out["boxes"], np.float32),
            "scores": np.asarray(out["scores"], np.float32),
            "labels": np.asarray(out["labels"], np.int32),
        }

    def healthz(self) -> bool:
        try:
            return self._request("/healthz").get("status") == "ok"
        except Exception:
            return False

    def wait_ready(self, timeout_s: float = 300.0, poll_s: float = 1.0) -> None:
        """Block until /healthz answers (the serving graph compile on a cold
        cache takes minutes on this host)."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if self.healthz():
                return
            time.sleep(poll_s)
        raise TimeoutError(f"server not ready after {timeout_s:.0f}s")

    def stats(self) -> Dict:
        return self._request("/stats")
