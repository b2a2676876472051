"""Batched inference server (serving.py): request coalescing, padding
correctness, parity with the single-sample engine path."""

import pathlib

import numpy as np
import pytest

from conftest import tiny_batch


@pytest.fixture(scope="module")
def tiny_config():
    from bevfusion_multimodal_3d_object_detection_tpu.config import (
        load_config,
    )

    cfg = load_config(
        str(pathlib.Path(__file__).parents[1] / "configs" / "base.yaml")
    )
    cfg["model"]["camera_encoder"]["input_size"] = [32, 64]
    cfg["dataset"]["cameras"]["image_size"] = [32, 64]
    # dataset.max_points takes precedence over the encoder keys in
    # DetectorSpec.from_config — override both
    cfg["dataset"]["max_points"] = {"lidar": 256, "radar_per_sensor": 16}
    cfg["model"]["lidar_encoder"]["max_points"] = 256
    cfg["model"]["radar_encoder"]["max_points_per_sensor"] = 16
    return cfg


def _samples(n):
    batch = tiny_batch(batch_size=n, seed=3)
    return [
        {
            "camera_imgs": batch["camera_imgs"][i],
            "lidar_points": batch["lidar_points"][i],
            "radar_points": batch["radar_points"][i],
        }
        for i in range(n)
    ]


def test_server_batches_and_matches_direct_path(tiny_config):
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=4, max_delay_ms=50.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    samples = _samples(6)
    with server:
        futures = [server.submit(s) for s in samples]
        results = [f.result(timeout=120) for f in futures]

    assert len(results) == 6
    for r in results:
        assert r["boxes"].shape[1] == 9
        assert len(r["scores"]) == len(r["labels"]) == len(r["boxes"])
        assert np.isfinite(r["scores"]).all()

    # the same sample alone must produce the same detections as in a
    # coalesced padded batch (static shapes, no cross-sample effects)
    solo = server._run_batch([samples[0]])[0]
    np.testing.assert_allclose(
        solo["scores"], results[0]["scores"], atol=1e-5
    )
    np.testing.assert_allclose(solo["boxes"], results[0]["boxes"], atol=1e-4)
    assert server.stats["requests"] == 6
    assert server.stats["batches"] >= 2  # 6 requests > one batch of 4


def test_server_fold_bn_bf16_smoke(tiny_config):
    """The production config (bf16 + folded BN) serves finite detections."""
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=True, fold_bn=True, score_threshold=0.0,
    )
    with server:
        res = server.infer(_samples(1)[0], timeout=180)
    assert np.isfinite(res["scores"]).all()
    assert res["boxes"].shape[1] == 9


def test_server_error_propagates_to_future(tiny_config):
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False,
    )
    bad = _samples(1)[0]
    bad["camera_imgs"] = bad["camera_imgs"][:, :8]  # wrong shape
    with server:
        # shape mismatch raises at submit (static-shape serving contract)
        with pytest.raises(ValueError):
            server.submit(bad)
        # a failure inside the serving graph still propagates to the future
        nan_sample = _samples(1)[0]
        import unittest.mock as mock

        with mock.patch.object(
            server, "_serve", side_effect=RuntimeError("device error")
        ):
            fut = server.submit(nan_sample)
            with pytest.raises(RuntimeError):
                fut.result(timeout=120)


def test_http_server_end_to_end(tiny_config):
    """HTTP surface: /healthz, /stats, and /infer with both npz and JSON
    bodies return well-formed responses through a real socket."""
    import io
    import json
    import threading
    import urllib.request

    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
        make_http_server,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    with server:
        httpd = make_http_server(server, "127.0.0.1", 0)  # ephemeral port
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                assert json.load(r)["status"] == "ok"

            sample = _samples(1)[0]
            buf = io.BytesIO()
            np.savez(buf, **sample)
            req = urllib.request.Request(
                f"{base}/infer", data=buf.getvalue(),
                headers={"Content-Type": "application/x-npz"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.load(r)
            boxes = np.asarray(out["boxes"])
            assert boxes.ndim == 2 and boxes.shape[1] == 9
            assert len(out["scores"]) == len(out["labels"]) == len(boxes)

            # JSON body path produces the same detections
            req = urllib.request.Request(
                f"{base}/infer",
                data=json.dumps(
                    {k: v.tolist() for k, v in sample.items()}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                out2 = json.load(r)
            np.testing.assert_allclose(
                np.asarray(out2["scores"]), np.asarray(out["scores"]),
                atol=1e-5,
            )

            with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
                stats = json.load(r)
            assert stats["requests"] >= 2

            # malformed body -> 400, not a crash
            req = urllib.request.Request(
                f"{base}/infer", data=b"not-a-sample",
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_uint8_wire_matches_float_path(tiny_config):
    """uint8 camera images normalized on device produce the same detections
    as host-normalized float input (the 4x-less-traffic serving wire)."""
    from bevfusion_multimodal_3d_object_detection_tpu.data.dataset import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    rng = np.random.RandomState(5)
    u8 = rng.randint(0, 255, (6, 32, 64, 3), np.uint8)
    base = _samples(1)[0]
    sample_u8 = dict(base, camera_imgs=u8)
    sample_f = dict(
        base,
        camera_imgs=(
            (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        ).astype(np.float32),
    )
    with server:
        out_u8 = server.infer(sample_u8, timeout=180)
        out_f = server.infer(sample_f, timeout=180)
    np.testing.assert_allclose(
        out_u8["scores"], out_f["scores"], atol=1e-4
    )
    np.testing.assert_allclose(out_u8["boxes"], out_f["boxes"], atol=1e-3)


def test_stop_fails_queued_futures(tiny_config):
    """Requests still queued when the server stops resolve with an error
    instead of hanging forever."""
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False,
    )
    # never started: submissions sit in the queue
    fut = server.submit(_samples(1)[0])
    server.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        fut.result(timeout=5)
    # a stopped server cannot be restarted (the dispatch loop and queue
    # were torn down); failing loudly beats hanging clients
    with pytest.raises(RuntimeError, match="restarted"):
        server.start(warmup=False)


def test_mixed_wire_batch_normalizes_uint8(tiny_config):
    """A coalesced batch mixing uint8 and float camera wires must not feed
    raw 0-255 pixels to the model — the uint8 rows are normalized on host
    for the mixed batch and match their float-path detections."""
    from bevfusion_multimodal_3d_object_detection_tpu.data.dataset import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=200.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    rng = np.random.RandomState(9)
    u8 = rng.randint(0, 255, (6, 32, 64, 3), np.uint8)
    base = _samples(2)
    s_u8 = dict(base[0], camera_imgs=u8)
    s_f = base[1]  # float wire
    with server:
        # same-batch coalescing (200 ms window)
        fut_a = server.submit(s_u8)
        fut_b = server.submit(s_f)
        out_mixed = fut_a.result(timeout=180)
        fut_b.result(timeout=180)
        # reference: the same uint8 sample alone (uniform uint8 batch,
        # normalized on device)
        out_solo = server.infer(s_u8, timeout=180)
    np.testing.assert_allclose(
        out_mixed["scores"], out_solo["scores"], atol=1e-4
    )


def test_cancelled_future_does_not_kill_dispatch(tiny_config):
    """A client-cancelled queued future is skipped; the dispatch thread
    keeps serving subsequent requests."""
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    sample = _samples(1)[0]
    # cancel while still queued (server not started yet)
    fut = server.submit(sample)
    assert fut.cancel()
    with server:
        res = server.infer(sample, timeout=180)  # dispatch still alive
    assert "scores" in res


def test_http_oversized_request_413(tiny_config):
    """Content-Length over the cap gets 413 without the body being read."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
        make_http_server,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False,
    )
    with server:
        httpd = make_http_server(
            server, "127.0.0.1", 0, max_request_bytes=1024
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer", data=b"x" * 2048,
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 413
            assert "too large" in json.load(ei.value)["error"]
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_http_server_error_not_400(tiny_config):
    """Server-side faults surface as 5xx with a generic message — a stopped
    backend is 503, not a client error, and internals don't leak."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
        make_http_server,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False,
    )
    with server:
        httpd = make_http_server(server, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
    # server stopped, httpd still up: requests must get 503
    try:
        import io

        sample = _samples(1)[0]
        buf = io.BytesIO()
        np.savez(buf, **sample)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npz"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 503
        assert json.load(ei.value)["error"] == "server unavailable"
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_graceful_drain_completes_inflight(tiny_config):
    """The serve.py drain mechanism (non-daemon handler threads +
    block_on_close): a request in flight when shutdown begins still gets its
    response; server_close joins the handler thread."""
    import io
    import json
    import threading
    import urllib.request

    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
        make_http_server,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=300.0,  # slow window
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    with server:
        httpd = make_http_server(server, "127.0.0.1", 0)
        httpd.daemon_threads = False
        httpd.block_on_close = True
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()

        sample = _samples(1)[0]
        buf = io.BytesIO()
        np.savez(buf, **sample)
        result = {}

        def _client():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer", data=buf.getvalue(),
                headers={"Content-Type": "application/x-npz"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                result.update(json.load(r))

        ct = threading.Thread(target=_client)
        ct.start()
        import time as _time

        _time.sleep(0.05)  # request now in the coalescing window
        httpd.shutdown()      # stop accepting
        httpd.server_close()  # joins the in-flight handler thread
        ct.join(timeout=120)
    assert "boxes" in result  # the in-flight request completed


def test_client_roundtrip_and_errors(tiny_config):
    """InferenceClient: npz roundtrip matches the direct path; 400 raises
    ClientError without retries; transport errors retry then raise."""
    import threading

    from bevfusion_multimodal_3d_object_detection_tpu.client import (
        ClientError,
        InferenceClient,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
        make_http_server,
    )

    server = InferenceServer(
        config=tiny_config, batch_size=2, max_delay_ms=1.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
    )
    with server:
        httpd = make_http_server(server, "127.0.0.1", 0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            client = InferenceClient(f"http://127.0.0.1:{port}", retries=1)
            client.wait_ready(timeout_s=30)
            sample = _samples(1)[0]
            out = client.infer(sample)
            direct = server.infer(sample, timeout=120)
            np.testing.assert_allclose(
                out["scores"], direct["scores"], atol=1e-5
            )
            assert out["boxes"].shape[1] == 9
            assert client.stats()["requests"] >= 2

            # malformed sample -> ClientError (no retry storm)
            with pytest.raises(ClientError):
                client._request(
                    "/infer", data=b"junk", content_type="application/json"
                )
            # truncated/garbage npz body -> 400 (BadZipFile is a client
            # fault, not a 500 — ADVICE r03)
            with pytest.raises(ClientError) as exc:
                client._request(
                    "/infer",
                    data=b"PK\x03\x04garbage-not-a-zip",
                    content_type="application/x-npz",
                )
            assert exc.value.status == 400
        finally:
            httpd.shutdown()
            httpd.server_close()
    # dead port: bounded retries then the transport error surfaces
    dead = InferenceClient(
        f"http://127.0.0.1:{port}", retries=1, backoff_s=0.05, timeout_s=2
    )
    assert not dead.healthz()
    with pytest.raises(OSError):
        dead.infer(_samples(1)[0])


def test_server_mesh_sharded_matches_single_device(tiny_config):
    """Multi-chip serving: batches sharded over an 8-device 'data' mesh give
    the same detections as the unsharded server (same variables)."""
    import jax
    from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
        make_mesh,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=8)
    sharded = InferenceServer(
        config=tiny_config, batch_size=8, max_delay_ms=50.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0, mesh=mesh,
    )
    plain = InferenceServer(
        config=tiny_config, batch_size=8, max_delay_ms=50.0,
        use_bf16=False, fold_bn=False, score_threshold=0.0,
        variables=sharded.variables,
    )
    samples = _samples(3)
    with sharded:
        a = [sharded.submit(s) for s in samples]
        a = [f.result(timeout=120) for f in a]
    with plain:
        b = [plain.submit(s) for s in samples]
        b = [f.result(timeout=120) for f in b]
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(ra["scores"], rb["scores"], atol=1e-5)
        np.testing.assert_allclose(ra["boxes"], rb["boxes"], atol=1e-4)
        np.testing.assert_array_equal(ra["labels"], rb["labels"])


def test_server_mesh_batch_size_divisibility():
    from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
        make_mesh,
    )
    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
    )

    with pytest.raises(ValueError, match="divide"):
        InferenceServer(config={}, batch_size=6, mesh=make_mesh(n_data=4))


def test_client_post_retry_semantics(monkeypatch):
    """POSTs retry ONLY pre-connection failures (refused/DNS); a reset or
    broken pipe may arrive after the server accepted the request, so
    retrying would violate at-most-once (ADVICE r03). GETs retry anything
    transient."""
    import urllib.error

    from bevfusion_multimodal_3d_object_detection_tpu import client as cmod

    calls = {"n": 0}

    def fake_urlopen(exc):
        def _open(req, timeout=None):
            calls["n"] += 1
            raise exc

        return _open

    c = cmod.InferenceClient(
        "http://127.0.0.1:1", retries=2, backoff_s=0.0, timeout_s=1
    )

    # reset mid-POST: exactly ONE attempt, error surfaces
    calls["n"] = 0
    monkeypatch.setattr(
        cmod.urllib.request,
        "urlopen",
        fake_urlopen(urllib.error.URLError(ConnectionResetError("reset"))),
    )
    with pytest.raises(urllib.error.URLError):
        c._request("/infer", data=b"x")
    assert calls["n"] == 1

    # bare OSError (broken pipe) mid-POST: also one attempt
    calls["n"] = 0
    monkeypatch.setattr(
        cmod.urllib.request,
        "urlopen",
        fake_urlopen(BrokenPipeError("pipe")),
    )
    with pytest.raises(OSError):
        c._request("/infer", data=b"x")
    assert calls["n"] == 1

    # connection refused pre-POST: server never saw it -> full retries
    calls["n"] = 0
    monkeypatch.setattr(
        cmod.urllib.request,
        "urlopen",
        fake_urlopen(
            urllib.error.URLError(ConnectionRefusedError("refused"))
        ),
    )
    with pytest.raises(urllib.error.URLError):
        c._request("/infer", data=b"x")
    assert calls["n"] == 3

    # GET: resets ARE retryable (idempotent)
    calls["n"] = 0
    monkeypatch.setattr(
        cmod.urllib.request,
        "urlopen",
        fake_urlopen(urllib.error.URLError(ConnectionResetError("reset"))),
    )
    with pytest.raises(urllib.error.URLError):
        c._request("/stats")
    assert calls["n"] == 3


def test_client_encode_npz_strips_non_wire_keys():
    """encode_npz(dataset[i]) works as-is: token strings / gt arrays /
    plan arrays are dropped from the wire, and a sample with no model
    inputs at all is a clear error."""
    import io

    from bevfusion_multimodal_3d_object_detection_tpu.client import (
        encode_npz,
    )

    sample = {
        "camera_imgs": np.zeros((6, 4, 4, 3), np.uint8),
        "lidar_points": np.zeros((16, 4), np.float32),
        "token": "synthetic_0",
        "gt_boxes": np.zeros((3, 7), np.float32),
        "camera_seg_idx": np.zeros((6, 8), np.int32),
    }
    blob = encode_npz(sample)
    with np.load(io.BytesIO(blob)) as z:
        assert set(z.files) == {"camera_imgs", "lidar_points"}
        assert z["camera_imgs"].dtype == np.uint8
    with pytest.raises(ValueError, match="wire keys"):
        encode_npz({"token": "x"})
