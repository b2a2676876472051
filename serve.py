#!/usr/bin/env python
"""Production HTTP serving CLI (the deployment surface the reference lacks).

    python serve.py --model checkpoints/best_model.msgpack \
        [--config configs/base.yaml] [--host 0.0.0.0] [--port 8080] \
        [--batch-size 8] [--max-delay-ms 5] [--score-threshold 0.3] \
        [--f32] [--no-fold-bn] [--pallas]

Wraps `bevfusion_multimodal_3d_object_detection_tpu.serving.InferenceServer`
(one jitted forward+decode graph, request coalescing into fixed-size device
batches) behind a stdlib ThreadingHTTPServer:

    GET  /healthz  liveness (after warmup compile)
    GET  /stats    request/batch/latency counters
    POST /infer    one sample as application/x-npz (np.savez of camera_imgs/
                   lidar_points/radar_points) or application/json lists;
                   returns {"boxes": (K, 9), "scores", "labels"}.

With --model omitted the server runs from random init (smoke mode).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default=None)
    ap.add_argument("--config", default="configs/base.yaml")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-delay-ms", type=float, default=5.0)
    ap.add_argument("--score-threshold", type=float, default=0.3)
    ap.add_argument("--f32", action="store_true",
                    help="serve in float32 (default bfloat16)")
    ap.add_argument("--no-fold-bn", action="store_true",
                    help="keep BatchNorms in the serving graph")
    ap.add_argument("--pallas", action="store_true",
                    help="use the fused Pallas PointNet (wins at batch>=128)")
    ap.add_argument("--max-request-mb", type=float, default=64.0,
                    help="reject POST bodies larger than this with 413")
    ap.add_argument("--drain-timeout", type=float, default=30.0,
                    help="max seconds to wait for in-flight requests on "
                    "SIGTERM/SIGINT before forcing exit")
    ap.add_argument("--data-parallel", type=int, default=1,
                    help="shard each serving batch over this many devices "
                    "(multi-chip serving; batch-size must divide by it)")
    ap.add_argument("--aot", default=None, metavar="PATH",
                    help="serve from an AOT artifact (utils/aot.py) instead "
                    "of retracing the model — validates shapes at startup")
    ap.add_argument("--export-aot", default=None, metavar="PATH",
                    help="export the serving graph as a portable AOT "
                    "artifact (StableHLO, tpu+cpu) and exit")
    args = ap.parse_args()
    if args.export_aot and args.aot:
        raise SystemExit(
            "--export-aot and --aot are mutually exclusive (exporting "
            "needs the live jitted trace, not a deserialized artifact)"
        )
    if args.export_aot and args.data_parallel > 1:
        raise SystemExit(
            "--export-aot requires an unpartitioned server: drop "
            "--data-parallel for the export (artifacts are traced "
            "single-device; --data-parallel applies to live serving only)"
        )

    from bevfusion_multimodal_3d_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from bevfusion_multimodal_3d_object_detection_tpu.serving import (
        InferenceServer,
        make_http_server,
    )

    mesh = None
    if args.data_parallel > 1:
        import jax

        from bevfusion_multimodal_3d_object_detection_tpu.parallel import (
            make_mesh,
        )

        n_dev = len(jax.devices())
        if args.data_parallel > n_dev:
            raise SystemExit(
                f"--data-parallel {args.data_parallel} needs that many "
                f"devices, but only {n_dev} available (use "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
                "virtual CPU mesh)"
            )
        mesh = make_mesh(n_data=args.data_parallel)
        print(f"Serving mesh: {mesh}")

    server = InferenceServer(
        model_path=args.model,
        config_path=args.config,
        batch_size=args.batch_size,
        max_delay_ms=args.max_delay_ms,
        score_threshold=args.score_threshold,
        use_bf16=not args.f32,
        fold_bn=not args.no_fold_bn,
        use_pallas=args.pallas,
        mesh=mesh,
        aot_path=args.aot,
    )
    if args.export_aot:
        from bevfusion_multimodal_3d_object_detection_tpu.utils.aot import (
            export_serving_artifact,
        )

        meta = export_serving_artifact(server, args.export_aot)
        print(
            f"AOT artifact written to {args.export_aot} "
            f"(batch={meta['batch_size']}, signatures={meta['signatures']}, "
            f"platforms={meta['platforms']})"
        )
        return
    if args.aot:
        print(f"Loading AOT serving graph from {args.aot} "
              f"(batch={args.batch_size}) ...")
    else:
        print(f"Compiling serving graph (batch={args.batch_size}) ...")
    with server:  # warmup compile happens in start()
        httpd = make_http_server(
            server, args.host, args.port,
            max_request_bytes=int(args.max_request_mb * 1024 * 1024),
        )
        # graceful drain: stop accepting, finish in-flight handler threads
        # (joined by server_close thanks to non-daemon threads), then let
        # `with server` drain the inference queue. A watchdog forces exit if
        # a wedged client connection holds drain past --drain-timeout.
        httpd.daemon_threads = False
        httpd.block_on_close = True

        import os
        import signal
        import threading

        def _forced_exit():
            # the drain TIMED OUT: in-flight requests were dropped and the
            # InferenceServer never cleaned up — report failure (nonzero) so
            # supervisors alert instead of recording a clean shutdown
            print(
                f"drain did not finish within {args.drain_timeout:.0f}s; "
                "forcing exit (requests dropped)",
                flush=True,
            )
            os._exit(1)

        def _drain(signum, frame):
            print(f"Signal {signum}: draining in-flight requests "
                  f"(timeout {args.drain_timeout:.0f}s)")
            threading.Thread(target=httpd.shutdown, daemon=True).start()
            t = threading.Timer(args.drain_timeout, _forced_exit)
            t.daemon = True
            t.start()

        signal.signal(signal.SIGTERM, _drain)
        signal.signal(signal.SIGINT, _drain)
        print(f"Serving on http://{args.host}:{args.port} "
              f"(POST /infer, GET /healthz, GET /stats)")
        try:
            httpd.serve_forever()
        finally:
            httpd.server_close()
        print("Drained; shutting down")


if __name__ == "__main__":
    main()
