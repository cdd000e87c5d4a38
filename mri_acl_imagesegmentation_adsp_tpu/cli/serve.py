"""Persistent segmentation serving daemon.

The reference ships batch CLIs only; this fills the production-serving
surface the rebuild targets: a long-lived process that loads a trained
checkpoint (or an int8 artifact from ``cli.quantize``) ONCE, keeps the
jitted program warm, and answers whole-volume segmentation requests over
HTTP — so the per-request cost is one device dispatch per volume
(``infer.segment_volume_2d``'s single-``lax.scan`` pattern), never a
process start or a recompile.

Usage:
  python -m mri_acl_imagesegmentation_adsp_tpu.cli.serve \
      --ckpt runs/fastmri_unet/best.ckpt --port 8080 [--batch-size 16]
  # or serve the standalone quantized artifact (no checkpoint needed):
  python -m mri_acl_imagesegmentation_adsp_tpu.cli.serve \
      --qtree runs/fastmri_unet/quant_int8.npz --port 8080

Protocol (stdlib-only on both sides):
  GET  /healthz            -> JSON {status, k, classes, source, requests}
  POST /v1/segment         body: .npz bytes with array "img"
                           ((S,H,W) or (S,1,H,W) float32, preprocessed the
                           same way training volumes were)
                           query: ?probs=1 to include probabilities,
                                  ?threshold=0.5 binary cutoff
                           -> .npz bytes {mask uint8 (S,H,W)
                                          [, probs float32 (S,C,H,W)]}

Client example:
  buf = io.BytesIO(); np.savez_compressed(buf, img=vol)
  req = urllib.request.Request(url + "/v1/segment", data=buf.getvalue())
  out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))

Single-device serving; requests are serialized around the device (the
chip is the throughput bound either way — a ThreadingHTTPServer accepts
concurrent connections so health checks never queue behind inference).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


class _ModelRunner:
    """Owns the bound apply_fn + metadata; serializes device access."""

    def __init__(self, apply_fn, k: int, classes: int, source: str,
                 batch_size: int):
        self.apply_fn = apply_fn
        self.k = k
        self.classes = classes
        self.source = source
        self.batch_size = batch_size
        self.requests = 0
        self.slices = 0
        self.errors = 0
        self.seconds = 0.0          # cumulative in-lock segmentation time
        self.last_latency_s = 0.0
        self._lock = threading.Lock()

    def segment(self, vol: np.ndarray, threshold: float,
                want_probs: bool) -> dict:
        from ..infer import segment_volume_2d

        if vol.ndim not in (3, 4):
            raise ValueError(f"img must be (S,H,W) or (S,1,H,W), "
                             f"got shape {vol.shape}")
        with self._lock:
            t0 = time.perf_counter()
            probs = segment_volume_2d(self.apply_fn, vol.astype(np.float32),
                                      k=self.k, batch_size=self.batch_size,
                                      classes=self.classes)
            self.last_latency_s = time.perf_counter() - t0
            self.seconds += self.last_latency_s
            self.requests += 1
            self.slices += int(vol.shape[0])
        if self.classes == 1:
            mask = (probs[:, 0] > threshold).astype(np.uint8)
        else:
            mask = probs.argmax(axis=1).astype(np.uint8)
        out = {"mask": mask}
        if want_probs:
            out["probs"] = probs
        return out

    def warmup(self, shape) -> None:
        """Pre-compile at the production volume shape (jit is once-per-
        shape; an un-warmed first request pays the compile)."""
        self.segment(np.zeros(shape, np.float32), 0.5, False)


def _build_runner(args) -> _ModelRunner:
    import jax.numpy as jnp  # noqa: F401  (ensures backend selected early)

    from .infer import load_model_from_ckpt, make_input_norm

    if args.qtree:
        from .quantize import load_engine
        eng, qtree, meta = load_engine(args.qtree)
        norm = make_input_norm(bool(meta.get("imagenet_norm")))

        def apply_fn(x):
            return eng.apply(qtree, norm(x))

        return _ModelRunner(apply_fn, meta["k"], meta["classes"], "qtree",
                            args.batch_size)

    model, params, batch_stats, margs = load_model_from_ckpt(args.ckpt)
    norm = make_input_norm(bool(margs.get("imagenet_norm")))

    def apply_fn(x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           norm(x), train=False)

    return _ModelRunner(apply_fn, margs.get("k", 1),
                        margs.get("classes", 1), "ckpt", args.batch_size)


class _Handler(BaseHTTPRequestHandler):
    # set as a class attribute by create_server
    runner: _ModelRunner = None

    def log_message(self, fmt, *a):  # quiet by default; stdout is the API
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = urlparse(self.path).path
        r = self.runner
        if path == "/healthz":
            return self._json(200, {"status": "ok", "k": r.k,
                                    "classes": r.classes,
                                    "source": r.source,
                                    "requests": r.requests})
        if path == "/metricsz":
            # Prometheus text exposition (counters/gauges; stdlib-only)
            body = (
                "# TYPE serve_requests_total counter\n"
                f"serve_requests_total {r.requests}\n"
                "# TYPE serve_slices_total counter\n"
                f"serve_slices_total {r.slices}\n"
                "# TYPE serve_errors_total counter\n"
                f"serve_errors_total {r.errors}\n"
                "# TYPE serve_busy_seconds_total counter\n"
                f"serve_busy_seconds_total {r.seconds:.6f}\n"
                "# TYPE serve_last_latency_seconds gauge\n"
                f"serve_last_latency_seconds {r.last_latency_s:.6f}\n"
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            return self.wfile.write(body)
        return self._json(404, {"error": "unknown path"})

    def do_POST(self):
        url = urlparse(self.path)
        if url.path != "/v1/segment":
            return self._json(404, {"error": "unknown path"})
        try:
            n = int(self.headers.get("Content-Length", 0))
            with np.load(io.BytesIO(self.rfile.read(n)),
                         allow_pickle=False) as z:
                if "img" not in z:
                    raise ValueError("npz body must contain array 'img'")
                vol = z["img"]
            q = parse_qs(url.query)
            threshold = float(q.get("threshold", ["0.5"])[0])
            want_probs = q.get("probs", ["0"])[0] in ("1", "true")
            out = self.runner.segment(vol, threshold, want_probs)
        except ValueError as exc:
            self.runner.errors += 1
            return self._json(400, {"error": str(exc)})
        except Exception as exc:  # surface device/shape errors to the client
            self.runner.errors += 1
            return self._json(500, {"error": f"{type(exc).__name__}: {exc}"})
        buf = io.BytesIO()
        np.savez_compressed(buf, **out)
        body = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", "application/x-npz")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def create_server(args) -> ThreadingHTTPServer:
    """Build the runner (loads + warms the model) and bind the server.
    Split from main() so tests can bind port 0 and drive it in-process."""
    runner = _build_runner(args)
    if args.warmup_shape:
        shape = tuple(int(v) for v in args.warmup_shape.split(","))
        runner.warmup(shape)
    handler = type("BoundHandler", (_Handler,), {"runner": runner})
    return ThreadingHTTPServer((args.host, args.port), handler)


def main(argv=None) -> int:
    p = argparse.ArgumentParser("Segmentation serving daemon")
    p.add_argument("--ckpt", help="trained checkpoint (cli.infer format)")
    p.add_argument("--qtree", help="quantized artifact from cli.quantize "
                                   "(serves without the checkpoint)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--warmup-shape", default="",
                   help="'S,H,W' to pre-compile at the production volume "
                        "shape before accepting requests (e.g. 16,320,320); "
                        "empty = no warmup, first request pays the compile")
    args = p.parse_args(argv)
    if not args.ckpt and not args.qtree:
        p.error("one of --ckpt / --qtree is required")

    server = create_server(args)
    host, port = server.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "source": "qtree" if args.qtree else "ckpt"}),
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
