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
  GET  /healthz            -> JSON {status, task, k, classes, source,
                                    requests}
  GET  /metricsz           -> Prometheus text exposition (counters)
  POST /v1/segment         (--task segment, the default)
                           body: .npz bytes with array "img"
                           ((S,H,W) or (S,1,H,W) float32, preprocessed the
                           same way training volumes were)
                           query: ?probs=1 to include probabilities,
                                  ?threshold=0.5 binary cutoff
                           -> .npz bytes {mask uint8 (S,H,W)
                                          [, probs float32 (S,C,H,W)]}
  POST /v1/segment_kspace  (--task segment) raw k-space in, mask out: the
                           full on-device preprocess chain (iFFT -> clip
                           -> Otsu body mask -> resize -> z-score,
                           data/preprocess.py) runs in front of the model
                           inside one request.
                           body: .npz with "kspace" real-pair float32,
                           (S,H,W,2) single-coil or (S,C,H,W,2) multi-coil
                           (multi-coil recon = per-coil iFFT + RSS)
                           query: ?probs / ?threshold as above,
                                  ?keep=lo,hi slice keep band (default
                                  0,1 = serve every slice; training used
                                  0.3,0.7)
                           -> .npz {mask uint8, body_mask uint8,
                                    indices int64 [, probs]}
  POST /v1/reconstruct     (--task recon; --ckpt is a varnet_best.ckpt)
                           body: .npz with "kspace" and "espirit"
                           real-pair arrays (coils,aves,h,w,2)
                           -> .npz {recon float32 (h,w)}
  POST /v1/classify        (--task classify; --ckpt is a
                           classifier_best.ckpt)
                           body: .npz with "x" (N,H,W,C) float32 slices
                           (C = the trained stem: 1, or 2 for diff
                           (b1500, ADC); (N,H,W) accepted when C==1)
                           -> .npz {probs float32 (N,)} sigmoid scores

Client example:
  buf = io.BytesIO(); np.savez_compressed(buf, img=vol)
  req = urllib.request.Request(url + "/v1/segment", data=buf.getvalue())
  out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))

Single-device serving; requests are serialized around the device (a
ThreadingHTTPServer accepts concurrent connections so health checks never
queue behind inference). Under concurrent load, --microbatch-window-ms
coalesces /v1/segment requests arriving within the window into ONE device
dispatch (infer.segment_volumes_2d) — per-request results equal to
float-reassociation tolerance, higher aggregate RPS than queueing on the
lock.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


class _MicroBatcher:
    """Coalesces concurrent /v1/segment requests into ONE device dispatch.

    Without this the daemon serializes the chip per request (the r3 design:
    one lock, one volume per dispatch) — concurrent clients queue and each
    pays a full dispatch. With a bounded wait window (default 5 ms), the
    first request to arrive waits for followers; everything pending is then
    segmented in one ``segment_volumes_2d`` scan (numerically equivalent
    to the per-request path — per-volume neighbor stacks, per-slice eval
    model; see segment_volumes_2d's tolerance note).
    Requests with mismatched (H, W) are grouped and dispatched per shape.

    One dedicated dispatcher thread owns the device; handler threads block
    on a per-request event. A failed GROUP dispatch retries each item
    individually so a poisoned request only fails itself.
    """

    def __init__(self, runner: "_ModelRunner", window_ms: float = 5.0,
                 max_group: int = 64):
        self.runner = runner
        self.window = max(0.0, float(window_ms)) / 1000.0
        self.max_group = int(max_group)
        self._cv = threading.Condition()
        self._pending: list = []
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="serve-microbatch")
        self._thread.start()

    class _Item:
        __slots__ = ("vol", "thr", "event", "out", "exc")

        def __init__(self, vol, thr):
            self.vol = vol
            self.thr = thr          # None = probabilities; else mask-only
            self.event = threading.Event()
            self.out = None
            self.exc = None

    def submit(self, vol: np.ndarray, thr=None) -> np.ndarray:
        """Blocking: returns (S,C,H,W) probabilities (thr None) or the
        (S,H,W) uint8 mask thresholded on device (thr set)."""
        it = self._Item(vol, thr)
        with self._cv:
            self._pending.append(it)
            self._cv.notify()
        it.event.wait()
        if it.exc is not None:
            raise it.exc
        return it.out

    def _loop(self):
        while True:
            with self._cv:
                while not self._pending:
                    self._cv.wait()
            if self.window:
                time.sleep(self.window)     # bounded coalescing wait
            with self._cv:
                group, self._pending = (self._pending[:self.max_group],
                                        self._pending[self.max_group:])
            # one dispatch per ((H, W), threshold-mode) group
            by_key: dict = {}
            for it in group:
                by_key.setdefault((tuple(it.vol.shape[-2:]), it.thr),
                                  []).append(it)
            for (_, thr), items in by_key.items():
                try:
                    outs = self.runner.segment_many(
                        [it.vol for it in items], thr)
                    for it, out in zip(items, outs):
                        it.out = out
                except Exception:
                    # retry individually: only the poisoned item fails
                    for it in items:
                        try:
                            it.out = self.runner.segment_many(
                                [it.vol], it.thr)[0]
                        except Exception as exc:   # noqa: BLE001
                            it.exc = exc
                for it in items:
                    it.event.set()


class _ModelRunner:
    """Owns the bound apply_fn + metadata; serializes device access."""

    task = "segment"

    def __init__(self, apply_fn, k: int, classes: int, source: str,
                 batch_size: int, pre_out_size=(320, 320), mesh=None,
                 microbatch_window_ms: float = 0.0):
        self.apply_fn = apply_fn
        self.k = k
        self.classes = classes
        self.source = source
        self.batch_size = batch_size
        # optional data-parallel mesh: each scan step's batch shards over
        # every mesh axis (segment_volume_2d mesh= semantics)
        self.mesh = mesh
        # resize target of the /v1/segment_kspace preprocess chain — must
        # match the resolution the served model was trained at
        self.pre_out_size = tuple(int(v) for v in pre_out_size)
        self.requests = 0
        self.slices = 0
        self.errors = 0
        self.seconds = 0.0          # cumulative in-lock segmentation time
        self.last_latency_s = 0.0
        self._lock = threading.Lock()        # serializes the device
        self.stats_lock = threading.Lock()   # guards the counters only
        # preprocessors keyed by slice-keep band: MRIKneePreprocessor's
        # jitted chain caches on instance identity (static self), so one
        # instance per band keeps requests compile-free after the first
        self._pres: dict = {}
        # cross-request micro-batching (window > 0): /v1/segment requests
        # coalesce into one dispatch instead of queueing on the lock
        self.batcher = (_MicroBatcher(self, microbatch_window_ms)
                        if microbatch_window_ms > 0 else None)

    def count_error(self) -> None:
        """Thread-safe error-counter bump (handler threads race)."""
        with self.stats_lock:
            self.errors += 1

    def segment_many(self, vols, mask_threshold=None) -> list:
        """One device dispatch for a GROUP of volumes (micro-batch path);
        also the single-volume workhorse. Returns [(S_i,C,H,W) probs], or
        [(S_i,H,W) uint8 masks] with mask_threshold set (thresholded on
        device — 4x less download for the mask-only default request)."""
        from ..infer import segment_volumes_2d

        with self._lock:
            t0 = time.perf_counter()
            outs = segment_volumes_2d(
                self.apply_fn, [v.astype(np.float32) for v in vols],
                k=self.k, batch_size=self.batch_size,
                classes=self.classes, mesh=self.mesh,
                masks_only_threshold=mask_threshold,
                # bound the compiled-program count under varying group
                # sizes (see _run_scanned.pad_steps_pow2 — without this a
                # high-concurrency micro-batched daemon recompiles per
                # realized group size and collapses on slow-compile relays)
                pad_steps_pow2=self.batcher is not None)
            dt = time.perf_counter() - t0
            with self.stats_lock:
                self.last_latency_s = dt
                self.seconds += dt
                self.requests += len(vols)
                self.slices += int(sum(v.shape[0] for v in vols))
        return outs

    def segment(self, vol: np.ndarray, threshold: float,
                want_probs: bool) -> dict:
        if vol.ndim not in (3, 4):
            raise ValueError(f"img must be (S,H,W) or (S,1,H,W), "
                             f"got shape {vol.shape}")
        vol = vol.astype(np.float32)
        if not want_probs:
            # mask-only (the default request): threshold ON DEVICE and
            # download S*H*W uint8 instead of S*C*H*W float32
            thr = float(threshold)
            if self.batcher is not None:
                mask = self.batcher.submit(vol, thr)
            else:
                mask = self.segment_many([vol], thr)[0]
            return {"mask": mask}
        if self.batcher is not None:
            probs = self.batcher.submit(vol)
        else:
            probs = self.segment_many([vol])[0]
        if self.classes == 1:
            mask = (probs[:, 0] > threshold).astype(np.uint8)
        else:
            mask = probs.argmax(axis=1).astype(np.uint8)
        return {"mask": mask, "probs": probs}

    def segment_kspace(self, kpair: np.ndarray, threshold: float,
                       want_probs: bool,
                       slice_keep=(0.0, 1.0)) -> dict:
        """Raw k-space -> preprocess chain -> model, one request.

        The tensor the model sees is EXACTLY what training consumed (the
        z-scored preprocess output, data/preprocess.py); the response also
        carries the Otsu body mask and the kept slice indices."""
        from ..infer import segment_volume_2d

        if kpair.ndim not in (4, 5) or kpair.shape[-1] != 2:
            raise ValueError(
                f"kspace must be (S,H,W,2) or (S,C,H,W,2) real-pair, got "
                f"shape {kpair.shape}")
        band = tuple(float(v) for v in slice_keep)
        pre = self._pres.get(band)
        if pre is None:
            from ..data.preprocess import MRIKneePreprocessor
            pre = self._pres.setdefault(
                band, MRIKneePreprocessor(out_size=self.pre_out_size,
                                          slice_keep=band))
        with self._lock:
            t0 = time.perf_counter()
            packed = pre.preprocess_volume_pairs(kpair.astype(np.float32))
            vol = packed["tensor"]                      # (S,1,H,W) z-scored
            probs = segment_volume_2d(self.apply_fn, vol, k=self.k,
                                      batch_size=self.batch_size,
                                      classes=self.classes, mesh=self.mesh)
            dt = time.perf_counter() - t0
            with self.stats_lock:
                self.last_latency_s = dt
                self.seconds += dt
                self.requests += 1
                self.slices += int(vol.shape[0])
        if self.classes == 1:
            mask = (probs[:, 0] > threshold).astype(np.uint8)
        else:
            mask = probs.argmax(axis=1).astype(np.uint8)
        out = {"mask": mask, "body_mask": packed["mask"],
               "indices": np.asarray(packed["indices"], np.int64)}
        if want_probs:
            out["probs"] = probs
        return out

    def warmup(self, shape) -> None:
        """Pre-compile at the production volume shape (jit is once-per-
        shape; an un-warmed first request pays the compile). The warm-up
        dispatch is NOT a served request — counters are reset afterwards
        so /healthz + /metricsz start clean (no compile-time poisoning of
        latency gauges)."""
        self.segment(np.zeros(shape, np.float32), 0.5, False)  # mask path
        self.segment(np.zeros(shape, np.float32), 0.5, True)   # probs path
        with self.stats_lock:
            self.requests = self.slices = 0
            self.seconds = self.last_latency_s = 0.0


class _ReconRunner:
    """VarNet reconstruction serving (POST /v1/reconstruct).

    Rebuilds the model from the args bundled with varnet_best.ckpt
    (train/varnet_trainer.py:_save_best); parameters load lazily on the
    first request — VarNet's parameter tree is shape-independent, so the
    request's own kspace/espirit shapes serve as the init template and
    later shape changes only recompile the forward."""

    task = "recon"

    def __init__(self, ckpt_path: str):
        with open(ckpt_path + ".args.json", "r", encoding="utf-8") as f:
            a = json.load(f)
        import jax

        from ..train.varnet_trainer import (build_varnet_from_args,
                                            combine_directions)

        # the trainer's own construction path — new VarNetArgs fields are
        # honored here automatically instead of drifting
        self.model = build_varnet_from_args(a)
        self.ckpt_path = ckpt_path
        self.source = "ckpt"
        self.params = None
        self._fwd = jax.jit(lambda p, k, e: combine_directions(
            self.model.apply({"params": p}, k, e)))
        self.requests = 0
        self.slices = 0
        self.errors = 0
        self.seconds = 0.0
        self.last_latency_s = 0.0
        self._lock = threading.Lock()
        self.stats_lock = threading.Lock()

    count_error = _ModelRunner.count_error

    def reconstruct(self, kspace: np.ndarray, espirit: np.ndarray) -> dict:
        import jax
        import jax.numpy as jnp

        from ..train import checkpoint as ckpt_lib

        for name, arr in (("kspace", kspace), ("espirit", espirit)):
            if arr.ndim not in (5, 6) or arr.shape[-1] != 2:
                raise ValueError(
                    f"{name} must be (coils,aves,h,w,2) real-pair "
                    f"(optionally with a leading batch dim), got "
                    f"shape {arr.shape}")
        k = jnp.asarray(kspace[None] if kspace.ndim == 5 else kspace,
                        jnp.float32)
        e = jnp.asarray(espirit[None] if espirit.ndim == 5 else espirit,
                        jnp.float32)
        with self._lock:
            t0 = time.perf_counter()
            if self.params is None:
                v = self.model.init(jax.random.PRNGKey(0), k, e)
                self.params, _ = ckpt_lib.load_best(
                    self.ckpt_path, v["params"], {})
            out = np.asarray(self._fwd(self.params, k, e), np.float32)
            dt = time.perf_counter() - t0
            with self.stats_lock:
                self.last_latency_s = dt
                self.seconds += dt
                self.requests += 1
                # batch dim = slices: each (coils,aves,h,w,2) element is
                # ONE slice's multi-coil k-space, so the units of
                # serve_slices_total match the segment task
                self.slices += int(k.shape[0])
        return {"recon": out[0] if kspace.ndim == 5 else out}


class _ClassifyRunner:
    """ConvNeXt classification serving (POST /v1/classify).

    Rebuilds the classifier from the args bundled with
    classifier_best.ckpt (classify/trainer.py:_save_best); parameters
    load lazily on the first request — ConvNeXt global-pools, so its
    parameter tree is input-shape-independent."""

    task = "classify"

    def __init__(self, ckpt_path: str):
        with open(ckpt_path + ".args.json", "r", encoding="utf-8") as f:
            a = json.load(f)
        import jax
        import jax.numpy as jnp

        from ..models.convnext import ConvNeXt

        self.in_chans = 2 if a.get("diff") else 1
        self.model = ConvNeXt(
            variant=a.get("model", "tiny"), in_chans=self.in_chans,
            num_classes=1,
            dtype=jnp.bfloat16 if a.get("amp", True) else jnp.float32)
        self.ckpt_path = ckpt_path
        self.source = "ckpt"
        self.params = None
        self._fwd = jax.jit(lambda p, x: jax.nn.sigmoid(
            self.model.apply({"params": p}, x, train=False)[:, 0]))
        self.requests = 0
        self.slices = 0
        self.errors = 0
        self.seconds = 0.0
        self.last_latency_s = 0.0
        self._lock = threading.Lock()
        self.stats_lock = threading.Lock()

    count_error = _ModelRunner.count_error

    def classify(self, x: np.ndarray) -> dict:
        import jax
        import jax.numpy as jnp

        from ..train import checkpoint as ckpt_lib

        if x.ndim == 3 and self.in_chans == 1:
            x = x[..., None]
        if x.ndim != 4 or x.shape[-1] != self.in_chans:
            raise ValueError(
                f"x must be (N,H,W,{self.in_chans}) "
                f"{'or (N,H,W) ' if self.in_chans == 1 else ''}"
                f"(model has a {self.in_chans}-channel stem), got shape "
                f"{x.shape}")
        xd = jnp.asarray(x, jnp.float32)
        with self._lock:
            t0 = time.perf_counter()
            if self.params is None:
                v = self.model.init(jax.random.PRNGKey(0), xd[:1])
                self.params, _ = ckpt_lib.load_best(
                    self.ckpt_path, v["params"], {})
            probs = np.asarray(self._fwd(self.params, xd), np.float32)
            dt = time.perf_counter() - t0
            with self.stats_lock:
                self.last_latency_s = dt
                self.seconds += dt
                self.requests += 1
                self.slices += int(x.shape[0])
        return {"probs": probs}


def _build_runner(args):
    import jax.numpy as jnp  # noqa: F401  (ensures backend selected early)

    from .infer import load_model_from_ckpt, make_input_norm

    task = getattr(args, "task", "segment")
    if task == "recon":
        if not args.ckpt:
            raise ValueError("--task recon requires --ckpt "
                             "(a varnet_best.ckpt)")
        return _ReconRunner(args.ckpt)
    if task == "classify":
        if not args.ckpt:
            raise ValueError("--task classify requires --ckpt "
                             "(a classifier_best.ckpt)")
        return _ClassifyRunner(args.ckpt)

    pre_out = tuple(int(v) for v in str(
        getattr(args, "pre_out_size", "") or "320,320").split(","))
    mesh = None
    if int(getattr(args, "data_parallel", 1) or 1) > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(int(args.data_parallel))

    window = float(getattr(args, "microbatch_window_ms", 0.0) or 0.0)

    tta = getattr(args, "tta", "none") or "none"
    if args.qtree:
        from .quantize import load_engine
        from ..infer.segment import tta_wrap
        eng, qtree, meta = load_engine(args.qtree)
        norm = make_input_norm(bool(meta.get("imagenet_norm")))

        def apply_fn(x):
            return eng.apply(qtree, norm(x))

        return _ModelRunner(tta_wrap(apply_fn, meta["classes"], tta),
                            meta["k"], meta["classes"], "qtree",
                            args.batch_size, pre_out_size=pre_out, mesh=mesh,
                            microbatch_window_ms=window)

    from ..infer.segment import tta_wrap
    model, params, batch_stats, margs = load_model_from_ckpt(args.ckpt)
    norm = make_input_norm(bool(margs.get("imagenet_norm")))

    def apply_fn(x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           norm(x), train=False)

    return _ModelRunner(tta_wrap(apply_fn, margs.get("classes", 1), tta),
                        margs.get("k", 1),
                        margs.get("classes", 1), "ckpt", args.batch_size,
                        pre_out_size=pre_out, mesh=mesh,
                        microbatch_window_ms=window)


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
            return self._json(200, {"status": "ok", "task": r.task,
                                    "k": getattr(r, "k", None),
                                    "classes": getattr(r, "classes", None),
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
        route = (url.path, self.runner.task)
        if route not in (("/v1/segment", "segment"),
                         ("/v1/segment_kspace", "segment"),
                         ("/v1/reconstruct", "recon"),
                         ("/v1/classify", "classify")):
            return self._json(404, {"error": "unknown path for task "
                                             f"{self.runner.task!r}"})
        try:
            n = int(self.headers.get("Content-Length", 0))
            q = parse_qs(url.query)
            with np.load(io.BytesIO(self.rfile.read(n)),
                         allow_pickle=False) as z:
                if self.runner.task == "recon":
                    for key in ("kspace", "espirit"):
                        if key not in z:
                            raise ValueError("npz body must contain arrays "
                                             "'kspace' and 'espirit'")
                    out = self.runner.reconstruct(z["kspace"], z["espirit"])
                elif self.runner.task == "classify":
                    if "x" not in z:
                        raise ValueError("npz body must contain array 'x'")
                    out = self.runner.classify(z["x"])
                elif url.path == "/v1/segment_kspace":
                    if "kspace" not in z:
                        raise ValueError(
                            "npz body must contain array 'kspace'")
                    threshold = float(q.get("threshold", ["0.5"])[0])
                    want_probs = q.get("probs", ["0"])[0] in ("1", "true")
                    keep = q.get("keep", ["0,1"])[0].split(",")
                    if len(keep) != 2:
                        raise ValueError("keep must be 'lo,hi'")
                    out = self.runner.segment_kspace(
                        z["kspace"], threshold, want_probs,
                        slice_keep=(float(keep[0]), float(keep[1])))
                else:
                    if "img" not in z:
                        raise ValueError("npz body must contain array 'img'")
                    threshold = float(q.get("threshold", ["0.5"])[0])
                    want_probs = q.get("probs", ["0"])[0] in ("1", "true")
                    out = self.runner.segment(z["img"], threshold,
                                              want_probs)
        except (ValueError, zipfile.BadZipFile) as exc:
            # client-input errors (bad npz, missing arrays, bad shapes)
            self.runner.count_error()
            return self._json(400, {"error": str(exc)})
        except Exception as exc:  # surface device/shape errors to the client
            self.runner.count_error()
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
    if getattr(args, "warmup_shape", "") and runner.task == "segment":
        shape = tuple(int(v) for v in args.warmup_shape.split(","))
        runner.warmup(shape)
    handler = type("BoundHandler", (_Handler,), {"runner": runner})
    server = ThreadingHTTPServer((args.host, args.port), handler)
    # graceful drain: keep handler threads joinable so server_close()
    # waits for in-flight requests after shutdown() stops new accepts
    server.daemon_threads = False
    server.block_on_close = True
    return server


def install_drain_handler(server) -> None:
    """SIGTERM -> graceful drain: stop accepting, let in-flight requests
    finish (server_close joins the handler threads), then exit — the
    serving-side counterpart of the trainers' --preempt-save. shutdown()
    must run off the serve_forever thread (it blocks until the accept
    loop exits), hence the helper thread."""
    import signal
    import threading

    def _drain(*_):
        print(json.dumps({"draining": True}), flush=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _drain)
    except ValueError:        # not the main thread (in-process tests)
        pass


def main(argv=None) -> int:
    p = argparse.ArgumentParser("Segmentation/reconstruction serving daemon")
    p.add_argument("--task", choices=("segment", "recon", "classify"),
                   default="segment",
                   help="segment = 2-D U-Net family (POST /v1/segment, "
                        "/v1/segment_kspace); recon = VarNet (POST "
                        "/v1/reconstruct with {kspace, espirit} real-pair "
                        "arrays, --ckpt is a varnet_best.ckpt); classify = "
                        "ConvNeXt (POST /v1/classify with {x} slices, "
                        "--ckpt is a classifier_best.ckpt)")
    p.add_argument("--ckpt", help="trained checkpoint (cli.infer format, "
                                  "or varnet_best.ckpt with --task recon)")
    p.add_argument("--qtree", help="quantized artifact from cli.quantize "
                                   "(serves without the checkpoint)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each segmentation batch over N devices "
                        "(--task segment only; params replicated)")
    p.add_argument("--pre-out-size", default="320,320",
                   help="'H,W' resize target for the /v1/segment_kspace "
                        "preprocess chain — match the resolution the "
                        "served model was trained at")
    p.add_argument("--warmup-shape", default="",
                   help="'S,H,W' to pre-compile at the production volume "
                        "shape before accepting requests (e.g. 16,320,320); "
                        "empty = no warmup, first request pays the compile")
    p.add_argument("--tta", choices=("none", "hflip"), default="none",
                   help="serve with horizontal-flip test-time augmentation "
                        "(--task segment; exact mean-probability ensemble, "
                        "2x device compute per request)")
    p.add_argument("--microbatch-window-ms", type=float, default=0.0,
                   help="coalesce concurrent /v1/segment requests arriving "
                        "within this window into ONE device dispatch "
                        "(--task segment; 0 = off). Results match the "
                        "per-request path to float tolerance; try 5 under "
                        "concurrent load")
    args = p.parse_args(argv)
    if not args.ckpt and not args.qtree:
        p.error("one of --ckpt / --qtree is required")

    server = create_server(args)
    install_drain_handler(server)
    host, port = server.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "source": "qtree" if args.qtree else "ckpt"}),
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()   # joins in-flight handler threads (drain)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
