"""Measure cli.serve throughput/latency on the real TPU.

Serves a random-init reference-config U-Net (numerics don't matter for
throughput) and posts whole volumes over loopback HTTP the way a
production client would: reports per-request latency and sustained
slices/s including HTTP+npz codec overhead, alongside the raw
segment_volume_2d device rate for attribution.

Run: nohup python scripts/measure_serve.py > /tmp/measure_serve.log 2>&1 &
"""

import io
import json
import sys
import tempfile
import threading
import time
import urllib.request
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, "/root/repo")

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)

enable_compilation_cache()

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
from mri_acl_imagesegmentation_adsp_tpu.train import checkpoint as ckpt_lib
from mri_acl_imagesegmentation_adsp_tpu.cli.serve import create_server

S, H, W = 32, 320, 320          # one fastMRI-like volume per request
BATCH = 32
REQS = 8


def main():
    print("devices:", jax.devices(), flush=True)
    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    args_dict = {"model": "unet", "encoder": "resnet34", "k": 1,
                 "classes": 1, "amp": True, "imagenet_norm": False}
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 64, 64, 1)),
                                             train=True))(jax.random.PRNGKey(0))
    ckpt = tmp + "/best.ckpt"
    ckpt_lib.save_best(ckpt, variables["params"],
                       variables.get("batch_stats", {}), args_dict)

    server = create_server(SimpleNamespace(
        qtree=None, ckpt=ckpt, host="127.0.0.1", port=0, batch_size=BATCH,
        warmup_shape=f"{S},{H},{W}"))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = "http://127.0.0.1:%d/v1/segment" % server.server_address[1]
    print("warmed up, serving", url, flush=True)

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((S, H, W)).astype(np.float32)
    buf = io.BytesIO()
    np.savez_compressed(buf, img=vol)
    body = buf.getvalue()
    print(f"request body {len(body)/1e6:.1f} MB ({S}x{H}x{W})", flush=True)

    lat = []
    t0 = time.perf_counter()
    for _ in range(REQS):
        t1 = time.perf_counter()
        with urllib.request.urlopen(
                urllib.request.Request(url, data=body), timeout=600) as r:
            out = np.load(io.BytesIO(r.read()))
            assert out["mask"].shape == (S, H, W)
        lat.append(time.perf_counter() - t1)
    wall = time.perf_counter() - t0
    served_rate = REQS * S / wall

    # raw k-space endpoint: on-device preprocess chain + model per request
    img = np.zeros((S, 640, 368), np.float32)
    img[:, 160:480, 90:280] = 1.0 + 0.2 * rng.standard_normal(
        (S, 320, 190)).astype(np.float32)
    ksp = np.fft.fftshift(np.fft.fft2(
        np.fft.ifftshift(img, axes=(-2, -1)), norm="ortho"), axes=(-2, -1))
    pair = np.stack([ksp.real, ksp.imag], -1).astype(np.float32)
    kbuf = io.BytesIO()
    np.savez_compressed(kbuf, kspace=pair)
    kbody = kbuf.getvalue()
    kurl = url.replace("/v1/segment", "/v1/segment_kspace")
    print(f"kspace body {len(kbody)/1e6:.1f} MB", flush=True)
    with urllib.request.urlopen(                       # warm (compile)
            urllib.request.Request(kurl, data=kbody), timeout=1200) as r:
        np.load(io.BytesIO(r.read()))
    klat = []
    t0 = time.perf_counter()
    for _ in range(max(2, REQS // 2)):
        t1 = time.perf_counter()
        with urllib.request.urlopen(
                urllib.request.Request(kurl, data=kbody), timeout=600) as r:
            out = np.load(io.BytesIO(r.read()))
            assert out["mask"].shape == (S, H, W)
        klat.append(time.perf_counter() - t1)
    kspace_rate = max(2, REQS // 2) * S / (time.perf_counter() - t0)

    # concurrency series: N simultaneous clients, lock-serialized (window
    # 0) vs micro-batched (window 5 ms) — the VERDICT r3 weak-#6 gate
    def concurrent_rps(n_clients: int, reqs_each: int) -> float:
        errs = []

        def client():
            try:
                for _ in range(reqs_each):
                    with urllib.request.urlopen(
                            urllib.request.Request(url, data=body),
                            timeout=600) as r:
                        np.load(io.BytesIO(r.read()))["mask"]
            except Exception as e:    # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=client) for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t0
        if errs:
            raise errs[0]
        return n_clients * reqs_each * S / wall

    conc_serialized = concurrent_rps(4, 2)
    server.shutdown(); server.server_close()

    server = create_server(SimpleNamespace(
        qtree=None, ckpt=ckpt, host="127.0.0.1", port=0, batch_size=BATCH,
        warmup_shape=f"{S},{H},{W}", microbatch_window_ms=5.0))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = "http://127.0.0.1:%d/v1/segment" % server.server_address[1]
    concurrent_rps(4, 1)   # warm the grouped-batch shape
    conc_microbatch = concurrent_rps(4, 2)

    # attribution: raw device rate of the same volume (no HTTP/codec)
    from mri_acl_imagesegmentation_adsp_tpu.infer import segment_volume_2d

    def apply_fn(x):
        return model.apply(variables, x, train=False)

    segment_volume_2d(apply_fn, vol, k=1, batch_size=BATCH)  # warm
    t0 = time.perf_counter()
    for _ in range(REQS):
        segment_volume_2d(apply_fn, vol, k=1, batch_size=BATCH)
    raw_rate = REQS * S / (time.perf_counter() - t0)

    server.shutdown(); server.server_close()
    print(json.dumps({
        "served_slices_per_sec": round(served_rate, 1),
        "served_latency_ms_per_volume": [round(1e3 * v, 1) for v in lat],
        "served_kspace_slices_per_sec": round(kspace_rate, 1),
        "served_kspace_latency_ms_per_volume": [round(1e3 * v, 1)
                                                for v in klat],
        "raw_segment_slices_per_sec": round(raw_rate, 1),
        "concurrent4_slices_per_sec_serialized": round(conc_serialized, 1),
        "concurrent4_slices_per_sec_microbatch5ms": round(conc_microbatch, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
