"""Serving micro-batching crossover where the link is NOT the wall
(VERDICT r4 #7): small volumes (8x64x64, ~130 KB/request) make the
~18 ms/dispatch relay cost dominate, so coalescing concurrent requests
into one dispatch (--microbatch-window-ms) must show a measured RPS win —
unlike the 320² measurement where the 12 MB upload hides it.

Serves the int8 qtree artifact (the production cli.quantize ->
cli.serve --qtree path). Two daemons, window 0 vs 5 ms; N concurrent
clients each posting the same-shape volume. Pass 1 warms every realized
group-size program (remote compiles); pass 2 is the measurement.

Run: nohup python scripts/measure_serve_smallvol.py > /tmp/serve_small.log 2>&1 &
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

from mri_acl_imagesegmentation_adsp_tpu.infer.quant import (
    QuantConfig, QuantizedUNet2D, save_qtree)
from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
from mri_acl_imagesegmentation_adsp_tpu.cli.serve import create_server

S, H, W = 8, 64, 64
BATCH = 8


def start_server(qtree_path: str, window_ms: float):
    server = create_server(SimpleNamespace(
        qtree=qtree_path, ckpt=None, host="127.0.0.1", port=0,
        batch_size=BATCH, warmup_shape=f"{S},{H},{W}",
        microbatch_window_ms=window_ms))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, "http://127.0.0.1:%d/v1/segment" % server.server_address[1]


def drive(url: str, body: bytes, n_clients: int, reqs_each: int) -> float:
    errs: list = []

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
    return n_clients * reqs_each / wall


def main():
    print("devices:", jax.devices(), flush=True)
    tmp = tempfile.mkdtemp(prefix="serve_small_")
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1,
                       dtype=jnp.bfloat16)
    x1 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, H, W, 1)).astype(np.float32))
    variables = jax.jit(lambda k: model.init(k, x1[:1], train=False))(
        jax.random.PRNGKey(0))
    eng, qtree = QuantizedUNet2D.from_model(model, variables,
                                            calib_batches=[x1],
                                            config=QuantConfig())
    qpath = tmp + "/quant_int8.npz"
    save_qtree(qpath, qtree)
    meta = {"arch": eng.arch, "encoder": eng.encoder,
            "classes": eng.classes,
            "decoder_channels": list(eng.decoder_channels), "mode": "int8",
            "compute_dtype": "bfloat16", "k": 1, "imagenet_norm": False}
    with open(qpath + ".meta.json", "w", encoding="utf-8") as f:
        json.dump(meta, f)
    print("int8 qtree:", qpath, flush=True)

    vol = np.random.default_rng(1).standard_normal(
        (S, H, W)).astype(np.float32)
    buf = io.BytesIO()
    np.savez_compressed(buf, img=vol)
    body = buf.getvalue()
    print(f"request body {len(body)/1e3:.0f} KB ({S}x{H}x{W})", flush=True)

    results = {}
    for window in (0.0, 5.0):
        server, url = start_server(qpath, window)
        for n in (1, 2, 4, 8):
            drive(url, body, n, reqs_each=4)        # pass 1: warm compiles
            rps = drive(url, body, n, reqs_each=12)  # pass 2: measure
            results[(window, n)] = rps
            print(f"window={window:.0f}ms clients={n}: {rps:.1f} req/s",
                  flush=True)
        server.shutdown()

    print("\n-- crossover table (req/s) --")
    print("clients   window0   window5   speedup")
    for n in (1, 2, 4, 8):
        a, b = results[(0.0, n)], results[(5.0, n)]
        print(f"{n:7d} {a:9.1f} {b:9.1f} {b/a:9.2f}x")


if __name__ == "__main__":
    main()
