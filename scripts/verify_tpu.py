"""/verify drive for this session's changes (fused decoder, efficient BN,
scanned inference) on the REAL TPU.

1. ops chain (recipe step 1): synthetic real-pair k-space -> jitted
   ifft2c_magnitude -> clip -> body_mask -> resize -> zscore; oracle checks
   vs numpy fft.
2. model surface: fused vs naive decoder on TPU (bf16) — outputs close;
   scanned segment_volume_2d vs per-batch oracle.
3. e2e: 6-epoch CLI-configured training on synthetic volumes via
   UNet2DTrainer -> val_dice must exceed 0.9; artifacts written.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

t00 = time.time()
print("devices:", jax.devices(), flush=True)


def step(msg):
    print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)


# ---------------- 1. ops chain ----------------
step("1. ops chain on TPU")
from mri_acl_imagesegmentation_adsp_tpu.ops import fftc, imageops, maskops

rng = np.random.default_rng(0)
img = np.zeros((96, 96), np.float32)
img[28:68, 24:72] = 1.0 + 0.3 * rng.standard_normal((40, 48)).astype(np.float32)
k_c = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(img), norm="ortho"))
k_pair = np.stack([k_c.real, k_c.imag], -1).astype(np.float32)


@jax.jit
def chain(kp):
    mag = fftc.ifft2c_magnitude(kp)
    clipped = imageops.percentile_clip(mag, 1.0, 99.0)
    mask = maskops.body_mask(clipped)
    resized = imageops.resize_bilinear(clipped, (64, 64))
    rmask = imageops.resize_bilinear(mask.astype(jnp.float32), (64, 64)) > 0.5
    z = imageops.zscore_in_mask(resized, rmask)
    return mag, clipped, mask, z


mag, clipped, mask, z = (np.asarray(a) for a in chain(jnp.asarray(k_pair)))
err = np.abs(mag - np.abs(img)).max()
assert err < 1e-4, f"recon err {err}"
assert mask.sum() > 500, f"mask px {mask.sum()}"
step(f"   recon max err {err:.2e}, mask px {int(mask.sum())}  OK")

# constant input (degenerate branch)
z0 = np.asarray(chain(jnp.zeros_like(jnp.asarray(k_pair)))[3])
assert np.isfinite(z0).all()
step("   constant-input degenerate branch OK")

# bf16 link transfer: a bandwidth/accuracy trade (the chain's DFT runs at
# Precision.HIGHEST — full-f32 operands — so the host-side pre-round is a
# real ~0.4%-relative input perturbation, NOT absorbed by operand
# rounding). Gate the documented tolerance: z-tensor dev and body-mask
# agreement, same bounds as the CPU test (test_pipeline). First real-TPU
# run measured max dev 1.66e-2; an earlier bit-exactness gate here was
# falsified by that run and replaced with this one.
step("1b. bf16 link-transfer tolerance (HIGHEST-precision DFT)")
from mri_acl_imagesegmentation_adsp_tpu.data.preprocess import (
    MRIKneePreprocessor)

pre_ = MRIKneePreprocessor(out_size=(64, 64), slice_keep=(0.0, 1.0))
vol_pair = np.stack([k_pair] * 3)  # (3, 96, 96, 2)
o32 = pre_.preprocess_volumes_pairs([vol_pair])[0]
o16 = pre_.preprocess_volumes_pairs([vol_pair],
                                    transfer_dtype="bfloat16")[0]
d = np.abs(o32["tensor"] - o16["tensor"]).max()
agree = (o32["mask"] == o16["mask"]).mean()
# On-chip bound 5e-2: ~3x the measured TPU envelope (1.66e-2, ROADMAP r3
# correction) — tighter than the shared CPU-test bound (0.12) so a real
# accuracy regression in the bf16 path fails here first. The measured dev
# is logged below for trend comparison across verify runs.
assert d < 5e-2, f"bf16 link transfer tensor dev {d:.2e} (bound 5e-2)"
assert agree > 0.995, f"bf16 link transfer mask agreement {agree:.4f}"
step(f"   bf16 link transfer within tolerance (tensor dev {d:.2e}, "
     f"mask agree {agree:.4f})  OK")

# ---------------- 2. model surface ----------------
step("2. fused vs naive decoder on TPU (bf16)")
from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import ResNetEncoderUNet

x = jnp.asarray(rng.standard_normal((4, 64, 64, 1)).astype(np.float32))
ref32 = ResNetEncoderUNet("resnet18", classes=1, dtype=jnp.float32,
                          fused_decoder=False)
naive = ResNetEncoderUNet("resnet18", classes=1, dtype=jnp.bfloat16,
                          fused_decoder=False)
fused = ResNetEncoderUNet("resnet18", classes=1, dtype=jnp.bfloat16,
                          fused_decoder=True)
v = jax.jit(lambda k: naive.init(k, x[:1], train=False))(jax.random.PRNGKey(0))
y_r = np.asarray(jax.jit(lambda v, x: ref32.apply(v, x, train=False))(v, x))
y_n = np.asarray(jax.jit(lambda v, x: naive.apply(v, x, train=False))(v, x))
y_f = np.asarray(jax.jit(lambda v, x: fused.apply(v, x, train=False))(v, x))
# bf16 acceptance: the fused lowering's distance from f32 truth must be the
# same order as the naive bf16 path's own rounding error (both ~0.4-0.6 on
# logits spanning [-18, 5] at random init; exact-equality is pinned in f32
# on CPU by tests/test_models.py).
e_n = np.abs(y_n - y_r).max()
e_f = np.abs(y_f - y_r).max()
assert e_f < 3 * e_n + 1e-3, f"fused bf16 err {e_f} vs naive {e_n}"
step(f"   bf16 err vs f32: naive {e_n:.4f}, fused {e_f:.4f}  OK")

step("2b. scanned segment_volume_2d vs per-batch oracle")
from mri_acl_imagesegmentation_adsp_tpu.infer import segment_volume_2d
from mri_acl_imagesegmentation_adsp_tpu.infer.segment import _neighbor_stack

vol = rng.standard_normal((11, 64, 64)).astype(np.float32)
# exactness gate in f32 (bf16 scan-body fusion rounds differently from a
# top-level jit by ~0.4 logits — same order as bf16-vs-f32 noise; the f32
# path must match the per-batch oracle tightly)
v3 = jax.jit(lambda k: ref32.init(k, jnp.zeros((1, 64, 64, 3)),
                                  train=False))(jax.random.PRNGKey(1))
apply32 = lambda xb: ref32.apply(v3, xb, train=False)
# TPU conv DEFAULT precision rounds f32 operands through bf16 passes, so
# cross-program comparisons need HIGHEST precision for a tight gate.
with jax.default_matmul_precision("highest"):
    probs = segment_volume_2d(apply32, vol, k=3, batch_size=4)
    assert probs.shape == (11, 1, 64, 64)
    xs = _neighbor_stack(jnp.asarray(vol), 3)
    want = np.asarray(jax.nn.sigmoid(
        jnp.transpose(ref32.apply(v3, xs, train=False), (0, 3, 1, 2))))
d = np.abs(probs - want).max()
assert d < 1e-4, f"f32 scanned vs oracle {d}"
step(f"   f32 scanned == direct (max diff {d:.2e})  OK")
# bf16 production path: runs, finite, close to the f32 result
apply16 = lambda xb: fused.apply(v3, xb, train=False)
p16 = segment_volume_2d(apply16, vol, k=3, batch_size=4)
d16 = np.abs(p16 - want).max()
assert np.isfinite(p16).all() and d16 < 0.25, f"bf16 scanned diff {d16}"
step(f"   bf16 scanned within {d16:.3f} of f32  OK")

step("2c. per-block remat grads vs naive on TPU")
# remat (models/unet2d.py remat flag) recomputes the forward inside the
# backward; at HIGHEST precision the grads must agree with the naive path
# to reassociation tolerance (tree/forward equality pinned on CPU in
# tests/test_models.py::test_unet2d_remat_matches_naive_exactly)
rmt32 = ResNetEncoderUNet("resnet18", classes=1, dtype=jnp.float32,
                          fused_decoder=False, remat=True)


def _loss32(model, v, xb):
    return jnp.mean(model.apply(v, xb, train=False) ** 2)


with jax.default_matmul_precision("highest"):
    g_n = jax.jit(jax.grad(lambda p: _loss32(ref32, p, x)))(v)
    g_r = jax.jit(jax.grad(lambda p: _loss32(rmt32, p, x)))(v)
worst = 0.0
for a, b in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_r)):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    worst = max(worst, float(np.linalg.norm(a - b)
                             / (np.linalg.norm(a) + 1e-12)))
assert worst < 5e-3, f"remat grad rel-L2 {worst}"
step(f"   remat grads rel-L2 within {worst:.2e}  OK")

# ---------------- 3. e2e training ----------------
step("3. e2e 6-epoch training on synthetic volumes (TPU)")
from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
    UNet2DArgs, UNet2DTrainer)

tmp = tempfile.mkdtemp(prefix="verify_r2_")
lists = os.path.join(tmp, "lists")
os.makedirs(lists, exist_ok=True)
files = []
for vi in range(3):
    s, h, w = 10, 96, 96
    yy, xx = np.mgrid[:h, :w]
    msk = ((yy - h // 2) ** 2 + (xx - w // 2) ** 2 <
           (28 + 3 * vi) ** 2).astype(np.uint8)
    im = (msk * (1.0 + 0.2 * rng.standard_normal((s, h, w)))
          + 0.05 * rng.standard_normal((s, h, w))).astype(np.float32)
    d = os.path.join(tmp, f"vol{vi}")
    os.makedirs(d, exist_ok=True)
    np.savez_compressed(os.path.join(d, "volume.npz"), img=im[:, None],
                        msk=np.broadcast_to(msk, (s, h, w)))
    files.append(os.path.join(d, "volume.npz"))
for name, sub in (("train.txt", files[:2]), ("val.txt", files[2:])):
    with open(os.path.join(lists, name), "w") as f:
        f.write("\n".join(sub) + "\n")

out = os.path.join(tmp, "run")
args = UNet2DArgs(
    train_list=os.path.join(lists, "train.txt"),
    val_list=os.path.join(lists, "val.txt"),
    out_dir=out, epochs=6, batch_size=4, lr=1e-3, encoder="resnet18",
    aug="light", seed=7, amp=True)
tr = UNet2DTrainer(args)
tr.run()
summary = json.load(open(os.path.join(out, "summary.json")))
best = summary["best"]["val_dice"]
step(f"   best val_dice: {best:.4f}")
assert best > 0.9, f"val_dice {best} too low"
for f in ("args.json", "history.json", "summary.json",
          "history_epoch.csv", "best.ckpt"):
    p = os.path.join(out, f)
    assert os.path.exists(p) or any(
        fn.startswith("best") for fn in os.listdir(out)), f"missing {f}"
step("   artifacts present  OK")

# ---------------- 4. serving daemon round-trip ----------------
step("4. cli.serve round-trip on the trained checkpoint (TPU)")
import io
import threading
import urllib.request
from types import SimpleNamespace

from mri_acl_imagesegmentation_adsp_tpu.cli.serve import create_server

ckpt = os.path.join(out, "best.ckpt")
if not os.path.exists(ckpt):
    ckpt = os.path.join(out, next(fn for fn in os.listdir(out)
                                  if fn.startswith("best")
                                  and fn.endswith(".ckpt")))
server = create_server(SimpleNamespace(
    qtree=None, ckpt=ckpt, host="127.0.0.1", port=0, batch_size=4,
    warmup_shape="2,96,96"))
threading.Thread(target=server.serve_forever, daemon=True).start()
url = "http://127.0.0.1:%d" % server.server_address[1]
with np.load(files[2]) as zf:
    val_img, val_msk = zf["img"].astype(np.float32), zf["msk"]
buf = io.BytesIO()
np.savez_compressed(buf, img=val_img)
with urllib.request.urlopen(urllib.request.Request(
        url + "/v1/segment", data=buf.getvalue()), timeout=300) as r:
    served_out = np.load(io.BytesIO(r.read()))
pred = served_out["mask"].astype(bool)
gt = val_msk.astype(bool)
dice = 2 * (pred & gt).sum() / (pred.sum() + gt.sum() + 1e-9)
server.shutdown(); server.server_close()
assert dice > 0.9, f"served dice {dice}"
step(f"   served volume dice {dice:.4f}  OK")

print("VERIFY PASS", flush=True)
