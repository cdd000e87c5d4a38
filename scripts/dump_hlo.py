"""Dump compiled HLO for the flagship inference and grep the hot ops
identified by the profiler trace (fusion.5, broadcast_in_dim.19x, copy.4x).

Run:  nohup python scripts/dump_hlo.py > /tmp/dump_hlo.log 2>&1 &
"""

import re
import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.utils.compile_cache import (
    enable_compilation_cache)
enable_compilation_cache()

from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import ResNetEncoderUNet

B, H = 32, 320


def dump(fused: bool, path: str, hot: list):
    model = ResNetEncoderUNet("resnet34", classes=1, dtype=jnp.bfloat16,
                              fused_decoder=fused)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, 1)), jnp.float32)
    v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0),
                                                  x[:1])
    params, bs = v["params"], v.get("batch_stats", {})

    @jax.jit
    def infer(params, bs, x):
        return jax.nn.sigmoid(
            model.apply({"params": params, "batch_stats": bs}, x,
                        train=False))

    txt = infer.lower(params, bs, x).compile().as_text()
    with open(path, "w") as f:
        f.write(txt)
    print(f"\n==== {'fused' if fused else 'naive'}: {len(txt)} bytes ====",
          flush=True)
    for name in hot:
        # top-level computation line naming this op
        pat = re.compile(rf"%?{re.escape(name)}(\.\d+)? = .*")
        for m in re.finditer(rf"^\s*%?{re.escape(name)} = .*$", txt,
                             re.MULTILINE):
            line = m.group(0).strip()
            print(f"\n-- {name}:\n   {line[:600]}", flush=True)
            # if it's a fusion, also print its computation body head
            cm = re.search(r"calls=([%\w.\-]+)", line)
            if cm:
                body = re.search(
                    rf"^{re.escape(cm.group(1))}[^{{]*{{(.*?)^}}", txt,
                    re.MULTILINE | re.DOTALL)
                if body:
                    lines = [l.strip() for l in
                             body.group(1).strip().splitlines()]
                    interesting = [l for l in lines
                                   if re.search(r"convolution|dot|transpose|"
                                                r"broadcast|reduce|copy", l)]
                    for l in (interesting or lines)[:8]:
                        print("      ", l[:250], flush=True)


if __name__ == "__main__":
    dump(True, "/tmp/hlo_fused.txt",
         ["fusion.7", "add_maximum_fusion", "add_divide_fusion",
          "fusion.601", "fusion.106", "fusion.68", "fusion.40", "copy.53",
          "fusion.26", "fusion.600", "fusion.597", "reshape.30", "copy.24"])
