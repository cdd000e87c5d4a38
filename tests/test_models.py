"""Shape/behavior tests for the Flax model zoo."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.models import (
    build_unet, build_unet3d, FastMRIUnet,
)


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    if train:
        out, _ = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, train=False)
    return out, variables


def test_unet_resnet34_shapes():
    model = build_unet("unet", "resnet34", "none", in_ch=1, classes=1)
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    out, variables = _init_and_apply(model, x)
    assert out.shape == (2, 64, 64, 1)
    assert out.dtype == jnp.float32
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    # smp Unet(resnet34, in=1, classes=1) is ~24.4M params; ours must be in
    # the same capacity class (same encoder/decoder widths).
    assert 20e6 < n_params < 30e6, n_params


def test_unet_multichannel_multiclass():
    model = build_unet("unet", "resnet18", "none", in_ch=3, classes=4)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 32, 32, 4)


def test_unet_train_mode_updates_batch_stats():
    model = build_unet("unet", "resnet18", "none", classes=1)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    out, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed, "batch stats must move in train mode"


def test_unetpp_shapes():
    model = build_unet("unetpp", "resnet18", "none", classes=1)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 64, 64, 1)


def test_unet_rejects_pretrained_weights():
    import pytest
    with pytest.raises(ValueError):
        build_unet("unet", "resnet34", "imagenet")


def test_unet_bf16_compute_fp32_logits():
    model = build_unet("unet", "resnet18", "none", classes=1, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.dtype == jnp.float32


def test_fastmri_unet_odd_shapes():
    model = FastMRIUnet(out_chans=1, chans=8, num_pool_layers=3)
    x = jnp.zeros((1, 37, 53, 1), jnp.float32)
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 37, 53, 1)


def test_unet3d_shapes():
    model = build_unet3d(classes=1, channels=(8, 16, 32, 64, 80))
    x = jnp.zeros((1, 16, 32, 32, 1), jnp.float32)  # NDHWC
    out, _ = _init_and_apply(model, x)
    assert out.shape == (1, 16, 32, 32, 1)


@pytest.mark.slow  # 38 s grad compile; learning asserted end-to-end in test_trainer (fast)
def test_unet_gradients_flow():
    model = build_unet("unet", "resnet18", "none", classes=1)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 32, 32, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_fused_decoder_matches_naive_exactly():
    """The phase-space decoder (models/phaseconv.py) is a pure relowering:
    identical parameter tree, f32 outputs / batch_stats / grads equal to the
    naive nearest-up+conv path up to fp reassociation."""
    from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import (
        ResNetEncoderUNet)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    naive = ResNetEncoderUNet("resnet18", classes=1, fused_decoder=False)
    fused = ResNetEncoderUNet("resnet18", classes=1, fused_decoder=True)
    v_n = naive.init(jax.random.PRNGKey(0), x, train=False)
    v_f = fused.init(jax.random.PRNGKey(0), x, train=False)

    keys_n = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_n["params"])]
    keys_f = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_f["params"])]
    assert keys_n == keys_f, "fused decoder changed the parameter tree"

    y_n = naive.apply(v_n, x, train=False)
    y_f = fused.apply(v_n, x, train=False)
    assert np.allclose(np.asarray(y_n), np.asarray(y_f), atol=5e-4)

    o_n, s_n = naive.apply(v_n, x, train=True, mutable=["batch_stats"])
    o_f, s_f = fused.apply(v_n, x, train=True, mutable=["batch_stats"])
    assert np.allclose(np.asarray(o_n), np.asarray(o_f), atol=5e-4)
    for a, b in zip(jax.tree.leaves(s_n), jax.tree.leaves(s_f)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def loss(p, model):
        out, _ = model.apply(
            {"params": p, "batch_stats": v_n["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g_n = jax.grad(loss)(v_n["params"], naive)
    g_f = jax.grad(loss)(v_n["params"], fused)
    for a, b in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_f)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_phaseconv_primitives_match_reference_lowering():
    """upconv/dense phase kernels reproduce conv3x3(up2(x)) and conv3x3(y)
    exactly on random tensors (the identity the decoder relies on)."""
    from jax import lax
    from mri_acl_imagesegmentation_adsp_tpu.models.phaseconv import (
        apply_phase_conv, dense_phase_kernel, depth_to_space,
        space_to_depth, upconv_phase_kernel)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 5)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))

    def conv3x3(t, w):
        return lax.conv_general_dilated(
            t, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # up-conv identity (2x2 VALID variant)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    want = conv3x3(up, k)
    got = depth_to_space(apply_phase_conv(x, upconv_phase_kernel(k)))
    assert np.allclose(np.asarray(want), np.asarray(got), atol=1e-5)

    # up-conv identity (epilogue-free 3x3 SAME embedding — the production
    # lowering in _DecoderBlock._fused)
    from mri_acl_imagesegmentation_adsp_tpu.models.phaseconv import (
        upconv_embedded_kernel)
    got = depth_to_space(conv3x3(x, upconv_embedded_kernel(k)))
    assert np.allclose(np.asarray(want), np.asarray(got), atol=1e-5)

    # dense identity (input already high-res)
    y = jnp.asarray(rng.standard_normal((2, 20, 24, 5)).astype(np.float32))
    want = conv3x3(y, k)
    got = depth_to_space(
        apply_phase_conv(space_to_depth(y), dense_phase_kernel(k)))
    assert np.allclose(np.asarray(want), np.asarray(got), atol=1e-5)

    # dense identity (epilogue-free 3x3 SAME embedding — the production
    # lowering of the phase-space tail: conv2 of the last block + head)
    from mri_acl_imagesegmentation_adsp_tpu.models.phaseconv import (
        dense_embedded_kernel)
    got = depth_to_space(
        conv3x3(space_to_depth(y), dense_embedded_kernel(k)))
    assert np.allclose(np.asarray(want), np.asarray(got), atol=1e-5)

    # strided identity: conv3x3 on a HIGH-RES tensor emitting phase-major
    # output directly (the skip-conv lowering of phase-internal blocks)
    from mri_acl_imagesegmentation_adsp_tpu.models.phaseconv import (
        apply_strided_phase, strided_phase_kernel)
    got = depth_to_space(apply_strided_phase(y, strided_phase_kernel(k)))
    assert np.allclose(np.asarray(want), np.asarray(got), atol=1e-5)

    # s2d/d2s roundtrip
    assert np.allclose(np.asarray(depth_to_space(space_to_depth(y))),
                       np.asarray(y))


def test_efficient_batchnorm_matches_flax():
    """models/norm.py BatchNorm == nn.BatchNorm in f32: same param/stat
    tree, same outputs (train+eval), same running-stat updates, same grads
    (including the through-stats terms)."""
    import flax.linen as fnn
    from mri_acl_imagesegmentation_adsp_tpu.models.norm import BatchNorm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 9, 9, 6)).astype(np.float32) * 3
                    + 1.0)

    class Ours(fnn.Module):
        train: bool

        @fnn.compact
        def __call__(self, x):
            return BatchNorm(use_running_average=not self.train,
                             momentum=0.9, epsilon=1e-5)(x)

    class Flax(fnn.Module):
        train: bool

        @fnn.compact
        def __call__(self, x):
            return fnn.BatchNorm(use_running_average=not self.train,
                                 momentum=0.9, epsilon=1e-5)(x)

    v_o = Ours(train=True).init(jax.random.PRNGKey(0), x)
    v_f = Flax(train=True).init(jax.random.PRNGKey(0), x)
    ko = [jax.tree_util.keystr(k) for k, _ in
          jax.tree_util.tree_leaves_with_path(v_o)]
    kf = [jax.tree_util.keystr(k) for k, _ in
          jax.tree_util.tree_leaves_with_path(v_f)]
    assert ko == kf

    # train: outputs + stat updates
    y_o, s_o = Ours(train=True).apply(v_f, x, mutable=["batch_stats"])
    y_f, s_f = Flax(train=True).apply(v_f, x, mutable=["batch_stats"])
    assert np.allclose(np.asarray(y_o), np.asarray(y_f), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_o), jax.tree.leaves(s_f)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # eval with non-trivial running stats
    stats = {"BatchNorm_0": {"mean": jnp.asarray([0.5, -1.0, 2.0, 0, 1, 3]),
                             "var": jnp.asarray([1.5, 0.3, 2.2, 1, 9, 4])}}
    vars_eval = {"params": v_f["params"], "batch_stats": stats}
    y_o = Ours(train=False).apply(vars_eval, x)
    y_f = Flax(train=False).apply(vars_eval, x)
    assert np.allclose(np.asarray(y_o), np.asarray(y_f), atol=1e-5)

    # grads (params + input, through batch stats)
    def loss(p, mod):
        out, _ = mod.apply({"params": p, "batch_stats": stats}, x,
                           mutable=["batch_stats"])
        return jnp.sum(out ** 3)

    g_o = jax.grad(loss)(v_f["params"], Ours(train=True))
    g_f = jax.grad(loss)(v_f["params"], Flax(train=True))
    for a, b in zip(jax.tree.leaves(g_o), jax.tree.leaves(g_f)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                           atol=1e-4)
    gx_o = jax.grad(lambda t: jnp.sum(Ours(train=True).apply(
        v_f, t, mutable=["batch_stats"])[0] ** 3))(x)
    gx_f = jax.grad(lambda t: jnp.sum(Flax(train=True).apply(
        v_f, t, mutable=["batch_stats"])[0] ** 3))(x)
    assert np.allclose(np.asarray(gx_o), np.asarray(gx_f), rtol=1e-4,
                       atol=1e-4)


def test_fused_decoder_short_decoder_channels():
    """A shortened decoder (last block still consumes a skip) must fall
    back to the plain high-res head under fused_decoder=True and match the
    naive path (regression: the phase head used to assume the 5-deep
    decoder's skip-free last block)."""
    from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import (
        ResNetEncoderUNet)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)).astype(np.float32))
    kw = dict(encoder="resnet18", classes=1,
              decoder_channels=(256, 128, 64, 32))
    naive = ResNetEncoderUNet(fused_decoder=False, **kw)
    fused = ResNetEncoderUNet(fused_decoder=True, **kw)
    v = naive.init(jax.random.PRNGKey(0), x, train=False)
    y_n = naive.apply(v, x, train=False)
    y_f = fused.apply(v, x, train=False)
    assert y_n.shape == y_f.shape == (1, 32, 32, 1)
    assert np.allclose(np.asarray(y_n), np.asarray(y_f), atol=5e-4)


def test_unetpp_fused_matches_naive():
    """UNet++ phase lowering (per-node phase up-conv + phase-space tail) is
    a pure relowering: identical parameter tree, f32 outputs and grads
    equal to the naive path up to fp reassociation."""
    from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import UNetPlusPlus

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    naive = UNetPlusPlus("resnet18", classes=1, fused_decoder=False)
    fused = UNetPlusPlus("resnet18", classes=1, fused_decoder=True)
    v_n = naive.init(jax.random.PRNGKey(0), x, train=False)
    v_f = fused.init(jax.random.PRNGKey(0), x, train=False)
    keys_n = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_n)]
    keys_f = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_f)]
    assert keys_n == keys_f, "fused UNet++ changed the variable tree"

    y_n = naive.apply(v_n, x, train=False)
    y_f = fused.apply(v_n, x, train=False)
    assert np.allclose(np.asarray(y_n), np.asarray(y_f), atol=5e-4)

    o_n, s_n = naive.apply(v_n, x, train=True, mutable=["batch_stats"])
    o_f, s_f = fused.apply(v_n, x, train=True, mutable=["batch_stats"])
    assert np.allclose(np.asarray(o_n), np.asarray(o_f), atol=5e-4)
    for a, b in zip(jax.tree.leaves(s_n), jax.tree.leaves(s_f)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def loss(p, model):
        out, _ = model.apply(
            {"params": p, "batch_stats": v_n["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g_n = jax.grad(loss)(v_n["params"], naive)
    g_f = jax.grad(loss)(v_n["params"], fused)
    for a, b in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_f)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow  # 42 s of 3-D compiles; 3-D path also covered by trainer3d e2e (slow)
@pytest.mark.nightly   # 194 s compile-bound 3-D equality; lighter cover =
#   the 2-D phase-lowering exactness pins + unet3d trainer smoke
def test_unet3d_fused_up_matches_naive():
    """The 1x1x1-phase relowering of the kernel-2 stride-2 transpose conv
    is exactly the transpose conv (every output voxel has one tap):
    identical variable tree, equal f32 outputs and grads."""
    from mri_acl_imagesegmentation_adsp_tpu.models.unet3d import (
        ResidualUNet3D)

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32))
    kw = dict(classes=1, channels=(8, 16, 32, 48, 64))
    naive = ResidualUNet3D(fused_up=False, **kw)
    fused = ResidualUNet3D(fused_up=True, **kw)
    v_n = naive.init(jax.random.PRNGKey(0), x, train=False)
    v_f = fused.init(jax.random.PRNGKey(0), x, train=False)
    keys_n = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_n)]
    keys_f = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_f)]
    assert keys_n == keys_f, "fused_up changed the variable tree"
    y_n = naive.apply(v_n, x, train=False)
    y_f = fused.apply(v_n, x, train=False)
    assert np.allclose(np.asarray(y_n), np.asarray(y_f), atol=1e-4)

    g_n = jax.grad(lambda p: jnp.mean(naive.apply(
        {"params": p}, x, train=False) ** 2))(v_n["params"])
    g_f = jax.grad(lambda p: jnp.mean(fused.apply(
        {"params": p}, x, train=False) ** 2))(v_n["params"])
    for a, b in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_f)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fastmri_unet_tconv_fused_matches_naive():
    """TransposeConvBlock's 1x1-phase relowering equals the transpose conv
    exactly, with the same ConvTranspose_0/kernel parameter."""
    from mri_acl_imagesegmentation_adsp_tpu.models.fastmri_unet import (
        TransposeConvBlock)

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 6)).astype(np.float32))
    naive = TransposeConvBlock(8, fused=False)
    fused = TransposeConvBlock(8, fused=True)
    v_n = naive.init(jax.random.PRNGKey(0), x)
    v_f = fused.init(jax.random.PRNGKey(0), x)
    keys_n = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_n)]
    keys_f = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_f)]
    assert keys_n == keys_f
    y_n = np.asarray(naive.apply(v_n, x))
    y_f = np.asarray(fused.apply(v_n, x))
    assert y_f.shape == (2, 20, 28, 8)
    assert np.allclose(y_n, y_f, atol=1e-5)


def test_fastmri_unet_phase_matches_naive():
    """phase_max_chans levels equal the naive U-Net with the SAME params
    (the strided/dense/tconv relowerings are exact linear kernel
    re-expressions; the phase InstanceNorm and phase-mean pool reduce the
    same element sets, so only f32 reassociation separates the paths)."""
    from mri_acl_imagesegmentation_adsp_tpu.models.fastmri_unet import (
        FastMRIUnet)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 6)).astype(np.float32))
    naive = FastMRIUnet(out_chans=6, chans=8, num_pool_layers=3)
    phase = FastMRIUnet(out_chans=6, chans=8, num_pool_layers=3,
                        phase_max_chans=16)   # levels 8 and 16 lowered
    v = naive.init(jax.random.PRNGKey(0), x)
    v_p = phase.init(jax.random.PRNGKey(0), x)
    keys = [jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_leaves_with_path(v)]
    keys_p = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_p)]
    assert keys == keys_p   # identical parameter trees
    y_n = np.asarray(naive.apply(v, x))
    y_p = np.asarray(phase.apply(v, x))      # phase path, naive's params
    assert y_p.shape == y_n.shape
    np.testing.assert_allclose(y_p, y_n, rtol=2e-4, atol=2e-5)


def test_fastmri_unet_phase_odd_dims_fall_back():
    """Odd spatial dims at a would-be phase level degrade to the naive
    block (same params), not an error."""
    from mri_acl_imagesegmentation_adsp_tpu.models.fastmri_unet import (
        FastMRIUnet)

    rng = np.random.default_rng(6)
    # 24x20 -> pads to 24x24? no: pools=2 -> mult 4 -> 24x20 ok; level dims
    # 24x20 (even) then 12x10 (even) then 6x5 bottleneck — all phase levels
    # even here, so force oddness via 20->18: 18 ok, 9 odd at level 1
    x = jnp.asarray(rng.standard_normal((1, 20, 18, 2)).astype(np.float32))
    m = FastMRIUnet(out_chans=2, chans=4, num_pool_layers=2,
                    phase_max_chans=8)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 20, 18, 2)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow  # r5 fast-gate re-tier (VERDICT r4 #6): heavy compile; a cheaper fast pin or the dryrun covers this path
def test_unet2d_remat_matches_naive_exactly():
    """remat=True (per-block jax.checkpoint, a backward-pass HBM-traffic
    lever on the b8 train step) is numerics- and checkpoint-transparent:
    identical parameter tree/names, bit-equal forward and batch_stats;
    grads equal up to fp reassociation (XLA fuses the recomputed forward
    differently inside the backward), same tolerance as the fused-decoder
    equality test above."""
    from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import (
        ResNetEncoderUNet)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    base = ResNetEncoderUNet("resnet18", classes=1, remat=False)
    rmt = ResNetEncoderUNet("resnet18", classes=1, remat=True)
    v_b = base.init(jax.random.PRNGKey(0), x, train=False)
    v_r = rmt.init(jax.random.PRNGKey(0), x, train=False)

    keys_b = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_b)]
    keys_r = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_leaves_with_path(v_r)]
    assert keys_b == keys_r, "remat changed the variable tree"

    y_b = base.apply(v_b, x, train=False)
    y_r = rmt.apply(v_b, x, train=False)
    assert np.array_equal(np.asarray(y_b), np.asarray(y_r))

    o_b, s_b = base.apply(v_b, x, train=True, mutable=["batch_stats"])
    o_r, s_r = rmt.apply(v_b, x, train=True, mutable=["batch_stats"])
    assert np.array_equal(np.asarray(o_b), np.asarray(o_r))
    for a, b in zip(jax.tree.leaves(s_b), jax.tree.leaves(s_r)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def loss(p, model):
        out, _ = model.apply(
            {"params": p, "batch_stats": v_b["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g_b = jax.jit(jax.grad(loss), static_argnums=1)(v_b["params"], base)
    g_r = jax.jit(jax.grad(loss), static_argnums=1)(v_b["params"], rmt)
    # per-leaf relative L2: recompute-vs-saved reassociation through ~20
    # BN'd conv layers lands around 1e-5..1e-3 depending on the XLA CPU
    # config (virtual-device count / cached AOT programs); a direction
    # change would be O(1)
    for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_r)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        assert rel < 5e-3, rel
