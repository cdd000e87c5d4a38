"""Torch ResNet checkpoint -> Flax encoder import parity.

Oracle: a torchvision-faithful ResNet encoder defined here in torch (torch
is installed; torchvision is not), randomly initialized WITH random running
BN statistics, saved as a state_dict. The converter
(models/torch_import.py) maps it into models/unet2d.py:ResNetEncoder and
every pyramid stage's activations must match torch's eval-mode forward.

Capability target: reference src/models/unet_factory.py:12-30
(encoder_weights="imagenet" — smp loads pretrained torch encoders).
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.models.torch_import import (
    apply_encoder_weights, convert_resnet_encoder, load_torch_checkpoint)
from mri_acl_imagesegmentation_adsp_tpu.models.unet2d import ResNetEncoder


# ---------------------------------------------------------------------------
# torch oracle (torchvision layout: key names, module order, stride
# placement all match torchvision.models.resnet)
# ---------------------------------------------------------------------------

class _TBasic(tnn.Module):
    expansion = 1

    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.downsample = None
        if stride != 1 or cin != width:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width, 1, stride, bias=False),
                tnn.BatchNorm2d(width))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        r = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + r)


class _TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.downsample = None
        if stride != 1 or cin != width * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(width * 4))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        r = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + r)


class _TResNetEncoder(tnn.Module):
    def __init__(self, blocks, bottleneck, in_ch=3):
        super().__init__()
        cls = _TBottleneck if bottleneck else _TBasic
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for s, (n, width) in enumerate(zip(blocks, (64, 128, 256, 512))):
            layers = []
            for b in range(n):
                stride = 2 if (s > 0 and b == 0) else 1
                layers.append(cls(cin, width, stride))
                cin = width * cls.expansion
            setattr(self, f"layer{s + 1}", tnn.Sequential(*layers))

    def forward_stages(self, x):
        """Returns [stem-relu /2, layer1 /4, layer2 /8, layer3 /16,
        layer4 /32] — the encoder pyramid (feats[1:] in unet2d)."""
        y = torch.relu(self.bn1(self.conv1(x)))
        feats = [y]
        y = self.maxpool(y)
        for s in range(4):
            y = getattr(self, f"layer{s + 1}")(y)
            feats.append(y)
        return feats


def _randomize_running_stats(model, seed):
    """Random (non-identity) BN running stats so eval-mode parity actually
    exercises the converted statistics."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(
                0.5 + torch.rand(m.running_var.shape, generator=g))


_CFGS = {"resnet18": ((2, 2, 2, 2), False),
         "resnet50": ((3, 4, 6, 3), True)}


@pytest.mark.parametrize("encoder", ["resnet18", "resnet50"])
def test_converted_encoder_matches_torch_stages(encoder, tmp_path):
    blocks, bottleneck = _CFGS[encoder]
    tm = _TResNetEncoder(blocks, bottleneck)
    with torch.no_grad():
        _randomize_running_stats(tm, seed=1)
    tm.eval()
    path = str(tmp_path / f"{encoder}.pt")
    torch.save(tm.state_dict(), path)

    x = np.random.default_rng(2).standard_normal((2, 64, 64, 3)
                                                 ).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tm.forward_stages(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))]

    fm = ResNetEncoder(encoder)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    p, s = convert_resnet_encoder(load_torch_checkpoint(path), encoder)
    feats = fm.apply({"params": p, "batch_stats": s}, jnp.asarray(x), False)

    assert len(feats) == 6  # [input, /2, /4, /8, /16, /32]
    for i, w in enumerate(want):
        got = np.transpose(np.asarray(feats[i + 1]), (0, 3, 1, 2))
        np.testing.assert_allclose(
            got, w, rtol=1e-3, atol=1e-4,
            err_msg=f"{encoder} stage {i} diverges from torch")
    # converted tree is structure-identical to the random init
    assert jax.tree_util.tree_structure(
        variables["params"]) == jax.tree_util.tree_structure(p)


def test_stem_channel_sum_matches_replicated_input(tmp_path):
    """1-channel model from a 3-channel checkpoint: the summed stem kernel
    equals feeding the gray->3 replicated input (the reference's
    imagenet_norm channel replication, dataio/datasets.py:68-72)."""
    tm = _TResNetEncoder((2, 2, 2, 2), False)
    with torch.no_grad():
        _randomize_running_stats(tm, seed=3)
    tm.eval()
    path = str(tmp_path / "r18.pt")
    torch.save(tm.state_dict(), path)

    gray = np.random.default_rng(4).standard_normal((1, 32, 32, 1)
                                                    ).astype(np.float32)
    with torch.no_grad():
        rep = np.repeat(np.transpose(gray, (0, 3, 1, 2)), 3, axis=1)
        want = tm.forward_stages(torch.from_numpy(rep))[-1].numpy()

    fm = ResNetEncoder("resnet18")
    p, s = convert_resnet_encoder(load_torch_checkpoint(path), "resnet18",
                                  stem_in_ch=1)
    feats = fm.apply({"params": p, "batch_stats": s}, jnp.asarray(gray),
                     False)
    got = np.transpose(np.asarray(feats[-1]), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_apply_encoder_weights_into_train_state(tmp_path):
    """Factory + trainer surface: encoder_weights=<path.pt> replaces ONLY
    the encoder subtree of a full U-Net TrainState (smp semantics)."""
    from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
    from mri_acl_imagesegmentation_adsp_tpu.models.factory import (
        validate_encoder_weights)
    from mri_acl_imagesegmentation_adsp_tpu.train.engine import TrainState
    import optax

    tm = _TResNetEncoder((2, 2, 2, 2), False, in_ch=3)
    tm.eval()
    path = str(tmp_path / "enc.pt")
    torch.save({"state_dict": {f"encoder.{k}": v for k, v in
                               tm.state_dict().items()}}, path)

    assert validate_encoder_weights("none") is None
    assert validate_encoder_weights(path) == path
    with pytest.raises(ValueError, match="imagenet"):
        validate_encoder_weights("imagenet")
    with pytest.raises(ValueError, match="neither"):
        build_unet("unet", "resnet18", "/nonexistent/w.pt")

    model = build_unet("unet", "resnet18", path, classes=1)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    tx = optax.adamw(1e-3)
    state = TrainState(params, variables["batch_stats"], tx.init(params),
                       jnp.int32(0))
    state2 = apply_encoder_weights(state, path, "resnet18")

    enc = "ResNetEncoder_0"
    want_stem = np.transpose(tm.conv1.weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(state2.params[enc]["Conv_0"]["kernel"]), want_stem,
        rtol=1e-6)
    # decoder untouched
    for k in state.params:
        if k != enc:
            a = jax.tree_util.tree_leaves(state.params[k])
            b = jax.tree_util.tree_leaves(state2.params[k])
            assert all(np.array_equal(x_, y_) for x_, y_ in zip(a, b))
    # model still runs with the imported weights
    out = model.apply({"params": state2.params,
                       "batch_stats": state2.batch_stats}, x, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_rejects_wrong_layout(tmp_path):
    with pytest.raises(ValueError, match="lacks torchvision"):
        convert_resnet_encoder({"foo.weight": np.zeros((1,))}, "resnet18")
    with pytest.raises(ValueError, match="unsupported encoder"):
        convert_resnet_encoder({}, "resnet99")
