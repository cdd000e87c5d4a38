"""Coverage for registry, volume-affine shards, classifier schedulers,
recon evaluate CLI, and the ISMRMRD SliceDataset."""
import json
import os
from pathlib import Path

import numpy as np
import pytest


def test_registry_builds_model_from_yaml(tmp_path):
    from mri_acl_imagesegmentation_adsp_tpu.configs import (
        load_component, build_from_yaml)
    fn = load_component(
        "mri_acl_imagesegmentation_adsp_tpu.models:build_unet")
    assert callable(fn)

    spec = tmp_path / "model.yaml"
    spec.write_text(
        "model:\n"
        "  class_path: \"mri_acl_imagesegmentation_adsp_tpu.models:build_unet\"\n"
        "  init_args:\n"
        "    model: unet\n"
        "    encoder: resnet18\n"
        "    classes: 2\n")
    model = build_from_yaml(str(spec), "model")
    assert model.classes == 2
    assert model.encoder == "resnet18"
    # single-component docs resolve without a key
    model2 = build_from_yaml(str(spec))
    assert model2.classes == 2

    # the shipped spec file builds the reference flagship
    shipped = Path("mri_acl_imagesegmentation_adsp_tpu/configs/knee_acl.yaml")
    flagship = build_from_yaml(str(shipped), "model")
    assert flagship.encoder == "resnet34"


def test_load_env_parser(tmp_path, monkeypatch):
    """C1: minimal .env parser — KEY=VALUE lines, comments/blank lines
    skipped, quotes stripped, no-override-by-default, explicit path wins
    over the CWD-parent search."""
    from mri_acl_imagesegmentation_adsp_tpu.configs.config import load_env

    env = tmp_path / ".env"
    env.write_text(
        "# dataset roots\n"
        "FASTMRI_ROOT=/data/fastmri\n"
        'KNEE_MRI_ROOT="/data/knee with spaces"\n'
        "  OAI_ZIB_ROOT = '/data/oai'  \n"
        "\n"
        "not a kv line\n")
    monkeypatch.delenv("FASTMRI_ROOT", raising=False)
    monkeypatch.setenv("KNEE_MRI_ROOT", "/existing")  # not overridden
    loaded = load_env(str(env))
    assert loaded["FASTMRI_ROOT"] == "/data/fastmri"
    assert os.environ["FASTMRI_ROOT"] == "/data/fastmri"
    assert os.environ["KNEE_MRI_ROOT"] == "/existing"
    assert loaded["OAI_ZIB_ROOT"] == "/data/oai"
    assert "not a kv line" not in loaded

    load_env(str(env), override=True)
    assert os.environ["KNEE_MRI_ROOT"] == "/data/knee with spaces"

    # CWD-parent search (python-dotenv default, reference config.py:8-26)
    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    monkeypatch.chdir(sub)
    monkeypatch.delenv("FASTMRI_ROOT", raising=False)
    assert load_env()["FASTMRI_ROOT"] == "/data/fastmri"


def test_volume_affine_shards_contract():
    from mri_acl_imagesegmentation_adsp_tpu.parallel import (
        volume_affine_shards)
    sizes = [10, 7, 7, 3, 3, 2]
    shards = volume_affine_shards(sizes, 3)
    assert len(shards) == 3
    lens = {len(s) for s in shards}
    assert len(lens) == 1, "pad-to-max equal lengths"
    # every slice of a volume stays on ONE shard
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    vol_of = np.repeat(np.arange(len(sizes)), sizes)
    for s in shards:
        uniq = set(np.asarray(s).tolist())
        for v in range(len(sizes)):
            vol_idx = set(range(starts[v], starts[v] + sizes[v]))
            assert vol_idx <= uniq or not (vol_idx & uniq), f"volume {v} split"
    # all slices covered across shards
    covered = set()
    for s in shards:
        covered |= set(np.asarray(s).tolist())
    assert covered == set(range(sum(sizes)))


def test_classifier_schedulers_match_torch():
    import torch
    from types import SimpleNamespace
    from mri_acl_imagesegmentation_adsp_tpu.classify.trainer_utils import (
        make_scheduler)

    def torch_factors(sched_ctor, epochs=12):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1.0)
        sch = sched_ctor(opt)
        out = []
        for _ in range(epochs):
            out.append(opt.param_groups[0]["lr"])
            sch.step()
        return out

    args = SimpleNamespace(scheduler="exponentiallr", gamma=0.9,
                           lr_decay_steps=(3, 6))
    mine = [make_scheduler(args)(e) for e in range(12)]
    ref = torch_factors(lambda o: torch.optim.lr_scheduler.ExponentialLR(
        o, gamma=0.9))
    np.testing.assert_allclose(mine, ref, rtol=1e-6)

    args.scheduler = "multistep"
    mine = [make_scheduler(args)(e) for e in range(12)]
    ref = torch_factors(lambda o: torch.optim.lr_scheduler.MultiStepLR(
        o, milestones=[3, 6], gamma=0.9))
    np.testing.assert_allclose(mine, ref, rtol=1e-6)


def test_evaluate_cli(tmp_path, rng):
    import h5py
    from mri_acl_imagesegmentation_adsp_tpu.cli.evaluate import main
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir(); pred_dir.mkdir()
    for name in ["a.h5", "b.h5"]:
        vol = np.abs(rng.standard_normal((3, 32, 32))).astype(np.float64)
        with h5py.File(gt_dir / name, "w") as hf:
            hf.create_dataset("reconstruction_rss", data=vol)
        with h5py.File(pred_dir / name, "w") as hf:
            hf.create_dataset("reconstruction",
                              data=vol + 0.01 * rng.standard_normal(vol.shape))
    rc = main(["--target-path", str(gt_dir), "--predictions-path",
               str(pred_dir), "--challenge", "multicoil"])
    assert rc == 0


ISMRMRD_HDR = """<?xml version="1.0"?>
<ismrmrdHeader xmlns="http://www.ismrm.org/ISMRMRD">
  <encoding>
    <encodedSpace><matrixSize><x>64</x><y>40</y><z>1</z></matrixSize></encodedSpace>
    <reconSpace><matrixSize><x>64</x><y>64</y><z>1</z></matrixSize></reconSpace>
    <encodingLimits><kspace_encoding_step_1>
      <minimum>0</minimum><maximum>39</maximum><center>20</center>
    </kspace_encoding_step_1></encodingLimits>
    <trajectoryDescription>
      <userParameterLong><name>rampUpTime</name><value>100</value></userParameterLong>
      <userParameterLong><name>rampDownTime</name><value>100</value></userParameterLong>
      <userParameterLong><name>flatTopTime</name><value>400</value></userParameterLong>
      <userParameterLong><name>acqDelayTime</name><value>10</value></userParameterLong>
      <userParameterLong><name>echoSpacing</name><value>1</value></userParameterLong>
    </trajectoryDescription>
  </encoding>
</ismrmrdHeader>"""


@pytest.fixture
def dwi_h5_dir(tmp_path, rng):
    import h5py
    d = tmp_path / "train"
    d.mkdir()
    n_avg, n_sl, n_coil, ro, pe = 26, 2, 3, 200, 10
    for name in ["case1.h5"]:
        ksp = (rng.standard_normal((n_avg, n_sl, n_coil, ro, pe))
               + 1j * rng.standard_normal((n_avg, n_sl, n_coil, ro, pe))
               ).astype(np.complex64)
        sens = (rng.standard_normal((n_sl, n_coil, ro, pe))
                + 1j * rng.standard_normal((n_sl, n_coil, ro, pe))
                ).astype(np.complex64)
        tr = np.abs(rng.standard_normal((n_sl, ro, pe))).astype(np.float32)
        with h5py.File(d / name, "w") as hf:
            hf.create_dataset("kspace", data=ksp)
            hf.create_dataset("coil_sens_maps", data=sens)
            hf.create_dataset("trace_b50", data=tr)
            hf.create_dataset("trace_b1000", data=tr)
            hf.create_dataset("ismrmrd_header",
                              data=ISMRMRD_HDR.encode())
    return d


def test_slice_dataset_ismrmrd(dwi_h5_dir):
    from mri_acl_imagesegmentation_adsp_tpu.data.recon_data import (
        SliceDataset, get_regridding_params)
    ds = SliceDataset(dwi_h5_dir, bvalue="b50")
    assert len(ds) == 2
    kspace, target, espirit, attrs, fname, sl = ds[0]
    assert kspace.shape == (3, 3, 200, 10, 2)   # (coils, b50 aves, ro, pe, 2)
    assert espirit.shape == (3, 1, 200, 10, 2)
    assert attrs["recon_size"] == (64, 64, 1)
    assert attrs["encoding_size"] == (64, 40, 1)
    assert fname == "case1.h5" and sl == 0

    params = get_regridding_params(ISMRMRD_HDR)
    assert params["rampUpTime"] == 100.0


def test_t2_padding_parse():
    from mri_acl_imagesegmentation_adsp_tpu.recon.t2 import get_padding
    # (encoded x=64 - (max 39 + 1)) / 2 = 12
    assert get_padding(ISMRMRD_HDR) == 12.0


def test_launcher_forwarded_fields_contract():
    """Every launcher-forwarded field exists both as a parser dest and as a
    UNet2DArgs field (catches drift when either side gains a flag)."""
    from mri_acl_imagesegmentation_adsp_tpu.cli.launcher import (
        _FORWARDED_TRAIN_FIELDS, build_parser)
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import UNet2DArgs
    import dataclasses

    dests = {a.dest for a in build_parser()._actions}
    arg_fields = {f.name for f in dataclasses.fields(UNet2DArgs)}
    for name in _FORWARDED_TRAIN_FIELDS:
        assert name in dests, f"launcher has no --{name.replace('_','-')}"
        assert name in arg_fields, f"UNet2DArgs has no field {name}"
    # the TPU remat lever is part of the forwarded surface
    assert "remat" in _FORWARDED_TRAIN_FIELDS


def test_shared_imagenet_norm_definition():
    """Training and serving must build the ImageNet input transform from
    ONE definition (utils/imagenet.py) — duplicated constants silently
    desynchronize train and serve."""
    import jax.numpy as jnp
    from mri_acl_imagesegmentation_adsp_tpu.utils.imagenet import (
        make_input_norm as canonical)
    from mri_acl_imagesegmentation_adsp_tpu.cli.infer import (
        make_input_norm as from_cli)
    from mri_acl_imagesegmentation_adsp_tpu.train import trainer as tr

    assert from_cli is canonical
    assert tr.make_input_norm is canonical
    x = jnp.ones((2, 4, 4, 1), jnp.float32)
    y = canonical(True)(x)
    assert y.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(y[..., 0]),
                               (1.0 - 0.485) / 0.229, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(canonical(False)(x)),
                                  np.asarray(x))
