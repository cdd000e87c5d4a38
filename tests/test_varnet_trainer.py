"""VarNet trainer + transforms tests (synthetic in-memory samples)."""
import numpy as np
import pytest

from mri_acl_imagesegmentation_adsp_tpu.data.transforms import (
    to_tensor, tensor_to_complex_np, center_crop, complex_center_crop,
    center_crop_to_smallest, normalize_instance, VarNetSample,
    VarNetDataTransform,
)
from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
    VarNetArgs, VarNetTrainer, combine_directions,
)
from mri_acl_imagesegmentation_adsp_tpu.train.early_stopping import EarlyStopping

pytestmark = pytest.mark.slow


def test_transforms_roundtrip_and_crops(rng):
    c = (rng.standard_normal((4, 6, 6))
         + 1j * rng.standard_normal((4, 6, 6))).astype(np.complex64)
    t = to_tensor(c)
    assert t.shape == (4, 6, 6, 2)
    np.testing.assert_allclose(tensor_to_complex_np(t), c, atol=1e-6)

    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    got = center_crop(x, (4, 4))
    np.testing.assert_array_equal(got, x[:, 3:7, 2:6])
    with pytest.raises(ValueError):
        center_crop(x, (11, 4))

    xp = rng.standard_normal((10, 8, 2)).astype(np.float32)
    got = complex_center_crop(xp, (4, 4))
    np.testing.assert_array_equal(got, xp[3:7, 2:6, :])

    a = rng.standard_normal((1, 8, 12))
    b = rng.standard_normal((1, 10, 6))
    ca, cb = center_crop_to_smallest(a, b)
    assert ca.shape == cb.shape == (1, 8, 6)

    norm, mean, std = normalize_instance(x)
    assert abs(norm.mean()) < 1e-5


def test_varnet_data_transform(rng):
    k = (rng.standard_normal((3, 2, 8, 8))
         + 1j * rng.standard_normal((3, 2, 8, 8))).astype(np.complex64)
    esp = k.copy()
    tgt = np.abs(rng.standard_normal((8, 8))).astype(np.float32)
    tr = VarNetDataTransform()
    s = tr(k, tgt, esp, {"max": float(tgt.max()), "recon_size": (8, 8, 1)},
           "vol1.h5", 3)
    assert s.kspace.shape == (3, 2, 8, 8, 2)
    assert s.max_value == tgt.max()
    assert s.slice_num == 3 and s.crop_size == (8, 8)


def test_combine_directions_b50_and_b1000(rng):
    import jax.numpy as jnp
    out3 = jnp.asarray(np.abs(rng.standard_normal((2, 3, 6, 6))) + 0.1)
    got = np.asarray(combine_directions(out3))
    expect = np.asarray(out3).prod(1) ** (1 / 3)
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    out12 = jnp.asarray(np.abs(rng.standard_normal((1, 12, 6, 6))) + 0.1)
    got = np.asarray(combine_directions(out12))
    o = np.asarray(out12)
    x = o[:, [0, 3, 6, 9]].sum(1) / 4
    y = o[:, [1, 4, 7, 10]].sum(1) / 4
    z = o[:, [2, 5, 8, 11]].sum(1) / 4
    np.testing.assert_allclose(got, np.cbrt(x * y * z), rtol=1e-5)


def _fake_samples(rng, n=3, coils=2, aves=3, h=16, w=16, fname="vol0.h5"):
    samples = []
    targets = [np.abs(rng.standard_normal((h, w))).astype(np.float32) + 0.2
               for _ in range(n)]
    vol_max = float(max(t.max() for t in targets))  # per-volume max
    for s in range(n):
        k = rng.standard_normal((coils, aves, h, w, 2)).astype(np.float32)
        esp = rng.standard_normal((coils, aves, h, w, 2)).astype(np.float32)
        samples.append(VarNetSample(
            kspace=k, target=targets[s], espirit=esp, fname=fname,
            slice_num=s, max_value=vol_max, crop_size=(h, w)))
    return samples


def test_varnet_trainer_smoke(tmp_path, rng):
    train = _fake_samples(rng, n=2)
    val = (_fake_samples(rng, n=2, fname="volA.h5")
           + _fake_samples(rng, n=2, fname="volB.h5"))
    args = VarNetArgs(out_dir=str(tmp_path), bvalue="b50", num_cascades=1,
                      chans=4, pools=2, sens_chans=4, sens_pools=2,
                      epochs=2, crop=12, amp=False)
    t = VarNetTrainer(args, train_ds=train, val_ds=val)
    result = t.fit()
    hist = result["history"]
    assert len(hist) == 2
    assert all(np.isfinite(h["train_loss"]) for h in hist)
    assert set(hist[0]) >= {"nmse", "ssim", "psnr", "validation_loss"}
    import os
    assert os.path.exists(result["best_ckpt"])


def test_varnet_validation_dedups_duplicate_slices(tmp_path, rng):
    """DDP-padding duplicates must be absorbed by the (fname, slice) dict."""
    val = _fake_samples(rng, n=2, fname="volA.h5")
    val_dup = val + [val[0]]  # duplicated first slice
    args = VarNetArgs(out_dir=str(tmp_path), num_cascades=1, chans=4,
                      pools=2, sens_chans=4, sens_pools=2, crop=12, amp=False)
    t = VarNetTrainer(args, train_ds=[], val_ds=val)
    t2 = VarNetTrainer(args, train_ds=[], val_ds=val_dup)
    k = np.asarray(val[0].kspace)[None]
    e = np.asarray(val[0].espirit)[None]
    t._init_if_needed(k, e)
    t2.params = t.params  # same weights
    t2.opt_state = t.opt_state
    m1, m2 = t.validate(), t2.validate()
    for key in ["nmse", "ssim", "psnr"]:
        assert abs(m1[key] - m2[key]) < 1e-6, key


def test_early_stopping_contract():
    saves = []
    es = EarlyStopping(patience=2, save_fn=lambda: saves.append(1),
                       trace_func=lambda *a, **k: None)
    for v in [1.0, 0.9, 0.95]:
        es(v)
    assert not es.early_stop and len(saves) == 2 and es.counter == 1
    es(0.96)  # second bad epoch reaches patience=2
    assert es.early_stop


def test_varnet_reconstruct_exports_h5(tmp_path, rng):
    """Test-time export: per-volume slice stacks (deduped, slice-sorted)
    written as h5 files with a "reconstruction" dataset — the vendored
    test flow's artifact (save_recon)."""
    import h5py

    val = (_fake_samples(rng, n=2, fname="volA.h5")
           + _fake_samples(rng, n=3, fname="volB.h5"))
    val = val + [val[0]]  # a padding duplicate to dedup
    args = VarNetArgs(out_dir=str(tmp_path), num_cascades=1, chans=4,
                      pools=2, sens_chans=4, sens_pools=2, crop=12, amp=False)
    t = VarNetTrainer(args, train_ds=[], val_ds=val)
    out_dir = tmp_path / "recons"
    stacks = t.reconstruct(val, out_dir=out_dir)
    assert set(stacks) == {"volA.h5", "volB.h5"}
    assert stacks["volA.h5"].shape[0] == 2      # dedup kept 2 slices
    assert stacks["volB.h5"].shape[0] == 3
    with h5py.File(out_dir / "volA.h5", "r") as hf:
        np.testing.assert_allclose(hf["reconstruction"][:],
                                   stacks["volA.h5"], rtol=1e-6)


def test_varnet_trainer_batched_steps(tmp_path, rng):
    """batch_size groups same-shape samples into one optimizer step (the
    fixed-cost amortization path); shape mismatches flush early and the
    leftover tail still trains. Counted via a step-spy."""
    train = _fake_samples(rng, n=4) + _fake_samples(
        rng, n=1, h=24, w=16, fname="odd.h5")      # shape break -> flush
    val = _fake_samples(rng, n=2, fname="volA.h5")
    args = VarNetArgs(out_dir=str(tmp_path), bvalue="b50", num_cascades=1,
                      chans=4, pools=2, sens_chans=4, sens_pools=2,
                      epochs=1, crop=12, amp=False, batch_size=2)
    t = VarNetTrainer(args, train_ds=train, val_ds=val)
    sizes = []
    orig = t._step_batch

    def spy(batch):
        sizes.append(len(batch))
        return orig(batch)

    t._step_batch = spy
    result = t.fit()
    # 4 same-shape samples -> two steps of 2; the odd-shape sample flushes
    # into its own step of 1
    assert sizes == [2, 2, 1]
    assert np.isfinite(result["history"][0]["train_loss"])


def test_varnet_preempt_saves_snapshot_and_stops(tmp_path, rng):
    """fit(preempt_save=True) + request_preempt(): the trainer writes a
    resume snapshot at the epoch boundary, stops early, and a resume run
    continues from it."""
    import os

    train = _fake_samples(rng, n=2)
    val = _fake_samples(rng, n=2, fname="volA.h5")
    args = VarNetArgs(out_dir=str(tmp_path), bvalue="b50", num_cascades=1,
                      chans=4, pools=2, sens_chans=4, sens_pools=2,
                      epochs=4, crop=12, amp=False)
    t = VarNetTrainer(args, train_ds=train, val_ds=val)
    orig = t.train_one_epoch

    def epoch_then_preempt():
        out = orig()
        if t.epoch == 2:
            t.request_preempt()
        return out

    t.train_one_epoch = epoch_then_preempt
    result = t.fit(preempt_save=True)
    assert len(result["history"]) == 2          # stopped after epoch 2
    snaps = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert "resume_000002" in snaps, snaps

    t2 = VarNetTrainer(args, train_ds=train, val_ds=val)
    result2 = t2.fit(resume=True)
    assert [h["epoch"] for h in result2["history"]] == [3, 4]


def test_varnet_async_snapshots_and_retention(tmp_path, rng):
    """ckpt_async + resume_keep on the VarNet trainer: every epoch's async
    snapshot is published (fit's finally drains the pending one), only the
    newest resume_keep survive, and a fresh trainer resumes from the
    newest. Misconfiguration (async without orbax) is rejected up front."""
    import os

    train = _fake_samples(rng, n=2)
    val = _fake_samples(rng, n=2, fname="volA.h5")
    args = VarNetArgs(out_dir=str(tmp_path), bvalue="b50", num_cascades=1,
                      chans=4, pools=2, sens_chans=4, sens_pools=2,
                      epochs=3, crop=12, amp=False,
                      ckpt_backend="orbax", ckpt_async=True, resume_keep=1)
    t = VarNetTrainer(args, train_ds=train, val_ds=val)
    t.fit(save_resume_every=1)
    assert t._pending_ckpt is None
    snaps = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert snaps == ["resume_000003"], snaps

    t2 = VarNetTrainer(args, train_ds=train, val_ds=val)
    result2 = t2.fit(resume=True)
    assert result2["history"] == []             # already at epochs=3

    with pytest.raises(ValueError, match="orbax"):
        VarNetTrainer(VarNetArgs(out_dir=str(tmp_path), ckpt_async=True))
