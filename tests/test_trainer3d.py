"""3-D patch trainer tests."""
import os

import numpy as np
import pytest

from mri_acl_imagesegmentation_adsp_tpu.train.trainer3d import (
    KneeNPZ3D, UNet3DArgs, UNet3DTrainer,
)

pytestmark = pytest.mark.slow


@pytest.fixture
def packs3d(tmp_path, rng):
    files = []
    for v in range(2):
        img = rng.standard_normal((12, 1, 24, 24)).astype(np.float32)
        msk = np.zeros((12, 24, 24), np.uint8)
        msk[4:8, 8:16, 8:16] = 1  # compact positive region
        d = tmp_path / f"v{v}"
        d.mkdir()
        np.savez_compressed(d / "volume.npz", img=img, msk=msk)
        files.append(str(d / "volume.npz"))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(files))
    return str(lst)


def test_knee_npz3d_sampling_semantics(packs3d):
    ds = KneeNPZ3D(packs3d, roi=(16, 16, 8), pos_neg_ratio=1.0,
                   samples_per_vol=5, train=True, seed=0)
    assert len(ds) == 10
    px, py = ds[0]
    assert px.shape == (8, 16, 16)  # (D, Y, X)
    assert py.shape == (8, 16, 16)
    # volume z-score applied at load
    x, y = ds._load(0)
    assert abs(float(x.mean())) < 1e-4

    # positive-centred sampling must hit foreground often
    hits = sum(int(ds[i][1].max() > 0) for i in range(10))
    assert hits >= 4

    val = KneeNPZ3D(packs3d, roi=(16, 16, 8), train=False, seed=0)
    assert len(val) == 4  # 2 per volume


def test_unet3d_trainer_smoke(packs3d, tmp_path):
    args = UNet3DArgs(train_list=packs3d, val_list=packs3d,
                      out_dir=str(tmp_path / "run3d"), roi=(16, 16, 8),
                      channels=(4, 8, 16), classes=1, batch_size=2,
                      epochs=2, amp=False, samples_per_vol_train=4,
                      samples_per_vol_val=1)
    t = UNet3DTrainer(args)
    result = t.fit()
    assert np.isfinite(result["best_val_loss"])
    assert os.path.exists(result["best_ckpt"])
    log = open(os.path.join(args.out_dir, "train_log.csv")).read().splitlines()
    assert log[0] == "epoch,train_loss,val_loss,lr"
    assert len(log) == 3


def test_unet3d_trainer_data_parallel_matches(packs3d, tmp_path):
    """--data-parallel 2: one epoch on the mesh == the single-device run
    (InstanceNorm is per-sample, so batch sharding only re-associates the
    loss mean / gradient sums)."""
    def run(dp, name):
        args = UNet3DArgs(train_list=packs3d, val_list=packs3d,
                          out_dir=str(tmp_path / name), roi=(16, 16, 8),
                          channels=(4, 8), classes=1, batch_size=2,
                          epochs=1, amp=False, samples_per_vol_train=4,
                          samples_per_vol_val=1, seed=11, data_parallel=dp)
        t = UNet3DTrainer(args)
        tr = t.train_one_epoch()
        return tr, t.validate()

    tr_ref, vl_ref = run(1, "ref3d")
    tr_dp, vl_dp = run(2, "dp3d")
    assert abs(tr_dp - tr_ref) < 1e-4, (tr_dp, tr_ref)
    assert abs(vl_dp - vl_ref) < 1e-4, (vl_dp, vl_ref)


def test_unet3d_trainer_spatial_parallel_matches(packs3d, tmp_path):
    """--spatial-parallel 2: TRAINING with every patch depth-sharded over
    the mesh == the single-device run (GSPMD inserts halo collective-
    permutes for the strided convs and all-reduces for InstanceNorm stats
    and gradients; the math is unchanged). Also composed with
    --data-parallel 2 on the (data, depth) mesh. Beyond-reference: the
    reference trains 3-D ONLY on ROI crops sized to one GPU
    (train_unet3d.py:39-54); depth sharding puts 1/N of every activation
    on each device, so whole-volume training scales past one chip."""
    def run(dp, sp, name):
        args = UNet3DArgs(train_list=packs3d, val_list=packs3d,
                          out_dir=str(tmp_path / name), roi=(16, 16, 8),
                          channels=(4, 8), classes=1, batch_size=2,
                          epochs=1, amp=False, samples_per_vol_train=4,
                          samples_per_vol_val=1, seed=17,
                          data_parallel=dp, spatial_parallel=sp)
        t = UNet3DTrainer(args)
        tr = t.train_one_epoch()
        return tr, t.validate()

    tr_ref, vl_ref = run(1, 1, "ref3dsp")
    tr_sp, vl_sp = run(1, 2, "sp3d")
    assert abs(tr_sp - tr_ref) < 1e-4, (tr_sp, tr_ref)
    assert abs(vl_sp - vl_ref) < 1e-4, (vl_sp, vl_ref)
    tr_2d, vl_2d = run(2, 2, "dpsp3d")
    assert abs(tr_2d - tr_ref) < 1e-4, (tr_2d, tr_ref)
    assert abs(vl_2d - vl_ref) < 1e-4, (vl_2d, vl_ref)


def test_device_sampling_trains(tmp_path, packs3d):
    """HBM-resident store + in-jit patch sampling (device_sampling=True)
    trains with finite losses and writes the same artifacts."""
    args = UNet3DArgs(train_list=packs3d, val_list=packs3d,
                      out_dir=str(tmp_path / "dev3d"), roi=(16, 16, 4),
                      channels=(4, 8), batch_size=2, epochs=1, amp=False,
                      samples_per_vol_train=4, samples_per_vol_val=1,
                      device_sampling=True)
    result = UNet3DTrainer(args).fit()
    assert np.isfinite(result["best_val_loss"])
    assert os.path.exists(result["best_ckpt"])


def test_device_store_patch_semantics(packs3d):
    """Device store patches: right shapes, in-volume values, positive bias
    when requested."""
    import jax
    from mri_acl_imagesegmentation_adsp_tpu.data.volume3d import (
        DeviceVolumeStore)
    store = DeviceVolumeStore(packs3d, seed=0)
    x, y = store.sample_batch(jax.random.PRNGKey(0), 8, (16, 16, 4),
                              pos_neg_ratio=1e6)  # force positive centers
    x, y = np.asarray(x), np.asarray(y)
    assert x.shape == (8, 4, 16, 16, 1) and y.shape == (8, 4, 16, 16)
    # with an overwhelming ratio every patch containing positives must
    # actually contain positive voxels (center draws from the pos table)
    assert (y.reshape(8, -1).max(axis=1) > 0).mean() >= 0.9


def test_unet3d_accum_and_cli_surface(packs3d, tmp_path):
    """--accum-steps on the 3-D path (its whole point: batch 2 is the HBM
    ceiling at the reference ROI): 5 microbatches at accum 2 = 2 full
    groups + a ragged tail that still applies. Plus the reference
    parse_args surface (train_unet3d.py:105-133) rebuilt runnable."""
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer3d import parse_args

    args = parse_args([
        "--train-list", packs3d, "--val-list", packs3d,
        "--out-dir", str(tmp_path / "run3d_accum"),
        "--roi", "16", "16", "8", "--channels", "8", "16",
        "--epochs", "1", "--batch-size", "2",
        "--samples-per-vol-train", "5", "--samples-per-vol-val", "1",
        "--accum-steps", "2", "--seed", "3",
    ])
    assert args.accum_steps == 2 and args.roi == (16, 16, 8)
    out = UNet3DTrainer(args).fit()
    assert os.path.exists(out["best_ckpt"])
    assert np.isfinite(out["best_val_loss"])


def test_knee_npz3d_ragged_volumes_static_shapes(tmp_path, rng):
    """Volumes smaller than the ROI zero-pad to ONE static patch shape —
    mixed shapes previously crashed np.stack in batches() and would
    recompile the jitted step per shape (the reference crashes the same
    way on real knee corpora with D=64 vs ~36-45 slice volumes)."""
    files = []
    for v, s in enumerate((6, 12)):        # one volume shorter than D=8
        img = rng.standard_normal((s, 1, 24, 24)).astype(np.float32)
        msk = np.zeros((s, 24, 24), np.uint8)
        msk[s // 2, 4:20, 4:20] = 1
        d = tmp_path / f"rv{v}"
        d.mkdir()
        np.savez_compressed(d / "volume.npz", img=img, msk=msk)
        files.append(str(d / "volume.npz"))
    lst = tmp_path / "rlist.txt"
    lst.write_text("\n".join(files))

    ds = KneeNPZ3D(str(lst), roi=(16, 16, 8), samples_per_vol=4,
                   train=True, seed=0)
    shapes = {ds[i][0].shape for i in range(len(ds))}
    assert shapes == {(8, 16, 16)}
    for x, y in ds.batches(4, shuffle=True):    # crossed volumes stack
        assert x.shape[1:] == (8, 16, 16, 1)
        assert y.shape[1:] == (8, 16, 16)


def test_knee_npz3d_cache_is_bounded(packs3d):
    ds = KneeNPZ3D(packs3d, roi=(16, 16, 8), samples_per_vol=2,
                   train=True, seed=0, cache_volumes=1)
    ds._load(0)
    ds._load(1)
    assert len(ds._cache) == 1 and 1 in ds._cache  # LRU evicted volume 0


def test_unet3d_resume_bitwise_and_preempt(packs3d, tmp_path):
    """3-D trainer resume (the reference 3-D path cannot resume, SURVEY
    §5.4): preempt after epoch 2 of 4, then --resume — final params and
    train_log match the uninterrupted run bit-level (sampler RNG state is
    part of the snapshot)."""
    import jax

    def args_for(name, **kw):
        return UNet3DArgs(train_list=packs3d, val_list=packs3d,
                          out_dir=str(tmp_path / name), roi=(16, 16, 8),
                          channels=(4, 8, 16), classes=1, batch_size=2,
                          epochs=4, amp=False, samples_per_vol_train=4,
                          samples_per_vol_val=1, **kw)

    t_ref = UNet3DTrainer(args_for("r3d_ref"))
    t_ref.fit()

    t_int = UNet3DTrainer(args_for("r3d_int"))
    orig_epoch = t_int.train_one_epoch

    def epoch_then_preempt():
        out = orig_epoch()
        if not t_int._preempt and t_int.start_epoch == 1:
            # fires during epochs 1 and 2; preempt lands after epoch 2
            if os.path.exists(os.path.join(t_int.args.out_dir,
                                           "train_log.csv")):
                rows = open(os.path.join(
                    t_int.args.out_dir, "train_log.csv")).read().splitlines()
                if len(rows) >= 2:      # header + epoch-1 row
                    t_int.request_preempt()
        return out

    t_int.train_one_epoch = epoch_then_preempt
    t_int.fit()
    snaps = os.listdir(os.path.join(t_int.args.out_dir, "checkpoints"))
    assert "resume_000002" in snaps, snaps

    t_res = UNet3DTrainer(args_for("r3d_int", resume=True))
    assert t_res.start_epoch == 3
    t_res.fit()

    for a, b in zip(jax.tree.leaves((t_ref.params, t_ref.batch_stats,
                                     t_ref.opt_state)),
                    jax.tree.leaves((t_res.params, t_res.batch_stats,
                                     t_res.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    log_ref = open(os.path.join(t_ref.args.out_dir,
                                "train_log.csv")).read().splitlines()
    log_res = open(os.path.join(t_res.args.out_dir,
                                "train_log.csv")).read().splitlines()
    assert log_ref == log_res
