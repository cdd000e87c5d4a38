"""Extra trainer coverage: 2.5-D training, test() evaluation, VarNet resume."""
import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture
def packs(tmp_path, rng):
    files = []
    for v in range(3):
        img = rng.standard_normal((6, 1, 32, 32)).astype(np.float32)
        msk = (img[:, 0] > 0.3).astype(np.uint8)  # learnable target
        d = tmp_path / f"v{v}"
        d.mkdir()
        np.savez_compressed(d / "volume.npz", img=img, msk=msk)
        files.append(str(d / "volume.npz"))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(files))
    return str(lst)


def test_25d_training_and_test_api(packs, tmp_path):
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
        UNet2DArgs, UNet2DTrainer)
    args = UNet2DArgs(train_list=packs, val_list=packs,
                      out_dir=str(tmp_path / "run25d"), k=3,
                      encoder="resnet18", epochs=2, batch_size=4, amp=False,
                      logger="noop", aug="none")
    t = UNet2DTrainer(args)
    result = t.run()
    assert np.isfinite(result["history"][-1]["val_dice"])

    # Engine.test parity: reloading best.ckpt and re-validating the same
    # store is deterministic -> dice must match best val_dice exactly
    # (loose tolerances here would mask load_best/state-restore regressions)
    metrics = t.test(str(tmp_path / "run25d" / "best.ckpt"))
    assert abs(metrics["dice"]
               - result["summary"]["best"]["val_dice"]) < 1e-6
    assert 0 <= metrics["iou"] <= 1

    # evaluating an explicit list (held-out split surface) works too
    metrics2 = t.test(str(tmp_path / "run25d" / "best.ckpt"),
                      list_txt=packs)
    assert abs(metrics2["dice"] - metrics["dice"]) < 1e-6


def test_varnet_resume(tmp_path, rng):
    from mri_acl_imagesegmentation_adsp_tpu.data.transforms import VarNetSample
    from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
        VarNetArgs, VarNetTrainer)

    def make(n, fname):
        out = []
        tg = [np.abs(rng.standard_normal((16, 16))).astype(np.float32) + 0.2
              for _ in range(n)]
        mv = float(max(t.max() for t in tg))
        for s in range(n):
            out.append(VarNetSample(
                rng.standard_normal((2, 3, 16, 16, 2)).astype(np.float32),
                tg[s],
                rng.standard_normal((2, 3, 16, 16, 2)).astype(np.float32),
                fname, s, mv, (16, 16)))
        return out

    train, val = make(2, "a.h5"), make(2, "b.h5")
    args = VarNetArgs(out_dir=str(tmp_path), num_cascades=1, chans=4,
                      pools=2, sens_chans=4, sens_pools=2, epochs=1,
                      crop=12, amp=False)
    t1 = VarNetTrainer(args, train, val)
    t1.fit(save_resume_every=1)
    assert (Path(tmp_path) / "checkpoints" / "resume_000001").exists()

    args2 = VarNetArgs(**{**args.__dict__, "epochs": 2})
    t2 = VarNetTrainer(args2, train, val)
    r = t2.fit(resume=True, save_resume_every=1)
    assert t2.epoch == 2
    assert [h["epoch"] for h in r["history"]] == [2]

    # a half-written snapshot must be skipped in favor of the intact one
    import shutil
    good = Path(tmp_path) / "checkpoints" / "resume_000002"
    bad = Path(tmp_path) / "checkpoints" / "resume_000003"
    bad.mkdir()
    (bad / "state.msgpack").write_bytes(b"")  # no host.json -> incomplete
    from mri_acl_imagesegmentation_adsp_tpu.train import checkpoint as ck
    assert ck.latest_resume_dir(str(tmp_path)) == str(good)

    # empty datasets + resume=True must refuse rather than clobber ckpts
    t3 = VarNetTrainer(args2, [], [])
    with pytest.raises(ValueError):
        t3.fit(resume=True)


def test_varnet_num_workers_invariance(tmp_path, rng):
    """Prefetched (num_workers>0) training must be bit-identical to the
    synchronous path: the Prefetcher only overlaps loading, never reorders
    the sample stream the optimizer sees."""
    from mri_acl_imagesegmentation_adsp_tpu.data.transforms import VarNetSample
    from mri_acl_imagesegmentation_adsp_tpu.train.varnet_trainer import (
        VarNetArgs, VarNetTrainer)

    def make(n, fname, seed):
        r = np.random.default_rng(seed)
        tg = [np.abs(r.standard_normal((16, 16))).astype(np.float32) + 0.2
              for _ in range(n)]
        mv = float(max(t.max() for t in tg))
        return [VarNetSample(
            r.standard_normal((2, 3, 16, 16, 2)).astype(np.float32),
            tg[s],
            r.standard_normal((2, 3, 16, 16, 2)).astype(np.float32),
            fname, s, mv, (16, 16)) for s in range(n)]

    histories = []
    for workers in (0, 2):
        args = VarNetArgs(out_dir=str(tmp_path / f"w{workers}"),
                          num_cascades=1, chans=4, pools=2, sens_chans=4,
                          sens_pools=2, epochs=1, crop=12, amp=False,
                          num_workers=workers)
        t = VarNetTrainer(args, make(5, "a.h5", 0), make(2, "b.h5", 1))
        histories.append(t.fit()["history"])
    assert histories[0] == histories[1]


def test_epoch_scan_unroll_invariance(rng):
    """scan_unroll replicates the step body for XLA overlap; the epoch's
    per-step losses must match the rolled scan (same RNG stream, same
    gathers, same optimizer states). Tolerance, not bit-equality: the
    unrolled body fuses across step boundaries, so f32 reductions
    reassociate (measured ~1e-4 relative by step 3 on CPU)."""
    import jax
    import jax.numpy as jnp
    from mri_acl_imagesegmentation_adsp_tpu.data.hbm_loader import (
        SliceStore, epoch_permutation)
    from mri_acl_imagesegmentation_adsp_tpu.models import build_unet
    from mri_acl_imagesegmentation_adsp_tpu.train.engine import (
        Engine, make_optimizer)
    from mri_acl_imagesegmentation_adsp_tpu.train.losses import LossManager

    n, h, w = 12, 32, 32
    imgs = rng.standard_normal((n, h, w)).astype(np.float32)
    msks = (imgs > 0).astype(np.int32)
    store = SliceStore(images=imgs, masks=msks,
                       vol_starts=np.asarray([0]),
                       vol_sizes=np.asarray([n]),
                       files=["x"]).to_device(k=1)
    model = build_unet("unet", "resnet18", "none", in_ch=1, classes=1,
                       dtype=jnp.float32)
    loss = LossManager(classes=1, name="dice_bce")

    losses = []
    for unroll in (1, 3):  # 3 does not divide the 3-step epoch: remainder path
        eng = Engine(model, loss, make_optimizer(1e-3, 1e-4, 5.0),
                     classes=1, aug="light", scan_unroll=unroll)
        st = eng.init_state(jax.random.PRNGKey(0),
                            jnp.zeros((1, h, w, 1), jnp.float32))
        perm = epoch_permutation(jax.random.PRNGKey(1), n, 4)
        st, ls, _ = eng.train_one_epoch(st, store, perm,
                                        jax.random.PRNGKey(2), dataset_len=n)
        losses.append(np.asarray(ls))
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-3)


def test_accum_steps_trainer_end_to_end(packs, tmp_path):
    """--accum-steps=2: microbatch losses land in the history (CSV step
    parity), the ragged tail is dropped like drop_last, and the run
    produces the standard artifacts."""
    import json
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
        UNet2DArgs, UNet2DTrainer)

    out = tmp_path / "run_accum"
    args = UNet2DArgs(train_list=packs, val_list=packs, out_dir=str(out),
                      encoder="resnet18", epochs=2, batch_size=4,
                      accum_steps=2, aug="none", logger="csv", seed=7)
    UNet2DTrainer(args).run()

    summary = json.loads((out / "summary.json").read_text())
    assert summary["best"]["val_dice"] > 0
    # 18 slices, batch 4 -> 4 full batches; accum 2 trims to 4 microbatches
    # = 2 optimizer updates per epoch
    import csv as _csv
    with (out / "history_step.csv").open() as f:
        steps = list(_csv.DictReader(f))
    assert len(steps) == 2 * 4  # epochs x kept microbatches
    assert json.loads((out / "args.json").read_text())["accum_steps"] == 2


def test_orbax_resume_matches_msgpack_resume(packs, tmp_path):
    """--ckpt-backend orbax: a run interrupted after epoch 1 and resumed to
    epoch 2 ends bit-identical to the same interruption/resume through the
    default msgpack backend (training is deterministic at fixed seed, so
    any divergence is a snapshot-fidelity bug)."""
    import jax
    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
        UNet2DArgs, UNet2DTrainer)

    finals = {}
    for backend in ("msgpack", "orbax"):
        out = tmp_path / f"run_{backend}"
        base = dict(train_list=packs, val_list=packs, out_dir=str(out),
                    encoder="resnet18", batch_size=4, aug="none",
                    logger="noop", seed=11, ckpt_backend=backend,
                    save_resume_every=1)
        UNet2DTrainer(UNet2DArgs(epochs=1, **base)).run()
        t2 = UNet2DTrainer(UNet2DArgs(epochs=2, resume=True, **base))
        assert t2.start_epoch == 2
        result = t2.run()
        assert result["history"][-1]["epoch"] == 2
        finals[backend] = jax.device_get(t2.state)

    for a, b in zip(jax.tree.leaves(finals["msgpack"]),
                    jax.tree.leaves(finals["orbax"])):
        import numpy as _np
        assert _np.array_equal(_np.asarray(a), _np.asarray(b))
