"""Step-indexed MID-epoch resume (SURVEY.md §5.3 rebuild spec).

The reference cannot resume at all (SURVEY.md §5.4 — no optimizer state is
ever saved). This framework's epoch-granular resume landed in round 2; these
tests pin the round-4 step-indexed upgrade: snapshots every N steps INSIDE
an epoch, with kill-at-step-k-then-resume bit-identical (CPU) to an
uninterrupted run.

Three invariants:
  1. chunked == whole-epoch: running the epoch through the chunked
     (save_resume_steps) path produces bit-identical final params to the
     one-scan dispatch (threefry key-split prefix consistency + shared
     jitted body).
  2. kill + resume == uninterrupted: abort training right after a mid-epoch
     snapshot, construct a fresh trainer with resume=True, finish; final
     params/history match the uninterrupted run bit-level.
  3. the data-iterator state is honored: the resumed run consumes exactly
     the remaining permutation rows (history_step.csv row count matches).
"""
import json
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import jax

from oracles import synthetic_kspace_volume, write_fake_fastmri_h5

from mri_acl_imagesegmentation_adsp_tpu.data.adapters import (
    FastMRISinglecoilAdapter,
)
from mri_acl_imagesegmentation_adsp_tpu.data.packer import build_preprocess
from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
    UNet2DArgs, UNet2DTrainer,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def artifact_lists(tmp_path_factory):
    rng = np.random.default_rng(11)
    tmp = tmp_path_factory.mktemp("midresume")
    root = tmp / "raw"
    root.mkdir()
    for i in range(3):
        ksp, _ = synthetic_kspace_volume(rng, s=6, h=48, w=48)
        write_fake_fastmri_h5(str(root / f"vol{i}.h5"), ksp)
    out = tmp / "artifacts"
    args = SimpleNamespace(root_dir=str(root), out_dir=str(out), height=48,
                           width=48, slice_keep="0.0,1.0", clip="1.0,99.5",
                           use_n4=False, use_denoise=False, preview_max=1)
    build_preprocess(args, FastMRISinglecoilAdapter(root_dir=str(root)))
    packs = sorted(str(p) for p in out.rglob("volume.npz"))
    train = tmp / "train.txt"
    val = tmp / "val.txt"
    train.write_text("\n".join(packs[:2]))
    val.write_text("\n".join(packs[2:]))
    return tmp, str(train), str(val)


def _args(tmp, train, val, out_name, **kw):
    defaults = dict(
        train_list=train, val_list=val, out_dir=str(Path(tmp) / out_name),
        k=1, aug="light", model="unet", encoder="resnet18",
        encoder_weights="none", classes=1, batch_size=4, epochs=2,
        lr=1e-3, weight_decay=1e-4, loss="dice_bce", amp=False, seed=321,
        logger="csv", save_val_probs=False, max_grad_norm=5.0)
    defaults.update(kw)
    return UNet2DArgs(**defaults)


def _leaves(state):
    return [np.asarray(x) for x in jax.tree.leaves(
        (state.params, state.batch_stats, state.opt_state))]


def _assert_states_equal(a, b):
    la, lb = _leaves(a), _leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(x, y)


class _KillAfterSnapshot(Exception):
    pass


@pytest.mark.nightly   # 129 s; covered transitively by
#   test_kill_mid_epoch_then_resume_bitwise (resume path IS the chunked path)
def test_chunked_epoch_bitwise_equals_whole_epoch(artifact_lists):
    tmp, train, val = artifact_lists
    t_whole = UNet2DTrainer(_args(tmp, train, val, "mr_whole"))
    t_whole.run()
    t_chunk = UNet2DTrainer(
        _args(tmp, train, val, "mr_chunk", save_resume_steps=2))
    t_chunk.run()
    _assert_states_equal(t_whole.state, t_chunk.state)
    assert t_whole.history == t_chunk.history


def test_kill_mid_epoch_then_resume_bitwise(artifact_lists):
    tmp, train, val = artifact_lists
    # uninterrupted oracle
    t_ref = UNet2DTrainer(_args(tmp, train, val, "mr_ref"))
    t_ref.run()

    # interrupted run: abort right after the FIRST mid-epoch snapshot of
    # epoch 2 (i.e. epoch 1 done + 2 steps of epoch 2 committed)
    args_int = _args(tmp, train, val, "mr_int", save_resume_steps=2)
    t_int = UNet2DTrainer(args_int)
    orig = t_int._save_mid_resume
    calls = {"n": 0}

    def killing_save(ep, steps_done, ep_key, aug_key, losses):
        orig(ep, steps_done, ep_key, aug_key, losses)
        if ep == 2:
            calls["n"] += 1
            raise _KillAfterSnapshot()

    t_int._save_mid_resume = killing_save
    with pytest.raises(_KillAfterSnapshot):
        t_int.run()
    assert calls["n"] == 1

    # snapshot naming: mid-epoch-2 snapshot = 1 completed epoch + 2 steps
    snaps = sorted(p.name for p in
                   (Path(args_int.out_dir) / "checkpoints").iterdir())
    assert any(s == "resume_000001_000002" for s in snaps), snaps

    # resume in a FRESH trainer (new process semantics) and finish
    args_res = _args(tmp, train, val, "mr_int", save_resume_steps=2,
                     resume=True)
    t_res = UNet2DTrainer(args_res)
    assert t_res._mid_resume is not None
    assert t_res._mid_resume["epoch"] == 2
    assert t_res._mid_resume["steps_done"] == 2
    t_res.run()

    _assert_states_equal(t_ref.state, t_res.state)
    # history JSON matches the uninterrupted run exactly
    h_ref = json.loads((Path(t_ref.out_dir) / "history.json").read_text())
    h_res = json.loads((Path(t_res.out_dir) / "history.json").read_text())
    assert h_ref == h_res


def test_resumed_run_consumes_only_remaining_rows(artifact_lists):
    """The resumed epoch must re-dispatch only the unconsumed permutation
    rows — measured through the engine's step API call sizes."""
    tmp, train, val = artifact_lists
    args_int = _args(tmp, train, val, "mr_rows", save_resume_steps=1,
                     epochs=1)
    t_int = UNet2DTrainer(args_int)
    orig = t_int._save_mid_resume

    def killing_save(ep, steps_done, ep_key, aug_key, losses):
        orig(ep, steps_done, ep_key, aug_key, losses)
        raise _KillAfterSnapshot()

    t_int._save_mid_resume = killing_save
    with pytest.raises(_KillAfterSnapshot):
        t_int.run()

    args_res = _args(tmp, train, val, "mr_rows", save_resume_steps=1,
                     epochs=1, resume=True)
    t_res = UNet2DTrainer(args_res)
    seen = []
    orig_steps = t_res.engine.train_steps_async

    def spy(state, store, perm, keys):
        seen.append(int(perm.shape[0]))
        return orig_steps(state, store, perm, keys)

    t_res.engine.train_steps_async = spy
    t_res.run()
    # 12 train slices / batch 4 = 3 steps; 1 consumed before the kill
    assert sum(seen) == 2, seen


def test_preempt_request_snapshots_and_resumes_bitwise(artifact_lists):
    """Cooperative preemption (§5.3): request_preempt() mid-epoch makes the
    runner save the step-indexed snapshot at the next chunk boundary and
    return cleanly; a --resume run finishes bit-identically."""
    tmp, train, val = artifact_lists
    t_ref = UNet2DTrainer(_args(tmp, train, val, "pre_ref"))
    t_ref.run()

    args_int = _args(tmp, train, val, "pre_int", save_resume_steps=2)
    t_int = UNet2DTrainer(args_int)
    orig_steps = t_int.engine.train_steps_async
    state = {"fired": False}

    def preempting(st, store, perm, keys):
        out = orig_steps(st, store, perm, keys)
        if not state["fired"]:          # after the FIRST chunk of epoch 1
            state["fired"] = True
            t_int.request_preempt()
        return out

    t_int.engine.train_steps_async = preempting
    result = t_int.run()               # returns (no exception), preempted
    assert result["summary"].get("preempted") is True
    snaps = sorted(p.name for p in
                   (Path(args_int.out_dir) / "checkpoints").iterdir())
    assert "resume_000000_000002" in snaps, snaps

    args_res = _args(tmp, train, val, "pre_int", save_resume_steps=2,
                     resume=True)
    t_res = UNet2DTrainer(args_res)
    assert t_res._mid_resume is not None
    t_res.run()
    _assert_states_equal(t_ref.state, t_res.state)
    h_ref = json.loads((Path(t_ref.out_dir) / "history.json").read_text())
    h_res = json.loads((Path(t_res.out_dir) / "history.json").read_text())
    assert h_ref == h_res


def test_preempt_signal_handler_installs_and_restores():
    """SIGUSR1 under _preempt_signals fires the callback; the previous
    handler is restored on scope exit."""
    import os
    import signal

    from mri_acl_imagesegmentation_adsp_tpu.train.trainer import (
        _preempt_signals,
    )

    seen = {"prev": 0, "cb": 0}

    def prev_handler(*_):
        seen["prev"] += 1

    old = signal.signal(signal.SIGUSR1, prev_handler)
    try:
        with _preempt_signals(True, lambda: seen.__setitem__(
                "cb", seen["cb"] + 1)):
            os.kill(os.getpid(), signal.SIGUSR1)
        assert seen["cb"] == 1 and seen["prev"] == 0
        os.kill(os.getpid(), signal.SIGUSR1)   # restored handler
        assert seen["prev"] == 1 and seen["cb"] == 1
    finally:
        signal.signal(signal.SIGUSR1, old)


def test_async_snapshots_publish_and_resume(artifact_lists):
    """--ckpt-async (orbax): shard writes overlap the next chunk; the
    deferred publish still yields resumable snapshots. One run with
    mid-epoch async snapshots must leave exactly resume_keep published
    snapshot dirs, the newest of which restores bit-identically to the
    trainer's final state at that snapshot point."""
    from mri_acl_imagesegmentation_adsp_tpu.train import (
        checkpoint as ckpt_lib)

    tmp, train, val = artifact_lists
    # 3 steps/epoch (12 train slices, batch 4), chunk 2 -> one async
    # MID-epoch snapshot at step 2, plus an async EPOCH-end snapshot (the
    # newest, taken after validation so it equals the final state)
    args = _args(tmp, train, val, "mr_async", epochs=1, save_resume_steps=2,
                 save_resume_every=1, ckpt_backend="orbax", ckpt_async=True,
                 resume_keep=2)
    t = UNet2DTrainer(args)
    t.run()
    assert t._pending_ckpt is None  # everything published by run()'s finally

    root = Path(args.out_dir) / "checkpoints"
    snaps = sorted(p.name for p in root.iterdir())
    assert snaps == ["resume_000000_000002", "resume_000001"]

    # the newest snapshot restores into a FRESH trainer bit-identically
    args_res = _args(tmp, train, val, "mr_async", epochs=1,
                     save_resume_steps=2, save_resume_every=1,
                     ckpt_backend="orbax", ckpt_async=True, resume_keep=2,
                     resume=True)
    t2 = UNet2DTrainer(args_res)
    _assert_states_equal(t.state, t2.state)

    # misconfiguration is rejected up front
    with pytest.raises(ValueError, match="orbax"):
        UNet2DTrainer(_args(tmp, train, val, "mr_async_bad",
                            ckpt_async=True))
