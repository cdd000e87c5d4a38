"""Checkpoint backends: msgpack (default) and orbax resume snapshots.

The orbax backend exists for sharded state — it saves jax.Array leaves
per-shard (no host gather) and restores INTO the target's shardings — while
the msgpack path stays the single-host default. Formats are auto-detected
on load, so the two must be interchangeable snapshot-to-snapshot.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mri_acl_imagesegmentation_adsp_tpu.train import checkpoint as ckpt


def _state():
    """A realistic TrainState: nested params (mixed dtypes) + optax state."""
    import optax
    from mri_acl_imagesegmentation_adsp_tpu.train.engine import (
        TrainState, make_optimizer)

    params = {"conv": {"kernel": jnp.arange(12, dtype=jnp.float32)
                       .reshape(3, 4),
                       "bias": jnp.ones((4,), jnp.bfloat16)}}
    opt = make_optimizer(1e-3, 1e-4, 5.0)
    return TrainState(params=params,
                      batch_stats={"bn": {"mean": jnp.zeros((4,))}},
                      opt_state=opt.init(params),
                      step=jnp.int32(7))


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.asarray(x).dtype == np.asarray(y).dtype
        assert np.array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_roundtrip_exact(tmp_path, backend):
    state = _state()
    d = str(tmp_path / "snap")
    ckpt.save_train_state(d, state, {"epoch_next": 3}, backend=backend)
    target = jax.tree.map(jnp.zeros_like, state)
    restored, host = ckpt.load_train_state(d, target)
    _assert_tree_equal(state, restored)
    assert host == {"epoch_next": 3}


def test_orbax_sharded_save_restores_into_target_sharding(tmp_path):
    """Sharded params survive the roundtrip with values AND sharding
    intact (the reason the backend exists)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sh = NamedSharding(mesh, P("data"))
    w = jax.device_put(np.arange(32, dtype=np.float32).reshape(16, 2), sh)
    state = {"w": w, "step": jnp.int32(5)}

    d = str(tmp_path / "snap")
    ckpt.save_train_state(d, state, {"epoch": 1}, backend="orbax")
    restored, _ = ckpt.load_train_state(d, state)
    assert np.array_equal(np.asarray(restored["w"]), np.asarray(w))
    assert restored["w"].sharding == sh


def test_latest_resume_dir_mixed_formats(tmp_path):
    """Newest snapshot wins regardless of backend; incomplete orbax dirs
    (state without host.json) are skipped like half-written msgpack ones."""
    state = _state()
    out = str(tmp_path / "run")
    ckpt.save_resume(out, 1, state, {"epoch": 1})                   # msgpack
    ckpt.save_resume(out, 2, state, {"epoch": 2}, backend="orbax")  # orbax
    picked = ckpt.latest_resume_dir(out)
    assert picked.endswith("resume_000002")
    # auto-detection loads the orbax one without being told the format
    _, host = ckpt.load_train_state(picked, jax.tree.map(jnp.zeros_like,
                                                         state))
    assert host["epoch"] == 2

    # incomplete: orbax state dir present but host.json missing
    bad = os.path.join(out, "checkpoints", "resume_000009")
    os.makedirs(os.path.join(bad, "state.orbax"))
    assert ckpt.latest_resume_dir(out).endswith("resume_000002")


def test_unknown_backend_rejected(tmp_path):
    with pytest.raises(ValueError, match="backend"):
        ckpt.save_train_state(str(tmp_path / "x"), _state(), {},
                              backend="pickle")


def test_resume_keep_prunes_oldest(tmp_path):
    """keep=N bounds on-disk snapshots: only the newest N complete dirs
    survive (mid-epoch names sort between their epoch boundaries), stale
    *.tmp dirs from crashed saves are swept, and keep=0 keeps all."""
    state = _state()
    out = str(tmp_path / "run")

    # keep=0 (default): everything accumulates
    for ep in range(3):
        ckpt.save_resume(out, ep, state, {"epoch": ep})
    root = os.path.join(out, "checkpoints")
    assert len(os.listdir(root)) == 3

    # a crashed save's leftover tmp dir (aged past the in-flight grace
    # window) and a fresh one (possible concurrent in-flight flush)
    stale = os.path.join(root, "resume_000099.tmp")
    os.makedirs(stale)
    os.utime(stale, (0, 0))
    fresh = os.path.join(root, "resume_000098.tmp")
    os.makedirs(fresh)

    # keep=2: epoch 3 + a mid-epoch snapshot (3 done, 40 steps into 4)
    ckpt.save_resume(out, 3, state, {"epoch": 3}, keep=2)
    ckpt.save_resume(out, 3, state, {"epoch": 3, "mid": True}, step=40,
                     keep=2)
    left = sorted(os.listdir(root))
    # stale tmp swept; fresh tmp spared by the mtime grace guard
    assert left == ["resume_000003", "resume_000003_000040",
                    "resume_000098.tmp"]
    # the survivor picked for resume is the mid-epoch one (newest)
    assert ckpt.latest_resume_dir(out).endswith("resume_000003_000040")
    # survivors still load
    _, host = ckpt.load_train_state(ckpt.latest_resume_dir(out),
                                    jax.tree.map(jnp.zeros_like, state))
    assert host.get("mid") is True


def test_async_save_publish_and_resume(tmp_path):
    """Async snapshot: invisible to latest_resume_dir until finalize();
    the saved values are the enqueue-time ones even if the caller rebinds
    its state right after save() returns (orbax copies device->host before
    returning); finalize publishes + prunes."""
    state = _state()
    out = str(tmp_path / "run")
    ckpt.save_resume(out, 0, state, {"epoch": 0})            # baseline

    pending = ckpt.save_resume_async(out, 1, state, {"epoch": 1}, keep=1)
    # caller immediately rebinds/mutates its live state
    state2 = jax.tree.map(lambda x: x + 1 if jnp.issubdtype(
        x.dtype, jnp.integer) or jnp.issubdtype(x.dtype, jnp.floating)
        else x, state)
    del state2
    # not yet visible for resume
    assert ckpt.latest_resume_dir(out).endswith("resume_000000")

    path = pending.finalize()
    assert path.endswith("resume_000001")
    assert ckpt.latest_resume_dir(out) == path
    restored, host = ckpt.load_train_state(
        path, jax.tree.map(jnp.zeros_like, state))
    assert host["epoch"] == 1
    _assert_tree_equal(restored, state)
    # keep=1 pruned the baseline at finalize time
    assert sorted(os.listdir(os.path.join(out, "checkpoints"))) == [
        "resume_000001"]
    # finalize is idempotent
    assert pending.finalize() == path
