"""Checkpointing: best-model bundles + full resumable training state.

Parity + upgrade over the reference:
  - best bundle {"model": ..., "args": ...} -> best.ckpt
    (reference train_unet.py:224-227 saved {"model": state_dict, "args"})
  - NEW: full resume (params + batch_stats + optimizer state + scheduler +
    epoch/history/RNG). The reference cannot resume (SURVEY.md §5.4 — it
    never saves optimizer state); this framework can.

Two resume backends, auto-detected on load:
  - "msgpack" (default): flax msgpack — pure-pytree, one file, zero extra
    machinery. It gathers the state to host (`jax.device_get`) first, so it
    is the right tool single-host but the wrong one for sharded state.
  - "orbax": orbax.checkpoint StandardCheckpointHandler — saves sharded
    ``jax.Array`` leaves shard-by-shard (no host gather, multi-host-safe
    under `jax.distributed`) and restores INTO the target's shardings, so a
    mesh-sharded trainer resumes without a replicate/reshard round-trip.

Host-side state (epoch counter, history, scheduler state machine, numpy
RNG key) rides in a JSON sidecar either way, and both backends share the
same write-to-tmp-then-rename atomicity protocol, so `latest_resume_dir`
never sees a half-written snapshot.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
from flax import serialization

# prune_resume_dirs skips *.tmp dirs younger than this (possible in-flight
# async snapshot from a concurrent writer); see its docstring invariant.
_TMP_GRACE_S = 300.0


def save_best(path: str, params, batch_stats, args_dict: Dict[str, Any]) -> None:
    """Best-checkpoint bundle (model only + the exact run config)."""
    bundle = {"model": {"params": params, "batch_stats": batch_stats}}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(bundle))
    with open(path + ".args.json", "w", encoding="utf-8") as f:
        json.dump(args_dict, f, indent=2)


def load_best(path: str, target_params, target_batch_stats) -> Tuple[Any, Any]:
    """Restore a best bundle into the given target structures."""
    bundle = {"model": {"params": target_params,
                        "batch_stats": target_batch_stats}}
    with open(path, "rb") as f:
        restored = serialization.from_bytes(bundle, f.read())
    return restored["model"]["params"], restored["model"]["batch_stats"]


def _orbax_checkpointer():
    import orbax.checkpoint as ocp
    # StandardCheckpointer is the supported convenience wrapper around
    # StandardCheckpointHandler (the legacy Checkpointer(handler) spelling
    # is deprecated for removal in orbax v1.x).
    return ocp, ocp.StandardCheckpointer()


def _is_primary() -> bool:
    return jax.process_index() == 0


def _multihost_sync(name: str) -> None:
    """Barrier across hosts (no-op single-host). Used to order the
    primary-only filesystem protocol around orbax's collective save."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def save_train_state(dirpath: str, state, host_state: Dict[str, Any],
                     backend: str = "msgpack") -> None:
    """Full resumable snapshot: device pytree + host JSON.

    Atomic: written into a sibling tmp dir then renamed, so a crash
    mid-snapshot never leaves a half-written resume dir for
    latest_resume_dir to pick up.

    backend "orbax" writes the pytree via orbax's StandardCheckpointHandler
    (sharded leaves saved per-shard, no host gather); "msgpack" (default)
    gathers to host and writes one flax msgpack file.
    """
    if backend not in ("msgpack", "orbax"):
        raise ValueError(f"unknown checkpoint backend {backend!r} "
                         "(expected 'msgpack' or 'orbax')")
    tmp = dirpath + ".tmp"
    # Filesystem protocol (tmp setup, host.json, swap-in rename) runs on
    # process 0 ONLY; on a shared filesystem N uncoordinated hosts would
    # race the rmtree/os.replace (a second replace fails after the first
    # consumed tmp, and an rmtree can delete another host's in-flight
    # shard writes). Only the inner orbax save itself is collective.
    if _is_primary():
        if os.path.isdir(tmp):
            import shutil
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
    if backend == "orbax":
        # all hosts must see the (re)created tmp dir before the collective
        # per-shard writes start
        _multihost_sync("ckpt:tmp-ready")
        _, ckptr = _orbax_checkpointer()
        ckptr.save(os.path.abspath(os.path.join(tmp, "state.orbax")), state)
        # StandardCheckpointer is an AsyncCheckpointer: block until every
        # shard write has committed before the primary renames the dir
        ckptr.wait_until_finished()
        _multihost_sync("ckpt:save-done")
    elif _is_primary():
        # msgpack gathers to host memory — single-writer by construction
        with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(state)))
    if _is_primary():
        with open(os.path.join(tmp, "host.json"), "w", encoding="utf-8") as f:
            json.dump(host_state, f, indent=2)
        if os.path.isdir(dirpath):
            import shutil
            shutil.rmtree(dirpath)
        os.replace(tmp, dirpath)
    # no host may return (and e.g. start the next epoch's snapshot) while
    # the primary is still swapping the snapshot in
    _multihost_sync("ckpt:published")


class PendingSnapshot:
    """Handle for an in-flight ASYNC snapshot (orbax backend).

    ``save_train_state_async`` returns one after orbax's synchronous
    device->host copy; the shard WRITES continue in the background while
    training proceeds. ``finalize()`` blocks until every shard has
    committed, then runs the same publish protocol as the blocking path
    (host.json is already in the tmp dir; primary renames tmp -> final,
    prunes if asked). Until finalize, latest_resume_dir cannot see the
    snapshot — the tmp suffix keeps half-flushed state unreachable, so a
    crash mid-flush falls back to the previous snapshot exactly like a
    crash mid-blocking-save.
    """

    def __init__(self, ckptr, tmp: str, dirpath: str,
                 out_dir: Optional[str] = None, keep: int = 0):
        self._ckptr = ckptr
        self._tmp = tmp
        self._dirpath = dirpath
        self._out_dir = out_dir
        self._keep = keep
        self._done = False

    def finalize(self) -> str:
        if self._done:
            return self._dirpath
        self._ckptr.wait_until_finished()
        _multihost_sync("ckpt:async-save-done")
        if _is_primary():
            if os.path.isdir(self._dirpath):
                import shutil
                shutil.rmtree(self._dirpath)
            os.replace(self._tmp, self._dirpath)
        _multihost_sync("ckpt:async-published")
        try:
            self._ckptr.close()
        except Exception:
            pass
        self._done = True
        if self._keep > 0 and self._out_dir:
            prune_resume_dirs(self._out_dir, self._keep)
        return self._dirpath


def save_train_state_async(dirpath: str, state,
                           host_state: Dict[str, Any],
                           out_dir: Optional[str] = None,
                           keep: int = 0) -> PendingSnapshot:
    """Non-blocking snapshot (orbax only): enqueue and return.

    orbax's AsyncCheckpointer copies device arrays to host BEFORE
    returning from save(), so the caller may immediately rebind/donate the
    live training state; only the disk writes overlap the next steps. The
    caller must finalize() before starting another snapshot of the same
    run and before relying on the snapshot for resume.

    ``out_dir``/``keep`` are forwarded to the PendingSnapshot so its
    finalize() prunes old resume snapshots after publishing this one.
    """
    tmp = dirpath + ".tmp"
    if _is_primary():
        if os.path.isdir(tmp):
            import shutil
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        # host state is plain JSON — write it up front so finalize is just
        # wait + rename
        with open(os.path.join(tmp, "host.json"), "w", encoding="utf-8") as f:
            json.dump(host_state, f, indent=2)
    _multihost_sync("ckpt:async-tmp-ready")
    _, ckptr = _orbax_checkpointer()
    ckptr.save(os.path.abspath(os.path.join(tmp, "state.orbax")), state)
    return PendingSnapshot(ckptr, tmp, dirpath, out_dir=out_dir, keep=keep)


def save_resume_async(out_dir: str, epoch: int, state,
                      host_state: Dict[str, Any],
                      step: Optional[int] = None,
                      keep: int = 0) -> PendingSnapshot:
    """Async variant of save_resume (same naming contract). Pruning runs
    at finalize time, after the new snapshot is published."""
    name = f"resume_{epoch:06d}" if step is None else \
        f"resume_{epoch:06d}_{step:06d}"
    d = os.path.join(out_dir, "checkpoints", name)
    return save_train_state_async(d, state, host_state,
                                  out_dir=out_dir, keep=keep)


def save_resume(out_dir: str, epoch: int, state,
                host_state: Dict[str, Any],
                backend: str = "msgpack", step: Optional[int] = None,
                keep: int = 0) -> str:
    """Owns the checkpoints/resume_%06d[_%06d] naming convention (paired
    with latest_resume_dir); used by every trainer.

    ``step`` marks a MID-epoch snapshot: ``epoch`` is then the number of
    fully completed epochs (so ``resume_000004_000300`` = epoch 4 done +
    300 steps into epoch 5) — the tuple sort in latest_resume_dir then
    orders (4,) < (4,300) < (5,) chronologically.

    ``keep`` > 0 bounds on-disk snapshot count: after the new snapshot is
    PUBLISHED, all but the newest ``keep`` complete snapshots (and any
    stale ``*.tmp`` from crashed saves) are deleted. 0 keeps everything.
    A long run with --save-resume-steps otherwise accumulates one full
    (params + optimizer) snapshot per interval, unbounded."""
    name = f"resume_{epoch:06d}" if step is None else \
        f"resume_{epoch:06d}_{step:06d}"
    d = os.path.join(out_dir, "checkpoints", name)
    save_train_state(d, state, host_state, backend=backend)
    if keep > 0:
        prune_resume_dirs(out_dir, keep)
    return d


def prune_resume_dirs(out_dir: str, keep: int) -> None:
    """Delete all but the newest ``keep`` COMPLETE resume snapshots, plus
    stale ``*.tmp`` dirs left by crashed saves.

    Ordered AFTER the new snapshot's publish rename (see save_resume), so a
    crash mid-prune can only lose OLD snapshots — latest_resume_dir still
    finds the newest one. Primary-process-only: on a shared filesystem the
    non-primary hosts must not race the rmtrees (same protocol as
    save_train_state); a barrier afterwards keeps hosts in step.

    INVARIANT (tmp deletion safety): every trainer finalizes its single
    pending async snapshot (PendingSnapshot.finalize → publish rename)
    BEFORE any code path can reach a prune, so a ``*.tmp`` dir observed
    here belongs to a crashed save, never an in-flight one. As a cheap
    belt-and-braces guard for future callers (or two processes sharing
    out_dir), tmp dirs touched within the last ``_TMP_GRACE_S`` seconds
    are skipped rather than deleted."""
    root = os.path.join(out_dir, "checkpoints")
    if keep <= 0 or not os.path.isdir(root):
        return
    if _is_primary():
        import shutil
        complete = []
        for dname in sorted(os.listdir(root)):
            if not dname.startswith("resume_"):
                continue
            full = os.path.join(root, dname)
            if dname.endswith(".tmp"):
                # stale by the invariant above — but skip recently-touched
                # tmp dirs in case a concurrent writer is mid-flush
                try:
                    recent = (time.time() - os.path.getmtime(full)
                              < _TMP_GRACE_S)
                except OSError:
                    recent = False
                if not recent:
                    shutil.rmtree(full, ignore_errors=True)
                continue
            has_state = (os.path.isfile(os.path.join(full, "state.msgpack"))
                         or os.path.isdir(os.path.join(full, "state.orbax")))
            if has_state and os.path.isfile(os.path.join(full, "host.json")):
                complete.append(dname)
        complete.sort(key=lambda d: tuple(int(p) for p in d.split("_")[1:]))
        for dname in complete[:-keep]:
            shutil.rmtree(os.path.join(root, dname), ignore_errors=True)
    _multihost_sync("ckpt:pruned")


def load_train_state(dirpath: str, target_state) -> Tuple[Any, Dict[str, Any]]:
    """Restore a resume snapshot into the target structure.

    The on-disk format is auto-detected, so a run may flip --ckpt-backend
    between snapshots and still resume. An orbax snapshot restores each
    leaf INTO the target leaf's sharding (resharding on load if the mesh
    changed); msgpack restores host arrays that the trainer's next jitted
    step re-places onto devices.
    """
    orbax_dir = os.path.join(dirpath, "state.orbax")
    if os.path.isdir(orbax_dir):
        ocp, ckptr = _orbax_checkpointer()
        state = ckptr.restore(os.path.abspath(orbax_dir), target_state)
    else:
        with open(os.path.join(dirpath, "state.msgpack"), "rb") as f:
            state = serialization.from_bytes(target_state, f.read())
    with open(os.path.join(dirpath, "host.json"), "r", encoding="utf-8") as f:
        host_state = json.load(f)
    return state, host_state


def latest_resume_dir(out_dir: str) -> Optional[str]:
    """Newest COMPLETE resume snapshot under out_dir/checkpoints
    (vendored-style auto-resume, zip!train_varnet_prostate.py:160-164).
    Incomplete dirs (missing members, or *.tmp from a crashed save) are
    skipped so a mid-snapshot crash falls back to the previous one."""
    root = os.path.join(out_dir, "checkpoints")
    if not os.path.isdir(root):
        return None
    cands = []
    for d in os.listdir(root):
        if not d.startswith("resume_") or d.endswith(".tmp"):
            continue
        full = os.path.join(root, d)
        has_state = (os.path.isfile(os.path.join(full, "state.msgpack"))
                     or os.path.isdir(os.path.join(full, "state.orbax")))
        if has_state and os.path.isfile(os.path.join(full, "host.json")):
            cands.append(d)
    if not cands:
        return None
    # tuple sort: (epochs_done,) < (epochs_done, step) < (epochs_done+1,)
    # — an epoch-boundary snapshot outranks any mid-epoch one of the SAME
    # completed-epoch count only if it has more completed epochs; see
    # save_resume's naming contract.
    cands.sort(key=lambda d: tuple(int(p) for p in d.split("_")[1:]))
    return os.path.join(root, cands[-1])
