"""Checkpointing: best-model bundles + full resumable training state.

Parity + upgrade over the reference:
  - best bundle {"model": ..., "args": ...} -> best.ckpt
    (reference train_unet.py:224-227 saved {"model": state_dict, "args"})
  - NEW: full resume (params + batch_stats + optimizer state + scheduler +
    epoch/history/RNG). The reference cannot resume (SURVEY.md §5.4 — it
    never saves optimizer state); this framework can.

Serialization is flax msgpack (pure-pytree, single file, no async I/O
machinery needed at these sizes). Host-side state (epoch counter, history,
scheduler state machine, numpy RNG key) rides in a JSON sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
from flax import serialization


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


def save_train_state(dirpath: str, state, host_state: Dict[str, Any]) -> None:
    """Full resumable snapshot: device pytree + host JSON.

    Atomic: written into a sibling tmp dir then renamed, so a crash
    mid-snapshot never leaves a half-written resume dir for
    latest_resume_dir to pick up.
    """
    tmp = dirpath + ".tmp"
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    with open(os.path.join(tmp, "host.json"), "w", encoding="utf-8") as f:
        json.dump(host_state, f, indent=2)
    if os.path.isdir(dirpath):
        import shutil
        shutil.rmtree(dirpath)
    os.replace(tmp, dirpath)


def save_resume(out_dir: str, epoch: int, state,
                host_state: Dict[str, Any]) -> str:
    """Owns the checkpoints/resume_%06d naming convention (paired with
    latest_resume_dir); used by every trainer."""
    d = os.path.join(out_dir, "checkpoints", f"resume_{epoch:06d}")
    save_train_state(d, state, host_state)
    return d


def load_train_state(dirpath: str, target_state) -> Tuple[Any, Dict[str, Any]]:
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
        if (os.path.isfile(os.path.join(full, "state.msgpack"))
                and os.path.isfile(os.path.join(full, "host.json"))):
            cands.append(d)
    if not cands:
        return None
    cands.sort(key=lambda d: int(d.split("_")[1]))
    return os.path.join(root, cands[-1])
