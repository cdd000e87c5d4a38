"""Training loggers: protocol + CSV / NoOp adapters.

Parity targets:
  - TrainLogger protocol : reference src/train/log_iface.py:5-29
  - NoOpLogger, CSVLoggerAdapter (history_epoch.csv 7 cols,
    history_step.csv 4 cols, metrics.json) : reference src/train/log_adapter.py
"""

from __future__ import annotations

import csv
import json
import os
from typing import Any, Dict, Protocol


class TrainLogger(Protocol):
    def log_step(self, *, global_step: int, epoch: int, lr: float,
                 loss: float) -> None: ...
    def log_epoch(self, *, epoch: int, time_s: float, train_loss: float,
                  val_loss: float, val_dice: float, val_iou: float,
                  lr: float) -> None: ...
    def log_best(self, *, epoch: int, key: float, ckpt_path: str) -> None: ...
    def log_meta(self, meta: Dict[str, Any]) -> None: ...
    def close(self) -> None: ...


class NoOpLogger:
    def log_step(self, **kw): pass
    def log_epoch(self, **kw): pass
    def log_best(self, **kw): pass
    def log_meta(self, meta): pass
    def close(self): pass


class CSVLoggerAdapter:
    """CSV logger with the reference's exact files/columns.

    Per-step rows are written in one buffered append per epoch via
    ``log_steps`` (the jitted epoch returns all step losses at once); the
    per-row ``log_step`` API is kept for drop-in compatibility.
    """

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.ep = os.path.join(out_dir, "history_epoch.csv")
        self.st = os.path.join(out_dir, "history_step.csv")
        if not os.path.exists(self.ep):
            with open(self.ep, "w", newline="") as f:
                csv.writer(f).writerow(
                    ["epoch", "time_s", "train_loss", "val_loss",
                     "val_dice", "val_iou", "lr"])
        if not os.path.exists(self.st):
            with open(self.st, "w", newline="") as f:
                csv.writer(f).writerow(
                    ["global_step", "epoch", "lr", "train_loss_step"])
        self.meta = os.path.join(out_dir, "metrics.json")

    def log_step(self, *, global_step: int, epoch: int, lr: float,
                 loss: float) -> None:
        with open(self.st, "a", newline="") as f:
            csv.writer(f).writerow([global_step, epoch, lr, loss])

    def log_steps(self, *, start_step: int, epoch: int, lr: float,
                  losses) -> None:
        with open(self.st, "a", newline="") as f:
            w = csv.writer(f)
            for i, loss in enumerate(losses):
                w.writerow([start_step + i, epoch, lr, float(loss)])

    def log_epoch(self, **row) -> None:
        with open(self.ep, "a", newline="") as f:
            csv.writer(f).writerow(
                [row["epoch"], round(row["time_s"], 2), row["train_loss"],
                 row["val_loss"], row["val_dice"], row["val_iou"], row["lr"]])

    def log_best(self, **kw): pass

    def log_meta(self, meta):
        with open(self.meta, "w", encoding="utf-8") as f:
            json.dump(meta, f, indent=2)

    def close(self): pass


def make_logger(kind: str, out_dir: str):
    """reference train_unet.py:29-30."""
    return CSVLoggerAdapter(out_dir) if kind == "csv" else NoOpLogger()
