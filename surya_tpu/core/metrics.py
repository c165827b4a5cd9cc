"""On-device classification metrics + structured JSONL metric logging.

Replaces the reference's sklearn-on-host evaluation (``comparative
analysis/analysis.py:6-11,81-96``: accuracy, weighted P/R/F1, confusion
matrix) with pure-jnp math that runs inside the jitted eval step, and its
print/matplotlib observability (§5.5) with JSONL records.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO

import jax.numpy as jnp
import numpy as np


def confusion_matrix(labels: jnp.ndarray, preds: jnp.ndarray,
                     num_classes: int) -> jnp.ndarray:
    """(B,), (B,) int → (C, C) counts; rows = true class, cols = predicted.

    Negative entries (the repo's -1 eval-padding sentinel) are dropped —
    jnp's negative-index scatter would otherwise silently wrap them
    into the last class."""
    valid = ((labels >= 0) & (preds >= 0)).astype(jnp.int32)
    cm = jnp.zeros((num_classes, num_classes), dtype=jnp.int32)
    return cm.at[jnp.where(valid, labels, 0),
                 jnp.where(valid, preds, 0)].add(valid)


def accuracy(labels: jnp.ndarray, preds: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((labels == preds).astype(jnp.float32))


def precision_recall_f1(cm: jnp.ndarray, average: str = "weighted"):
    """Per-class or weighted precision/recall/F1 from a confusion matrix.

    Matches sklearn's ``precision_recall_fscore_support(average='weighted')``
    with zero_division=0 semantics.
    """
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    support = cm.sum(axis=1)          # true counts per class
    pred_count = cm.sum(axis=0)       # predicted counts per class
    precision = jnp.where(pred_count > 0, tp / jnp.maximum(pred_count, 1), 0.0)
    recall = jnp.where(support > 0, tp / jnp.maximum(support, 1), 0.0)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)
    if average == "none":
        return precision, recall, f1
    if average == "macro":
        return precision.mean(), recall.mean(), f1.mean()
    if average == "weighted":
        w = support / jnp.maximum(support.sum(), 1)
        return (precision * w).sum(), (recall * w).sum(), (f1 * w).sum()
    raise ValueError(f"unknown average {average!r}")


def r2_score(labels: jnp.ndarray, preds: jnp.ndarray) -> jnp.ndarray:
    """R² on class indices — reproduced because ``analysis.py:96`` reports it."""
    labels = labels.astype(jnp.float32)
    preds = preds.astype(jnp.float32)
    ss_res = jnp.sum((labels - preds) ** 2)
    ss_tot = jnp.sum((labels - labels.mean()) ** 2)
    # constant labels: sklearn returns 1.0 for a perfect fit, 0.0
    # otherwise (not -ss_res/eps)
    return jnp.where(ss_tot > 0, 1.0 - ss_res / jnp.maximum(ss_tot, 1e-12),
                     jnp.where(ss_res > 0, 0.0, 1.0))


class MetricsLogger:
    """Append-only JSONL metric stream (one dict per record).

    ``tensorboard_dir`` additionally mirrors scalar fields as
    TensorBoard summaries (SURVEY §5.5 "JSONL + optional TensorBoard
    scalars"): epoch records land under ``train/``, ``val/`` etc. with
    the epoch as global step; mid-epoch ``step`` records under
    ``step/``. tensorboardX is a gated import — absent, the option is
    ignored with a warning.
    """

    def __init__(self, path: str | None = None, echo: bool = True,
                 tensorboard_dir: str | None = None):
        self.path = path
        self.echo = echo
        self._fh: IO | None = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._tb = None
        if tensorboard_dir:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(tensorboard_dir)
            except ImportError:  # pragma: no cover
                print("[metrics] tensorboardX not available; "
                      "--tensorboard ignored", flush=True)

    def log(self, record: dict) -> None:
        record = {"ts": round(time.time(), 3), **_to_py(record)}
        line = json.dumps(record)
        if self._fh:
            self._fh.write(line + "\n")
        if self._tb is not None:
            self._log_tb(record)
        if self.echo:
            kv = " ".join(f"{k}={_fmt(v)}" for k, v in record.items()
                          if k != "ts")
            print(kv, flush=True)

    def _log_tb(self, record: dict) -> None:
        is_step = "step" in record and "epoch" in record
        step = int(record.get("step", record.get("epoch", 0)))
        for k, v in record.items():
            if k in ("ts", "step", "epoch", "event") or not isinstance(
                    v, (int, float)):
                continue
            if is_step:
                tag = f"step/{k}"
            elif "_" in k and k.split("_", 1)[0] in ("train", "val",
                                                     "test"):
                tag = k.replace("_", "/", 1)
            else:
                tag = k
            self._tb.add_scalar(tag, float(v), step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None


def _to_py(tree):
    if isinstance(tree, dict):
        return {k: _to_py(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_py(v) for v in tree]
    if isinstance(tree, (jnp.ndarray, np.ndarray)):
        if tree.ndim == 0:
            return float(tree)
        return np.asarray(tree).tolist()
    if isinstance(tree, (np.floating, np.integer)):
        return float(tree)
    return tree


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4f}"
    return v
