"""Generic training loop — replaces the reference's nine train scripts.

Capabilities reproduced (SURVEY §2.4, §5.3-5.5): epoch loop with train +
validation phases, early stopping on val loss/accuracy with min_delta
(``3dcnn/train_3D_Quadtree_cnn_model.py:198-211``), ReduceLROnPlateau
(``cnn+lstm/training.py:93``), best-metric checkpointing (§5.4), NaN-loss
step skipping (in the compiled step), per-epoch metric logging (JSONL
instead of print/matplotlib), and final test evaluation with confusion
matrix + weighted P/R/F1.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from surya_tpu.core.checkpoint import CheckpointManager, snapshot
from surya_tpu.core.config import Config
from surya_tpu.core.mesh import create_mesh, replicate, shard_batch
from surya_tpu.core.metrics import MetricsLogger, precision_recall_f1
from surya_tpu.core.prng import PRNG
from surya_tpu.models import get_model
from surya_tpu.train.steps import (
    create_train_state,
    get_learning_rate,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)


class EarlyStopping:
    """Best-metric tracker with patience and min_delta."""

    def __init__(self, metric: str, patience: int, min_delta: float = 0.0):
        self.metric = metric
        self.mode = "min" if "loss" in metric else "max"
        self.patience = patience
        self.min_delta = min_delta
        self.best = np.inf if self.mode == "min" else -np.inf
        self.bad_epochs = 0
        self.best_epoch = -1

    def state_dict(self) -> dict:
        return {"best": float(self.best), "bad_epochs": self.bad_epochs,
                "best_epoch": self.best_epoch}

    def load_state_dict(self, d: dict) -> None:
        self.best = float(d["best"])
        self.bad_epochs = int(d["bad_epochs"])
        self.best_epoch = int(d["best_epoch"])

    def update(self, value: float, epoch: int) -> bool:
        """Returns True if this value is a new best."""
        improved = (value < self.best - self.min_delta
                    if self.mode == "min"
                    else value > self.best + self.min_delta)
        if improved:
            self.best = value
            self.bad_epochs = 0
            self.best_epoch = epoch
            return True
        self.bad_epochs += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.patience > 0 and self.bad_epochs >= self.patience


class Plateau:
    """ReduceLROnPlateau: scale LR by factor after patience bad epochs."""

    def __init__(self, patience: int, factor: float, min_lr: float,
                 mode: str = "min"):
        self.enabled = patience > 0
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.mode = mode
        self.best = np.inf if mode == "min" else -np.inf
        self.bad_epochs = 0

    def state_dict(self) -> dict:
        return {"best": float(self.best), "bad_epochs": self.bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.best = float(d["best"])
        self.bad_epochs = int(d["bad_epochs"])

    def update(self, value: float, current_lr: float) -> float | None:
        """Returns a new LR if it should change, else None."""
        if not self.enabled:
            return None
        improved = (value < self.best if self.mode == "min"
                    else value > self.best)
        if improved:
            self.best = value
            self.bad_epochs = 0
            return None
        self.bad_epochs += 1
        if self.bad_epochs >= self.patience:
            self.bad_epochs = 0
            new_lr = max(current_lr * self.factor, self.min_lr)
            if new_lr < current_lr:
                return new_lr
        return None


def evaluate(eval_step, params, batch_stats, batches: Iterable,
             mesh=None, transform=None) -> dict:
    """Run eval over batches; returns loss/accuracy/P/R/F1/confusion."""
    totals = None
    for batch in batches:
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        if transform is not None:
            batch = transform(batch)
        out = eval_step(params, batch_stats, batch)
        # accumulate ON DEVICE: a per-batch device_get would pay one
        # blocking tunnel RPC per batch (CLAUDE.md: 1-85 s each);
        # jnp.add just enqueues and we fetch once after the loop
        totals = (out if totals is None
                  else jax.tree.map(jnp.add, totals, out))
    if totals is not None:
        totals = jax.tree.map(np.asarray, jax.device_get(totals))
    if totals is None:
        # empty split: zeroed metrics with every key callers index
        return {"loss": float("nan"), "accuracy": 0.0, "precision": 0.0,
                "recall": 0.0, "f1": 0.0, "confusion": None, "count": 0}
    count = max(int(totals["count"]), 1)
    cm = totals["confusion"]
    p, r, f1 = (float(x) for x in precision_recall_f1(cm))
    return {"loss": float(totals["loss_sum"]) / count,
            "accuracy": float(totals["correct"]) / count,
            "precision": p, "recall": r, "f1": f1,
            "confusion": cm, "count": count}


def train_and_evaluate(cfg: Config, data, *, mesh=None,
                       logger: MetricsLogger | None = None,
                       checkpoints: bool = True, resume: bool = False,
                       profile_dir: str | None = None) -> dict:
    """Public wrapper: installs/restores the SIGTERM preemption handler
    around :func:`_train_and_evaluate` so the process-global signal
    disposition is restored even when training raises.
    See the inner function for the full contract.
    """
    preempt = {"flag": False}
    prev_handler = None
    if checkpoints and cfg.train.preempt_save:
        import signal

        def _on_sigterm(signum, frame):
            preempt["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread
            prev_handler = None
    try:
        return _train_and_evaluate(cfg, data, mesh=mesh, logger=logger,
                                   checkpoints=checkpoints,
                                   resume=resume,
                                   profile_dir=profile_dir,
                                   preempt=preempt)
    finally:
        if prev_handler is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_handler)


def _train_and_evaluate(cfg: Config, data, *, mesh=None,
                        logger: MetricsLogger | None = None,
                        checkpoints: bool = True, resume: bool = False,
                        profile_dir: str | None = None,
                        preempt: dict | None = None) -> dict:
    """Train per config on a data source; returns summary + final state.

    ``data`` must provide: ``num_classes``, ``train_batches(epoch_seed)``,
    ``eval_batches(split)`` (splits: 'valid', 'test' — 'test' optional),
    and each batch is (images, features, labels) host arrays.

    ``resume=True`` restores the latest checkpoint in
    ``cfg.train.checkpoint_dir`` — true mid-training resume including
    optimizer state (a capability the reference lacks, SURVEY §5.4).
    ``profile_dir`` wraps the first post-warmup epoch in
    ``jax.profiler.trace`` for TensorBoard (§5.1).

    Preemption safety (``train.preempt_save``, TPU VMs are
    preemptible — SURVEY §5.3): on SIGTERM the loop finishes the
    in-flight step, checkpoints the full state at the current epoch
    together with the exact position inside it (completed host batches
    + data-echo steps), and returns with ``summary["preempted"]=True``.
    A ``resume=True`` rerun re-enters the SAME epoch, fast-forwards the
    deterministic (epoch-seeded) batch stream past the consumed
    batches, and continues — PRNG keys are named by the restored global
    step count, so augmentation/dropout streams pick up exactly where
    they stopped and the preempted run's final weights are
    bit-identical to an uninterrupted run's (pinned by test). The
    fast-forward re-reads (but discards) the consumed batches; with the
    packed memmap cache that replay is ~free. The best-so-far weights
    are re-read from the best epoch's own checkpoint, not the
    preemption snapshot. The resumed epoch's logged train_loss/accuracy
    cover only its post-resume steps.
    """
    mesh = mesh or create_mesh()
    logger = logger or MetricsLogger()
    prng = PRNG(cfg.train.seed)

    model = get_model(cfg.model)
    sample = next(iter(data.train_batches(0)))
    if hasattr(data, "device_transform"):
        sample = data.device_transform("train", prng.named(0, "augment"),
                                       sample)
    with mesh:
        state, tx = create_train_state(model, cfg, prng.named(0, "init"),
                                       sample)
        stopper = EarlyStopping(cfg.train.early_stop_metric,
                                cfg.train.early_stop_patience,
                                cfg.train.early_stop_min_delta)
        # Separate best-tracker for SAVING (checkpoint_metric may differ
        # from the early-stop metric, e.g. stop on val_loss but keep the
        # best-val-accuracy weights).
        saver = EarlyStopping(cfg.train.checkpoint_metric, patience=0)
        plateau = Plateau(cfg.train.plateau_patience,
                          cfg.train.plateau_factor,
                          cfg.train.plateau_min_lr,
                          mode="min" if "loss" in
                          cfg.train.early_stop_metric else "max")

        loop_state_path = os.path.join(cfg.train.checkpoint_dir,
                                       "loop_state.json")
        start_epoch = 0
        step_count = 0
        resume_skip_batches = 0  # fast-forward count for a mid-epoch resume
        resume_skip_echoes = 0
        best_state = None
        if resume and checkpoints:
            mgr = CheckpointManager(cfg.train.checkpoint_dir)
            latest = mgr.latest_step()
            if latest is not None:
                state = mgr.restore(latest, template=snapshot(state))
                start_epoch = latest + 1
                # the restored checkpoint IS the best-so-far
                best_state = snapshot(state)
                # restore loop trackers + global step so the first
                # post-resume epoch doesn't register as a fresh best and
                # PRNG fold-ins don't replay step 0's keys
                if os.path.exists(loop_state_path):
                    with open(loop_state_path) as f:
                        ls = json.load(f)
                    if ls.get("epoch") == latest:
                        stopper.load_state_dict(ls["stopper"])
                        saver.load_state_dict(ls["saver"])
                        plateau.load_state_dict(ls["plateau"])
                        step_count = int(ls["step_count"])
                        if ls.get("preempt"):
                            # the latest checkpoint is a preemption
                            # snapshot, not the best: re-read the best
                            # epoch's own checkpoint if still retained
                            best_ep = int(ls["saver"]["best_epoch"])
                            if best_ep == latest or best_ep < 0:
                                best_state = None
                            elif best_ep in mgr.all_steps():
                                best_state = mgr.restore(
                                    best_ep, template=best_state)
                            else:
                                best_state = None
                            if ls.get("batch_idx") is not None:
                                # mid-epoch snapshot: re-enter the SAME
                                # epoch and fast-forward past the
                                # batches consumed before preemption
                                start_epoch = latest
                                resume_skip_batches = int(ls["batch_idx"])
                                resume_skip_echoes = int(
                                    ls.get("echo_idx", 0))
                logger.log({"event": "resume", "from_epoch": latest,
                            "step_count": step_count})
            mgr.close()
        state = replicate(mesh, state)
        state_shardings = None
        if cfg.train.fsdp:
            from surya_tpu.parallel.zero import apply_fsdp
            state, state_shardings = apply_fsdp(state, mesh)
        elif cfg.train.zero1:
            from surya_tpu.parallel.zero import apply_zero1
            state, state_shardings = apply_zero1(state, mesh)
        train_step = make_train_step(model, tx, cfg, mesh=mesh,
                                     state_shardings=state_shardings)
        eval_step = make_eval_step(model, cfg.model.num_classes,
                                   cfg.train.label_smoothing)

        if checkpoints:
            # metric-aware retention: keep the best-k by the configured
            # checkpoint metric, so forced preempt snapshots can't
            # evict the best epoch's weights
            _mkey = ("val_loss" if "loss" in cfg.train.checkpoint_metric
                     else "val_accuracy")
            ckpt = CheckpointManager(
                cfg.train.checkpoint_dir,
                best_fn=lambda m: m[_mkey],
                best_mode="min" if _mkey == "val_loss" else "max")
        else:
            ckpt = None

        # Preemption notice (SIGTERM on TPU VMs): the wrapper's handler
        # sets preempt["flag"], checked at step boundaries — the
        # in-flight compiled step finishes, then the state is
        # checkpointed and the loop exits cleanly.
        if preempt is None:
            preempt = {"flag": False}

        def _preempt_checkpoint(epoch: int, batch_idx: int | None = None,
                                echo_idx: int = 0) -> None:
            """Snapshot the full current state + loop trackers. With
            ``batch_idx`` (mid-epoch preemption) a resume=True rerun
            re-enters this epoch at exactly that position; without it
            (the epoch finished) resume continues from epoch+1."""
            if ckpt is not None:
                # GC the previous cycle's snapshot (metric-less saves
                # are never auto-pruned) unless it IS the best epoch
                if os.path.exists(loop_state_path):
                    try:
                        with open(loop_state_path) as f:
                            prev = json.load(f)
                        pe = prev.get("epoch")
                        if (prev.get("preempt") and pe is not None
                                and pe != epoch
                                and pe != saver.best_epoch):
                            ckpt.delete(pe)
                    except Exception:
                        pass
                # a previous cycle's snapshot of THIS epoch occupies the
                # same step id (mid-epoch resume preempted again):
                # replace it — it is strictly older state
                if epoch in ckpt.all_steps():
                    ckpt.delete(epoch)
                ckpt.save(epoch, snapshot(state), force=True)
                ls = {"epoch": epoch, "step_count": step_count,
                      "stopper": stopper.state_dict(),
                      "saver": saver.state_dict(),
                      "plateau": plateau.state_dict(),
                      "preempt": True}
                if batch_idx is not None:
                    ls["batch_idx"] = batch_idx
                    ls["echo_idx"] = echo_idx
                with open(loop_state_path, "w") as f:
                    json.dump(ls, f)
                ckpt.wait()
            logger.log({"event": "preempt_save", "epoch": epoch,
                        "step_count": step_count})

        history = []
        profiled = False
        for epoch in range(start_epoch, cfg.train.epochs):
            if profile_dir and epoch == start_epoch + 1 and not profiled:
                # profile the second epoch (first is compile-dominated)
                jax.profiler.start_trace(profile_dir)
                profiled = True
            t0 = time.time()
            losses, accs, seen = [], [], 0
            echo = max(cfg.data.data_echo, 1)
            # mid-epoch resume: fast-forward the epoch-seeded batch
            # stream past what the preempted run already trained on
            skip = resume_skip_batches if epoch == start_epoch else 0
            first_echo = resume_skip_echoes if epoch == start_epoch else 0
            pos_batch, pos_echo = skip, first_echo  # completed so far
            for bi, host_batch in enumerate(data.train_batches(epoch + 1)):
                if bi < skip:
                    continue  # consumed before preemption; replay-discard
                sharded = shard_batch(mesh, host_batch)
                # data echoing: each decoded batch drives `echo` steps,
                # each with a fresh augmentation/dropout key (on-device
                # augmentation makes the echoes genuinely different).
                echo_start = first_echo if bi == skip else 0
                for pos_echo in range(echo_start + 1, echo + 1):
                    batch = sharded
                    if hasattr(data, "device_transform"):
                        batch = data.device_transform(
                            "train", prng.named(step_count, "augment"),
                            batch)
                    rng = prng.named(step_count, "dropout")
                    state, m = train_step(state, batch, rng)
                    step_count += 1
                    seen += int(np.shape(batch[2])[0])
                    losses.append(m["loss"])
                    accs.append(m["accuracy"])
                    if (cfg.train.log_every > 0
                            and step_count % cfg.train.log_every == 0):
                        logger.log(
                            {"step": step_count, "epoch": epoch,
                             "loss": float(jax.device_get(m["loss"])),
                             "accuracy": float(jax.device_get(
                                 m["accuracy"]))})
                    if preempt["flag"]:
                        break
                pos_batch = bi
                if preempt["flag"]:
                    break
            if preempt["flag"]:
                # stop before validation: snapshot state + exact epoch
                # position (completed batches / echo steps) and exit
                if profiled and profile_dir:
                    jax.profiler.stop_trace()
                    profile_dir = None
                if pos_echo >= echo:  # the interrupted batch finished
                    pos_batch, pos_echo = pos_batch + 1, 0
                _preempt_checkpoint(epoch, batch_idx=pos_batch,
                                    echo_idx=pos_echo)
                break
            # exclude nan-guard-skipped steps from the epoch averages
            # (the reference `continue`s past them, 3dcnn train :127-129
            # — one bad step must not turn train_loss into NaN)
            lv = np.asarray(jax.device_get(losses), np.float64)
            av = np.asarray(jax.device_get(accs), np.float64)
            ok = np.isfinite(lv)
            train_loss = float(lv[ok].mean()) if ok.any() else float("nan")
            train_acc = float(av[ok].mean()) if ok.any() else 0.0

            eval_tf = (None if not hasattr(data, "device_transform") else
                       (lambda b: data.device_transform("valid", None, b)))
            val = evaluate(eval_step, state.params, state.batch_stats,
                           data.eval_batches("valid"), mesh,
                           transform=eval_tf)
            epoch_time = time.time() - t0
            if profiled and profile_dir:
                jax.profiler.stop_trace()
                profile_dir = None  # one traced epoch only

            current_lr = get_learning_rate(state.opt_state)
            record = {"epoch": epoch, "train_loss": train_loss,
                      "train_accuracy": train_acc,
                      "val_loss": val["loss"],
                      "val_accuracy": val["accuracy"],
                      "val_f1": val["f1"], "lr": current_lr,
                      "epoch_time_s": round(epoch_time, 2),
                      "images_per_sec": round(seen / max(epoch_time,
                                                         1e-9), 1)}
            history.append(record)
            logger.log(record)

            monitored = (val["loss"]
                         if "loss" in cfg.train.early_stop_metric
                         else val["accuracy"])
            stopper.update(monitored, epoch)
            ckpt_value = (val["loss"]
                          if "loss" in cfg.train.checkpoint_metric
                          else val["accuracy"])
            saved_this_epoch = saver.update(ckpt_value, epoch)
            if saved_this_epoch:
                best_state = snapshot(state)
                if ckpt:
                    if epoch in ckpt.all_steps():
                        # a mid-epoch preempt snapshot of this same
                        # epoch holds the step id: replace it
                        ckpt.delete(epoch)
                    ckpt.save(epoch, best_state,
                              metrics={"val_loss": val["loss"],
                                       "val_accuracy": val["accuracy"]})
            new_lr = plateau.update(monitored, current_lr)
            if new_lr is not None:
                logger.log({"event": "plateau_lr", "epoch": epoch,
                            "lr": new_lr})
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, new_lr))
            if ckpt and saved_this_epoch:
                # persist loop trackers keyed to the saved checkpoint so
                # resume restores them (written after the plateau update
                # so this epoch's LR decision is captured)
                with open(loop_state_path, "w") as f:
                    json.dump({"epoch": epoch, "step_count": step_count,
                               "stopper": stopper.state_dict(),
                               "saver": saver.state_dict(),
                               "plateau": plateau.state_dict()}, f)
            if preempt["flag"]:
                # signal arrived during validation/bookkeeping — the
                # epoch completed; a best-save at this step (if any)
                # already persists the state + trackers
                if not saved_this_epoch:
                    _preempt_checkpoint(epoch)
                else:
                    logger.log({"event": "preempt_save",
                                "epoch": epoch,
                                "step_count": step_count})
                break
            if stopper.should_stop:
                logger.log({"event": "early_stop", "epoch": epoch,
                            "best_epoch": stopper.best_epoch})
                break

        final_state = best_state if best_state is not None else state
        summary = {"history": history, "best_epoch": stopper.best_epoch,
                   "best_metric": float(stopper.best),
                   "checkpoint_best": float(saver.best),
                   "checkpoint_best_epoch": saver.best_epoch,
                   "preempted": preempt["flag"],
                   "state": final_state}

        try:
            test_batches = data.eval_batches("test")
        except (KeyError, ValueError):
            test_batches = None
        if test_batches is not None:
            eval_tf = (None if not hasattr(data, "device_transform") else
                       (lambda b: data.device_transform("test", None, b)))
            test = evaluate(eval_step, final_state.params,
                            final_state.batch_stats, test_batches, mesh,
                            transform=eval_tf)
            logger.log({"event": "test", "test_loss": test["loss"],
                        "test_accuracy": test["accuracy"],
                        "test_precision": test["precision"],
                        "test_recall": test["recall"],
                        "test_f1": test["f1"]})
            summary["test"] = test
        if ckpt:
            ckpt.wait()
            ckpt.close()
        return summary
