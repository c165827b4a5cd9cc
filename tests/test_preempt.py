"""Preemption-safe checkpointing: SIGTERM → snapshot → clean stop →
resume.

TPU VMs are preemptible (SURVEY §5.3); ``train.preempt_save`` turns the
preemption notice (SIGTERM) into a full-state checkpoint at a step
boundary plus loop-tracker persistence, so a ``resume=True`` rerun
continues. No reference counterpart (the reference cannot resume at
all, §5.4).
"""

import json
import os
import signal

import numpy as np

from surya_tpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from surya_tpu.core.metrics import MetricsLogger
from surya_tpu.data import ArrayDataSource, make_synthetic_spatial
from surya_tpu.train import train_and_evaluate


def _data():
    splits = {s: make_synthetic_spatial(num_classes=3, per_class=8,
                                        image_size=32, seed=i)
              for i, s in enumerate(["train", "valid"])}
    return ArrayDataSource(splits, batch_size=8)


def _cfg(tmp_path, epochs):
    return Config(
        model=ModelConfig(name="quadtree", num_classes=3,
                          compute_dtype="float32", use_pallas=False,
                          freeze_backbone=True),
        data=DataConfig(batch_size=8),
        train=TrainConfig(epochs=epochs, lr=1e-3, seed=0,
                          early_stop_patience=0,
                          checkpoint_dir=str(tmp_path / "ckpt")))


class SigtermAfter:
    """Data source wrapper that SIGTERMs this process after yielding
    `after_batches` train batches of its `kill_epoch`-th served epoch
    (0-indexed), once."""

    def __init__(self, inner, kill_epoch=0, after_batches=2):
        self.inner = inner
        self.kill_epoch = kill_epoch
        self.after_batches = after_batches
        # the loop's sample-shape fetch is the first train_batches()
        # call; real epochs start at the second → begin at -1
        self.served = -1
        self.fired = False

    @property
    def num_classes(self):
        return self.inner.num_classes

    def train_batches(self, epoch_seed):
        epoch = self.served
        self.served += 1

        def gen():
            for i, b in enumerate(self.inner.train_batches(epoch_seed)):
                yield b
                if (not self.fired and epoch == self.kill_epoch
                        and i + 1 == self.after_batches):
                    self.fired = True
                    os.kill(os.getpid(), signal.SIGTERM)

        return gen()

    def eval_batches(self, split):
        return self.inner.eval_batches(split)


def test_preempt_saves_and_resumes(tmp_path, mesh8):
    data = SigtermAfter(_data(), kill_epoch=0, after_batches=2)
    cfg = _cfg(tmp_path, 5)
    s1 = train_and_evaluate(cfg, data, mesh=mesh8,
                            logger=MetricsLogger(echo=False),
                            checkpoints=True)
    assert s1["preempted"] is True
    # stopped before epoch 5; epoch 0 never completed → no history row
    assert len(s1["history"]) < 5
    ls_path = os.path.join(cfg.train.checkpoint_dir, "loop_state.json")
    with open(ls_path) as f:
        ls = json.load(f)
    assert ls["preempt"] is True and ls["epoch"] == 0
    assert ls["step_count"] >= 2
    # mid-epoch snapshot records the exact position inside the epoch
    assert ls["batch_idx"] >= 2 and ls["echo_idx"] == 0

    # the default SIGTERM disposition is restored after the run
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    # resume: re-enters the interrupted epoch 0 (fast-forwarded past
    # the trained batches), completes the 5-epoch budget
    data2 = _data()
    s2 = train_and_evaluate(_cfg(tmp_path, 5), data2, mesh=mesh8,
                            logger=MetricsLogger(echo=False),
                            checkpoints=True, resume=True)
    assert s2["preempted"] is False
    epochs_run = [h["epoch"] for h in s2["history"]]
    assert epochs_run and epochs_run[0] == 0 and epochs_run[-1] == 4
    assert np.isfinite(s2["history"][-1]["train_loss"])


def test_preempt_after_best_keeps_best_weights(tmp_path, mesh8):
    """Preempting in epoch 1 (after epoch 0 saved a best) must not make
    the preemption snapshot the 'best' on resume: the best epoch's own
    checkpoint is re-read and the tracked best metric survives."""
    data = SigtermAfter(_data(), kill_epoch=1, after_batches=1)
    cfg = _cfg(tmp_path, 5)
    s1 = train_and_evaluate(cfg, data, mesh=mesh8,
                            logger=MetricsLogger(echo=False),
                            checkpoints=True)
    assert s1["preempted"] is True
    assert [h["epoch"] for h in s1["history"]] == [0]
    best_after_e0 = s1["checkpoint_best"]
    assert np.isfinite(best_after_e0)
    ls_path = os.path.join(cfg.train.checkpoint_dir, "loop_state.json")
    with open(ls_path) as f:
        ls = json.load(f)
    assert ls["preempt"] is True and ls["epoch"] == 1
    assert ls["saver"]["best_epoch"] == 0

    # resume with a 1-epoch budget: the mid-epoch snapshot re-enters
    # epoch 1, but range(1, 1) is empty — the summary must carry the
    # restored epoch-0 best, not the preempt snapshot
    s2 = train_and_evaluate(_cfg(tmp_path, 1), _data(), mesh=mesh8,
                            logger=MetricsLogger(echo=False),
                            checkpoints=True, resume=True)
    assert s2["history"] == []
    assert s2["checkpoint_best"] == best_after_e0
    assert s2["state"] is not None


def test_best_survives_repeated_preemptions(tmp_path, mesh8):
    """Metric-aware retention: repeated preempt/resume cycles with no
    new best must never evict the best epoch's checkpoint (regression:
    latest-k retention dropped it after max_to_keep force-saves), and
    stale metric-less snapshots are GC'd instead of accumulating."""
    data = SigtermAfter(_data(), kill_epoch=1, after_batches=1)
    cfg = _cfg(tmp_path, 8)
    s1 = train_and_evaluate(cfg, data, mesh=mesh8,
                            logger=MetricsLogger(echo=False),
                            checkpoints=True)
    assert s1["preempted"] is True
    assert s1["checkpoint_best_epoch"] == 0

    for _ in range(3):  # three more cycles, each dying mid-epoch
        d = SigtermAfter(_data(), kill_epoch=0, after_batches=1)
        s = train_and_evaluate(_cfg(tmp_path, 8), d, mesh=mesh8,
                               logger=MetricsLogger(echo=False),
                               checkpoints=True, resume=True)
        assert s["preempted"] is True

    from surya_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    steps = mgr.all_steps()
    mgr.close()
    assert 0 in steps, f"best epoch evicted: {steps}"
    # best + the latest snapshot (older snapshots GC'd per cycle)
    assert len(steps) <= 3, f"stale snapshots accumulated: {steps}"


def test_midepoch_resume_is_bit_exact(tmp_path, mesh8):
    """A preempt + resume must be invisible to the final weights: the
    resumed run fast-forwards the epoch-seeded batch stream and the
    step-count-named PRNG keys continue exactly, so preempted+resumed
    training equals one uninterrupted run bit-for-bit."""
    cfg_a = _cfg(tmp_path / "a", 3)
    ref = train_and_evaluate(cfg_a, _data(), mesh=mesh8,
                             logger=MetricsLogger(echo=False),
                             checkpoints=False)

    # same budget, killed after 1 batch of epoch 1 (truly mid-epoch:
    # 24 samples / bs 8 = 3 batches per epoch)
    data = SigtermAfter(_data(), kill_epoch=1, after_batches=1)
    cfg_b = _cfg(tmp_path / "b", 3)
    s1 = train_and_evaluate(cfg_b, data, mesh=mesh8,
                            logger=MetricsLogger(echo=False),
                            checkpoints=True)
    assert s1["preempted"] is True
    ls_path = os.path.join(cfg_b.train.checkpoint_dir, "loop_state.json")
    with open(ls_path) as f:
        ls = json.load(f)
    assert ls["epoch"] == 1 and 0 < ls["batch_idx"] < 3

    s2 = train_and_evaluate(_cfg(tmp_path / "b", 3), _data(), mesh=mesh8,
                            logger=MetricsLogger(echo=False),
                            checkpoints=True, resume=True)
    assert s2["preempted"] is False
    # resumed run covers epochs 1 (completed mid-way) and 2
    assert [h["epoch"] for h in s2["history"]] == [1, 2]

    import jax

    ref_final = jax.device_get(ref["state"].params)
    res_final = jax.device_get(s2["state"].params)
    jax.tree.map(np.testing.assert_array_equal, ref_final, res_final)


def test_preempt_save_disabled(tmp_path, mesh8):
    """preempt_save=False leaves SIGTERM disposition untouched."""
    cfg = _cfg(tmp_path, 1)
    cfg = Config(model=cfg.model, data=cfg.data,
                 train=TrainConfig(**{**cfg.train.__dict__,
                                      "preempt_save": False}))
    before = signal.getsignal(signal.SIGTERM)
    s = train_and_evaluate(cfg, _data(), mesh=mesh8,
                           logger=MetricsLogger(echo=False),
                           checkpoints=True)
    assert signal.getsignal(signal.SIGTERM) == before
    assert s["preempted"] is False
