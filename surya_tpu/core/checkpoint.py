"""Orbax checkpointing: full training state, best-metric retention, resume.

Upgrade over the reference's ``torch.save(model.state_dict())`` at best
validation metric (§5.4, e.g. ``Quadtree_train.py:101-105``): we persist
``{params, batch_stats, opt_state, step, epoch}`` so training truly
resumes (the reference cannot resume — no optimizer state is saved).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _abstract_template(meta) -> Any:
    """ShapeDtypeStruct tree (current-default-device sharding) from
    orbax checkpoint metadata, or None if the metadata shape is not the
    expected TreeMetadata (older orbax) — caller falls back to the
    saved-sharding restore."""
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
    if tree is None:
        return None
    # Prefer a host CPU device: the caller gets numpy leaves anyway
    # (host_copy), and staging a whole TrainState (params + Adam
    # moments) onto accelerator device 0 both wastes tunnel transfer
    # and can OOM a chip that only ever held a shard of it.
    try:
        dev = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        dev = jax.devices()[0]
    here = jax.sharding.SingleDeviceSharding(dev)
    try:
        return jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=here), tree,
            is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"))
    except Exception:
        return None


class CheckpointManager:
    """Thin orbax wrapper with 'best' + 'latest' retention."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 best_fn=None, best_mode: str = "max"):
        """With ``best_fn``, retention keeps the best ``max_to_keep``
        checkpoints BY METRIC (not the latest ones) — so forced
        preemption snapshots (saved without metrics, always kept)
        can never evict the best-metric checkpoint."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=best_fn, best_mode=best_mode,
                keep_checkpoints_without_metrics=True),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None,
             force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics, force=force)

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        # No template: restore to host numpy (via a current-default-
        # device template), NOT to the devices recorded at save time —
        # those may not exist on this platform (cross-platform restore),
        # and committed device arrays would conflict with mesh-sharded
        # inputs downstream. Numpy leaves are uncommitted: jit places
        # them per the consuming computation's sharding.
        abstract = _abstract_template(self._mgr.item_metadata(step))
        if abstract is None:
            return self._mgr.restore(step)
        return host_copy(self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)))

    def delete(self, step: int) -> None:
        """Drop one step (used to GC stale preemption snapshots)."""
        try:
            self._mgr.delete(step)
        except Exception:
            pass  # already gone / pruned

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return list(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_params(path: str, params) -> None:
    """One-shot params-only save (reference state_dict-style artifact)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, template=None):
    """Restore a ``save_params`` tree.

    Without a template, orbax restores onto the devices recorded at save
    time — which fails across platforms (a CPU-saved checkpoint errors
    under the TPU backend with "Device TFRT_CPU_0 was not found"). We
    instead build an abstract ShapeDtypeStruct template from the
    checkpoint's own metadata and return HOST NUMPY leaves — portable
    across platforms and uncommitted, so downstream jit computations
    are free to place them under any device/mesh sharding.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    abstract = _abstract_template(ckptr.metadata(path))
    if abstract is None:
        return ckptr.restore(path)
    return host_copy(ckptr.restore(path, abstract))


def load_checkpoint_variables(path: str) -> dict:
    """Load {'params', 'batch_stats'} from either a params-only save
    (``save_params``) or a CheckpointManager directory (latest step)."""
    path = os.path.abspath(path)
    entries = os.listdir(path) if os.path.isdir(path) else []
    step_dirs = [e for e in entries if e.isdigit()]
    if step_dirs:
        mgr = CheckpointManager(path)
        state = mgr.restore(mgr.latest_step())
        mgr.close()
        return {"params": state["params"],
                "batch_stats": state.get("batch_stats", {})}
    tree = load_params(path)
    if "params" in tree:
        return {"params": tree["params"],
                "batch_stats": tree.get("batch_stats", {})}
    return {"params": tree, "batch_stats": {}}


def host_copy(tree):
    """Fetch a (possibly sharded) pytree to host numpy for saving."""
    return jax.tree.map(lambda x: jax.device_get(x), tree)


def snapshot(tree):
    """Checkpoint-ready copy of a live training state.

    Single-process: host numpy (frees the HBM the snapshot would
    otherwise pin; orbax writes numpy directly). Multi-process:
    ``jax.device_get`` on a ZeRO/FSDP-sharded array would raise (this
    host cannot address the remote shards), so the sharded
    ``jax.Array``s are kept as-is — they are immutable, holding the
    reference costs no copy, and orbax saves them natively with every
    process writing only the shards it owns.
    """
    if jax.process_count() == 1:
        return host_copy(tree)
    return tree
