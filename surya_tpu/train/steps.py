"""Jitted train/eval step builders — one SPMD program per step.

Replaces the nine copy-pasted torch epoch loops (SURVEY §2.4) with a
single pjit'd train step: forward (bf16 on the MXU), loss, grads, optax
update, BN-stat update, and the data-parallel gradient all-reduce — all
one XLA program over the ('data','model','seq') mesh. Batch-norm
statistics are computed over the GLOBAL batch automatically (reductions
under jit are global with GSPMD sharding), which upgrades the reference's
single-device BN semantics to synced BN at no cost.

Freezing (``cnn+lstm/models.py:26-27``, ``3dcnn/models.py:229-237,
291-297``, ``experiment/models_cnn.py:16-17``) is an optax mask: frozen
params get no updates AND no weight decay. BN statistics under freezing
differ by family, each matching its reference script: SPATIAL models
(quadtree/hierarchical/standard) keep updating frozen-trunk BN running
stats in train mode — exactly what the reference's ``model.train()``
with ``requires_grad=False`` does (``experiment/models_cnn.py:16-17``);
TEMPORAL models take a ``freeze_backbone`` attribute and switch frozen
BN to inference mode so the pretrained r3d_18/ViT statistics aren't
corrupted by tiny fine-tune batches (the partial-unfreeze intent of
``3dcnn/models.py:229-237``).

NaN-loss guarding (``3dcnn/train_3D_Quadtree_cnn_model.py:127-129``)
happens inside the compiled step: a non-finite loss selects the old state
instead of branching on host.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from surya_tpu.core.config import Config
from surya_tpu.models.losses import cross_entropy, cross_entropy_per_sample


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# Freezing rules
# ---------------------------------------------------------------------------

# Models whose backbone is frozen EXCEPT layer4 (3dcnn/models.py:229-237,
# 291-297 unfreeze r3d_18.layer4 for fine-tuning).
_PARTIAL_UNFREEZE = {"resnet3d_video", "hybrid_quadtree_3d"}
_BACKBONE_KEYS = ("trunk", "vit_backbone")


def trainable_mask(params, model_name: str, freeze_backbone: bool):
    """Bool pytree: True = trainable. Mirrors the reference freeze rules."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, _ in flat.items():
        trainable = True
        if freeze_backbone and path[0] in _BACKBONE_KEYS:
            trainable = False
            if model_name in _PARTIAL_UNFREEZE and any(
                    "layer4" in p for p in path):
                trainable = True
        out[path] = trainable
    return traverse_util.unflatten_dict(out)


def stop_frozen_gradients(params, model_name: str, freeze_backbone: bool):
    """Wrap frozen leaves in ``stop_gradient`` so the backbone backward
    pass is never built.

    The optax freeze mask (``set_to_zero``) only discards frozen
    gradients AFTER they are computed — ``value_and_grad`` over the full
    param tree still differentiates through the frozen trunk/ViT, which
    for the frozen families (``cnn+lstm/models.py:26-27``,
    ``experiment/models_cnn.py:16-17``, FACT's frozen ViT) is the vast
    majority of the step's FLOPs (backward ≈ 2× forward). Stopping the
    gradient at the frozen *param leaves* makes JAX's transpose emit
    symbolic zeros for them, and every backward op feeding only those
    cotangents is pruned from the jaxpr. Numerics are identical: the
    forward is untouched, frozen grads were already zeroed by the mask,
    and the global-norm clip inside ``multi_transform`` only ever saw
    the trainable subset. Partial unfreezing (r3d_18 ``layer4``) still
    gets exact layer4 grads — the cotangent reaches layer4's params
    directly without flowing into the frozen layers upstream of it.
    """
    if not freeze_backbone:
        return params
    mask = trainable_mask(params, model_name, True)
    return jax.tree.map(
        lambda p, t: p if t else jax.lax.stop_gradient(p), params, mask)


def make_optimizer(cfg: Config, params):
    """inject_hyperparams(adamw [+clip]) with optional freeze mask."""
    def build(learning_rate):
        txs = []
        if cfg.train.grad_clip > 0:
            txs.append(optax.clip_by_global_norm(cfg.train.grad_clip))
        txs.append(optax.adamw(learning_rate,
                               weight_decay=cfg.train.weight_decay))
        return optax.chain(*txs)

    tx = optax.inject_hyperparams(build)(learning_rate=cfg.train.lr)
    mask = trainable_mask(params, cfg.model.name,
                          cfg.model.freeze_backbone)
    if not all(jax.tree.leaves(mask)):
        labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Plateau-LR support: rewrite the injected learning_rate in-place."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=jnp.asarray(
        lr, dtype=jnp.float32))


def get_learning_rate(opt_state) -> float:
    return float(optax.tree_utils.tree_get(opt_state, "learning_rate"))


# ---------------------------------------------------------------------------
# State creation + steps
# ---------------------------------------------------------------------------

def create_train_state(model: nn.Module, cfg: Config, rng,
                       sample_batch) -> tuple[TrainState, optax.GradientTransformation]:
    images, feats, _ = sample_batch
    variables = model.init({"params": rng}, images, feats, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats,
                       opt_state=tx.init(params))
    return state, tx


def make_train_step(model: nn.Module, tx, cfg: Config, mesh=None,
                    state_shardings=None) -> Callable:
    """Build the jitted train step: (state, batch, rng) → (state, metrics).

    ``state_shardings`` (a TrainState-shaped NamedSharding pytree, see
    ``parallel/zero.py``) pins the output state's placement — used for
    ZeRO-1 optimizer-state sharding, where GSPMD turns the annotation
    into reduce-scatter(grads) → local moment update → all-gather
    (updates). Requires ``mesh`` for the (replicated) metrics outputs.
    The caller must place the input state identically (``apply_zero1``)
    so buffer donation still applies."""

    smoothing = cfg.train.label_smoothing
    nan_guard = cfg.train.nan_guard

    model_name = cfg.model.name
    freeze = cfg.model.freeze_backbone

    def apply(params, batch_stats, images, feats, rng):
        params = stop_frozen_gradients(params, model_name, freeze)
        variables = {"params": params, "batch_stats": batch_stats}
        logits, updated = model.apply(
            variables, images, feats, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats", "losses"])
        # modules may sow pre-scaled auxiliary objectives into the
        # 'losses' collection (e.g. the MoE load-balancing loss,
        # parallel/moe.py); empty for every reference-parity model
        aux = sum(jnp.sum(v) for v in jax.tree.leaves(
            updated.get("losses", {})))
        return logits, updated.get("batch_stats", batch_stats), aux

    if cfg.train.remat:
        # rematerialize the forward in the backward pass: trades FLOPs
        # for HBM (activation memory), enabling larger batches
        apply = jax.checkpoint(apply)

    accum = max(getattr(cfg.train, "grad_accum", 1), 1)

    def pin_grads(grads):
        """Constrain grads to the params' shardings when the output
        state is sharding-pinned (ZeRO-1/FSDP). Without this, GSPMD's
        sharding propagation on multi-axis meshes (e.g. pipe x model x
        data) can mark a conv-kernel grad as partial-sum over the
        unrelated axes and over-reduce it — observed as an exactly
        (pipe*model)x patch_embed gradient on the composed
        pp2xtp2xdp2+zero1 program (round-3 dryrun); the constraint cuts
        that propagation path and doubles as the explicit
        reduce-scatter point under FSDP."""
        if state_shardings is None:
            return grads
        return jax.lax.with_sharding_constraint(
            grads, state_shardings.params)

    def step(state: TrainState, batch, rng):
        images, feats, labels = batch
        if labels.shape[0] % accum:
            raise ValueError(
                f"batch size {labels.shape[0]} not divisible by "
                f"grad_accum={accum}")

        if accum == 1:
            def loss_fn(params):
                logits, new_stats, aux = apply(params, state.batch_stats,
                                               images, feats, rng)
                loss = cross_entropy(logits, labels, smoothing) + aux
                return loss, (logits, new_stats)

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = pin_grads(grads)
            accuracy = jnp.mean((jnp.argmax(logits, axis=-1)
                                 == labels).astype(jnp.float32))
        else:
            # Gradient accumulation: lax.scan over `accum` microbatches
            # — one microbatch of activations lives at a time (the
            # memory lever orthogonal to remat), grads averaged, ONE
            # optimizer update. BN stats update sequentially per
            # microbatch (torch-sequential semantics); each microbatch
            # gets its own dropout fold.
            def micro_loss(params, stats, im, ft, lb, key):
                logits, new_stats, aux = apply(params, stats, im, ft,
                                               key)
                loss = cross_entropy(logits, lb, smoothing) + aux
                return loss, (logits, new_stats)

            grad_fn = jax.value_and_grad(micro_loss, has_aux=True,
                                         argnums=0)

            def body(carry, xs):
                stats, gacc, lacc, cacc = carry
                im, ft, lb, key = xs
                (loss, (logits, new_stats)), g = grad_fn(
                    state.params, stats, im, ft, lb, key)
                gacc = jax.tree.map(jnp.add, gacc, g)
                correct = jnp.sum((jnp.argmax(logits, axis=-1)
                                   == lb).astype(jnp.float32))
                return (new_stats, gacc, lacc + loss, cacc + correct), None

            def mb(x):
                return x.reshape((accum, x.shape[0] // accum)
                                 + x.shape[1:])

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, gsum, lsum, csum), _ = jax.lax.scan(
                body, (state.batch_stats, zeros, jnp.zeros(()), jnp.zeros(())),
                (mb(images), mb(feats), mb(labels),
                 jax.random.split(rng, accum)))
            grads = pin_grads(jax.tree.map(lambda g: g / accum, gsum))
            loss = lsum / accum
            accuracy = csum / labels.shape[0]

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        if nan_guard:
            good = jnp.isfinite(loss)
            sel = lambda new, old: jax.tree.map(  # noqa: E731
                lambda a, b: jnp.where(good, a, b), new, old)
            new_params = sel(new_params, state.params)
            new_opt_state = sel(new_opt_state, state.opt_state)
            new_stats = sel(new_stats, state.batch_stats)

        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        metrics = {"loss": loss, "accuracy": accuracy}
        return new_state, metrics

    if state_shardings is None:
        return jax.jit(step, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    metric_shardings = {"loss": rep, "accuracy": rep}
    return jax.jit(step, donate_argnums=(0,),
                   out_shardings=(state_shardings, metric_shardings))


def make_eval_step(model: nn.Module, num_classes: int,
                   label_smoothing: float = 0.0) -> Callable:
    """(params, batch_stats, batch) → dict with loss-sum/correct/confusion.

    Rows with label < 0 are padding (multi-chip eval pads ragged tail
    batches to the data-axis size — data/pipeline.py) and are masked out
    of every statistic, so eval metrics are exact on any split size.
    """

    def step(params, batch_stats, batch):
        images, feats, labels = batch
        variables = {"params": params, "batch_stats": batch_stats}
        logits = model.apply(variables, images, feats, train=False)
        valid = labels >= 0
        safe = jnp.maximum(labels, 0)
        per = cross_entropy_per_sample(logits, safe, label_smoothing)
        preds = jnp.argmax(logits, axis=-1)
        w = valid.astype(jnp.float32)
        cm = jnp.zeros((num_classes, num_classes), jnp.int32)
        cm = cm.at[safe, preds].add(valid.astype(jnp.int32))
        return {"loss_sum": jnp.sum(per * w),
                "correct": jnp.sum(((preds == safe) & valid).astype(
                    jnp.int32)),
                "count": jnp.sum(valid.astype(jnp.int32)),
                "confusion": cm}

    return jax.jit(step)
