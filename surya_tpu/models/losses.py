"""Losses: cross-entropy (+label smoothing) and focal loss.

Cross-entropy replaces ``nn.CrossEntropyLoss`` used by every reference
train script. ``focal_loss`` reproduces ``3dcnn/models.py:8-45`` with its
use-before-assignment bug on ``alpha_t`` (``:34-36``) fixed: alpha
weighting is applied per-class when ``alpha`` is a vector, scalar-blended
when a float, and skipped when None.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """Mean softmax cross-entropy over the batch. logits (B,C), labels (B,)."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if label_smoothing > 0:
        one_hot = (one_hot * (1.0 - label_smoothing)
                   + label_smoothing / num_classes)
    return optax.softmax_cross_entropy(logits, one_hot).mean()


def cross_entropy_per_sample(logits: jnp.ndarray, labels: jnp.ndarray,
                             label_smoothing: float = 0.0) -> jnp.ndarray:
    """Per-sample softmax cross-entropy (B,) — for masked eval sums."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if label_smoothing > 0:
        one_hot = (one_hot * (1.0 - label_smoothing)
                   + label_smoothing / num_classes)
    return optax.softmax_cross_entropy(logits, one_hot)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               gamma: float = 2.0, alpha=None) -> jnp.ndarray:
    """FL(p_t) = -alpha_t (1-p_t)^gamma log(p_t), mean-reduced."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    labels_oh = jax.nn.one_hot(labels, logits.shape[-1],
                               dtype=logits.dtype)
    log_pt = jnp.sum(labels_oh * log_probs, axis=-1)
    pt = jnp.exp(log_pt)
    loss = -((1.0 - pt) ** gamma) * log_pt
    if alpha is not None:
        alpha = jnp.asarray(alpha, dtype=logits.dtype)
        if alpha.ndim == 0:
            alpha_t = jnp.where(labels > 0, alpha, 1.0 - alpha)
        else:
            alpha_t = alpha[labels]
        loss = alpha_t * loss
    return loss.mean()
