"""Deterministic PRNG-key threading.

The reference seeds three host RNGs and flips cudnn-determinism knobs
(``experiment/train_cnn_model.py:36-41``). JAX keys make determinism
structural: one root key per run, split per step/purpose, no host RNG in
the training path.
"""

from __future__ import annotations

import jax


class PRNG:
    """A fold-in based key dispenser: stateless given (seed, step, name)."""

    def __init__(self, seed: int):
        self.root = jax.random.key(seed)

    def step_key(self, step: int) -> jax.Array:
        return jax.random.fold_in(self.root, step)

    def named(self, step: int, name: str) -> jax.Array:
        k = self.step_key(step)
        return jax.random.fold_in(k, _stable_hash(name))


def _stable_hash(name: str) -> int:
    # Python's hash() is salted per process; use a stable FNV-1a instead.
    h = 2166136261
    for b in name.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h
