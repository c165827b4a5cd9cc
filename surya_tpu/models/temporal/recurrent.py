"""Stacked LSTM over (B, T, D) sequences, compiled via lax.scan.

Replaces torch ``nn.LSTM(batch_first=True, num_layers=N, dropout=p)`` as
used across the temporal models (``cnn+lstm/models.py:43-49``,
``3dcnn/models.py:144-151``). Flax's ``nn.RNN``/``OptimizedLSTMCell``
lowers to a single ``lax.scan`` — static trip count, XLA-friendly, no
Python-level time loop. Torch semantics preserved: inter-layer dropout on
every layer's output except the last.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class StackedLSTM(nn.Module):
    hidden: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        """(B, T, D) → (B, T, hidden) outputs of the top layer."""
        x = x.astype(self.dtype)
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                        param_dtype=jnp.float32)
            x = nn.RNN(cell, name=f"layer{i}")(x)
            if i < self.num_layers - 1 and self.dropout > 0:
                x = nn.Dropout(self.dropout,
                               deterministic=not train)(x)
        return x


def last_step(outputs: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H) → (B, H): final-timestep state (lstm_out[:, -1, :])."""
    return outputs[:, -1, :]
