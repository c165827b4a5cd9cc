"""Production serving: AOT-compiled fixed-batch predictor + portable export.

The reference's only deployment story is re-running its evaluation
scripts eagerly at batch 1 (``experiment/evaluate_model_cnn.py:37-101``,
``experiment/test_on_video_cnn.py:253-254``). This module is the
TPU-native serving tier on top of the same models:

- ``Predictor`` ahead-of-time compiles ONE fixed-shape forward
  (``jax.jit(...).lower(...).compile()``) at construction, so the first
  request never pays the 20-40 s XLA compile; arbitrary request sizes
  are chunked and tail-padded to the compiled batch (pad rows sliced
  off before returning). XLA's cost analysis (flops/bytes accessed) is
  exposed for capacity planning.
- ``export_model`` / ``load_exported`` serialize the traced program —
  parameters baked in as constants — as a StableHLO artifact via
  ``jax.export``. The artifact is self-contained: a serving process
  needs compatible jax to ``.call`` it, not the surya_tpu source tree.

Both paths reproduce the reference's ablation-mode input handling
(dummy zero images / features per ``test_on_video_cnn.py:264-271``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from surya_tpu.core.config import ModelConfig
from surya_tpu.models import TEMPORAL_MODELS, get_model


def _input_specs(cfg: ModelConfig, batch_size: int, image_size: int,
                 img_dtype=jnp.float32):
    if cfg.name in TEMPORAL_MODELS:
        img = jax.ShapeDtypeStruct(
            (batch_size, cfg.seq_len, image_size, image_size, 3),
            img_dtype)
        feat = jax.ShapeDtypeStruct(
            (batch_size, cfg.seq_len, cfg.num_features), jnp.float32)
    else:
        img = jax.ShapeDtypeStruct(
            (batch_size, image_size, image_size, 3), img_dtype)
        feat = jax.ShapeDtypeStruct(
            (batch_size, cfg.num_features), jnp.float32)
    return img, feat


def _cast_params(variables, dtype):
    """Cast float weights to ``dtype``; BN statistics stay float32
    (batch_stats collection — normalization precision, repo
    convention: CLAUDE.md 'BN stats f32')."""

    def cast_tree(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(np.result_type(x), np.floating) else x,
            tree)

    return {k: (cast_tree(v) if k != "batch_stats" else v)
            for k, v in variables.items()}


def _make_forward(cfg: ModelConfig, model):
    """(variables, images, feats) → (preds int32 (B,), probs f32 (B,C)).

    The traced dtype of ``images`` sets the wire format:
      float32  — already-preprocessed [0,1] pixels (pipeline parity:
                 ``data/dataset.py`` device_transform divides by 255).
      uint8    — RAW 0-255 pixels; the ÷255 is traced into the compiled
                 program, so the host→device transfer is 4× smaller.
                 This is what a production server receives anyway.
      bfloat16 — [0,1] pixels pre-cast on host; 2× smaller transfer,
                 numerically free when the model computes in bf16.
    """

    def forward(variables, images, feats):
        from surya_tpu.models.common import apply_mode_ablation

        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        else:
            images = images.astype(jnp.float32)
        images, feats = apply_mode_ablation(cfg.mode, images, feats)
        logits = model.apply(variables, images, feats, train=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(probs, axis=-1).astype(jnp.int32), probs

    return forward


class Predictor:
    """Fixed-batch AOT-compiled classifier for serving.

    ``predict`` accepts any number of samples: requests are processed in
    ``batch_size`` chunks, the tail chunk padded by repeating its last
    row (padding never reaches the caller — outputs are sliced back to
    the request size). Compilation happens once, in ``__init__``.

    ``mesh`` compiles the forward across a device mesh: the request
    batch is sharded over the 'data' axis and parameters follow the
    tensor-parallel rules of ``parallel/sharding.py`` over 'model'
    (large matmul weights column-parallel, everything else replicated) —
    multi-chip serving is the same config flip as multi-chip training.
    ``param_dtype`` (e.g. ``jnp.bfloat16``) casts the float weights at
    load — halves the per-request parameter HBM traffic; BN statistics
    stay float32 (normalization precision, repo convention).

    ``input_dtype`` sets the image wire format (see ``_make_forward``):
    ``jnp.uint8`` accepts RAW 0-255 pixels and traces the ÷255 into the
    compiled program — a 4× smaller host→device transfer, which is the
    dominant serving cost off-chip. Feature vectors stay float32.
    """

    def __init__(self, cfg: ModelConfig, variables, batch_size: int = 32,
                 image_size: int = 224, mesh=None, param_dtype=None,
                 input_dtype=jnp.float32):
        self.cfg = cfg
        self.batch_size = batch_size
        self.image_size = image_size
        self.input_dtype = np.dtype(input_dtype)
        if param_dtype is not None:
            variables = _cast_params(variables, param_dtype)
        if mesh is not None:
            from surya_tpu.core.mesh import DATA_AXIS, data_sharding
            from surya_tpu.parallel.sharding import partition_params

            ddim = mesh.shape[DATA_AXIS]
            if batch_size % ddim:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the "
                    f"mesh data axis ({ddim})")
            self._variables = partition_params(variables, mesh)
            in_sh = jax.tree.map(lambda x: x.sharding, self._variables)
            img, feat = _input_specs(cfg, batch_size, image_size,
                                     img_dtype=input_dtype)
            fn = jax.jit(
                _make_forward(cfg, get_model(cfg)),
                in_shardings=(in_sh, data_sharding(mesh, img.ndim),
                              data_sharding(mesh, feat.ndim)),
                out_shardings=(data_sharding(mesh, 1),
                               data_sharding(mesh, 2)))
        else:
            self._variables = jax.device_put(variables)
            fn = jax.jit(_make_forward(cfg, get_model(cfg)))
            img, feat = _input_specs(cfg, batch_size, image_size,
                                     img_dtype=input_dtype)
        var_spec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            self._variables)
        self._compiled = fn.lower(var_spec, img, feat).compile()

    def cost_analysis(self) -> dict:
        """XLA cost analysis of the compiled program (flops, bytes)."""
        cost = self._compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # per-device list on older jax
            cost = cost[0] if cost else {}
        return dict(cost) if cost else {}

    def predict(self, images: np.ndarray, feats: np.ndarray):
        """→ (preds int (N,), probs f32 (N, num_classes)) for N samples.

        The caller's image dtype must match the wire format: a uint8
        wire takes raw 0-255 pixels only, a float wire takes [0,1]
        pixels only. A silent ``asarray`` cast in either direction
        produces confidently wrong predictions (0-255 floats fed to a
        float wire are ~255× out of scale; [0,1] floats cast to uint8
        truncate to 0), so mismatches raise instead."""
        images = np.asarray(images)
        wire = self.input_dtype
        if wire == np.uint8:
            if images.dtype != np.uint8:
                raise ValueError(
                    "this predictor's wire format is uint8 raw pixels; "
                    f"got {images.dtype} (send raw 0-255 uint8 pixels)")
        elif np.issubdtype(images.dtype, np.integer):
            raise ValueError(
                f"this predictor's wire format is {wire} [0,1] pixels; "
                f"got integer dtype {images.dtype} (normalize with /255 "
                "first, or serve with input_dtype=uint8)")
        n = images.shape[0]
        if n == 0:
            return (np.zeros((0,), np.int32),
                    np.zeros((0, self.cfg.num_classes), np.float32))
        preds, probs = [], []
        for lo in range(0, n, self.batch_size):
            img = np.asarray(images[lo:lo + self.batch_size],
                             self.input_dtype)
            ft = np.asarray(feats[lo:lo + self.batch_size], np.float32)
            pad = self.batch_size - img.shape[0]
            if pad:
                img = np.concatenate([img, np.repeat(img[-1:], pad, 0)])
                ft = np.concatenate([ft, np.repeat(ft[-1:], pad, 0)])
            p, pr = self._compiled(self._variables, jnp.asarray(img),
                                   jnp.asarray(ft))
            take = min(self.batch_size, n - lo)
            preds.append(np.asarray(p)[:take])
            probs.append(np.asarray(pr)[:take])
        return np.concatenate(preds), np.concatenate(probs)


def export_model(cfg: ModelConfig, variables, path: str,
                 batch_size: int = 32, image_size: int = 224,
                 platforms: tuple = ("cpu", "tpu"),
                 param_dtype=None, input_dtype=jnp.float32) -> None:
    """Serialize the forward pass (params baked in) as a StableHLO
    artifact at ``path``. Loadable with ``load_exported``.

    ``platforms`` lowers for each listed backend (default cpu+tpu) so
    the artifact really is portable — a single-platform export refuses
    to run anywhere else. ``param_dtype`` (e.g. ``jnp.bfloat16``)
    casts the baked-in weights — roughly halves the artifact.
    ``input_dtype=jnp.uint8`` bakes raw-pixel normalization into the
    artifact (see ``_make_forward``)."""
    model = get_model(cfg)
    forward = _make_forward(cfg, model)
    # Keep params on host: they are traced into the artifact as
    # constants, so staging them on the accelerator first would only
    # add two full-size device round-trips (costly through the tunnel).
    variables = jax.tree.map(np.asarray, jax.device_get(variables))
    if param_dtype is not None:
        variables = _cast_params(variables, param_dtype)

    def serving_fn(images, feats):
        return forward(variables, images, feats)

    img, feat = _input_specs(cfg, batch_size, image_size,
                             img_dtype=input_dtype)
    exported = jax.export.export(
        jax.jit(serving_fn), platforms=list(platforms))(img, feat)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Deserialize an ``export_model`` artifact. Returned object's
    ``.call(images, feats)`` runs the forward on the default backend."""
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read())
