"""Multi-model comparison: evaluate several checkpoints on one split.

Parity with ``comparative analysis/analysis.py:33-167``: loads N trained
checkpoints (e.g. quadtree / resnet18 / vgg16 / mobilenet_v2), evaluates
each on the validation split, reports accuracy + weighted P/R/F1 + R²
per model, renders per-model confusion matrices and the per-metric
comparison bar chart.
"""

from __future__ import annotations

import os

import numpy as np

from surya_tpu.core.checkpoint import load_checkpoint_variables
from surya_tpu.core.config import Config
from surya_tpu.core.mesh import create_mesh
from surya_tpu.core.metrics import r2_score
from surya_tpu.models import get_model
from surya_tpu.train.loop import evaluate
from surya_tpu.train.steps import make_eval_step


def evaluate_checkpoint(cfg: Config, variables, data,
                        split: str = "valid", mesh=None) -> dict:
    """Evaluate one model's variables on a data source split."""
    mesh = mesh or create_mesh()
    eval_step = make_eval_step(get_model(cfg.model),
                               cfg.model.num_classes,
                               cfg.train.label_smoothing)
    tf = (None if not hasattr(data, "device_transform")
          else (lambda b: data.device_transform(split, None, b)))
    with mesh:
        out = evaluate(eval_step, variables["params"],
                       variables.get("batch_stats", {}),
                       data.eval_batches(split), mesh, transform=tf)
    # R² over (true, pred-majority) classes approximated from the
    # confusion matrix (analysis.py:96 computes it over raw preds; the
    # cm reconstruction is exact for label/pred pairs).
    cm = out["confusion"]
    if cm is None:  # empty split: evaluate() returns zeroed metrics
        out["confusion"] = np.zeros(
            (cfg.model.num_classes, cfg.model.num_classes), np.int32)
        out["r2"] = 0.0
        return out
    labels, preds = [], []
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            labels += [i] * int(cm[i, j])
            preds += [j] * int(cm[i, j])
    if labels:
        import jax.numpy as jnp

        out["r2"] = float(r2_score(jnp.asarray(labels),
                                   jnp.asarray(preds)))
    return out


def compare_models(entries: list[dict], data, split: str = "valid",
                   out_dir: str | None = None, mesh=None) -> dict:
    """entries: [{name, cfg, params_path}] → {name: metrics}.

    Writes per-model confusion PNGs + a comparison bar chart when
    ``out_dir`` is given.
    """
    mesh = mesh or create_mesh()
    results = {}
    for e in entries:
        variables = load_checkpoint_variables(e["params_path"])
        results[e["name"]] = evaluate_checkpoint(e["cfg"], variables,
                                                 data, split, mesh)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from surya_tpu.utils.plotting import (
            plot_confusion_matrix,
            plot_model_comparison,
        )

        names = getattr(data, "class_names", None) or [
            str(i) for i in range(
                next(iter(results.values()))["confusion"].shape[0])]
        for name, r in results.items():
            plot_confusion_matrix(
                r["confusion"], names,
                os.path.join(out_dir, f"confusion_{name}.png"),
                title=f"{name} ({split})")
        plot_model_comparison(
            {n: {k: v for k, v in r.items()
                 if k in ("accuracy", "precision", "recall", "f1")}
             for n, r in results.items()},
            os.path.join(out_dir, "comparison.png"))
    summary = {n: {k: (float(v) if not isinstance(v, np.ndarray) else
                       v.tolist())
                   for k, v in r.items() if k != "confusion"}
               for n, r in results.items()}
    return summary
