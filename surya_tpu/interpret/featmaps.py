"""Hierarchical feature-map visualization.

Parity with ``Quadtree_from scratch/visualization.py:44-132``:
``forward_for_visualization`` returns the 28×28 base map (layer2), a
14×14 level-1 quadrant map, and 7×7 level-2 sub-quadrant maps; the
plot renders channel-mean heatmaps with quadrant grid lines.

Here the maps come straight from the trunk's capture mechanism (no
weightless skeleton model needed) and rendering is headless matplotlib.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from surya_tpu.core.config import ModelConfig
from surya_tpu.models.backbones.resnet import make_resnet, stem_is_s2d
from surya_tpu.ops.quadtree import quadrant_split


def hierarchy_maps(cfg: ModelConfig, variables, images):
    """Returns dict with channel-mean heatmaps:
    base (B,28,28), level1 (B,4,14,14), level2 (B,16,7,7)."""
    trunk = make_resnet(cfg.backbone, dtype=jnp.float32,
                        stem_s2d=stem_is_s2d(variables["params"]["trunk"]))
    tv = {"params": variables["params"]["trunk"],
          "batch_stats": variables.get("batch_stats", {}).get("trunk", {})}
    base = trunk.apply(tv, jnp.asarray(images, jnp.float32), train=False,
                       upto="layer2")["out"]          # (B, 28, 28, 128)
    b = base.shape[0]
    l1 = quadrant_split(base)                          # (4B, 14, 14, C)
    l2 = quadrant_split(l1)                            # (16B, 7, 7, C)

    def cmean(x, k):
        m = jnp.mean(x, axis=-1)
        return np.asarray(m.reshape(b, k, *m.shape[1:])
                          if k > 1 else m)

    return {"base": np.asarray(jnp.mean(base, axis=-1)),
            "level1": cmean(l1, 4), "level2": cmean(l2, 16)}


def plot_hierarchy(maps: dict, sample: int = 0, out_path: str | None
                   = None):
    """Render base/level1/level2 heatmaps with quadrant grid lines
    (visualization.py:96-129 layout), headless."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    base = maps["base"][sample]
    axes[0].imshow(base, cmap="viridis")
    h = base.shape[0]
    axes[0].axhline(h / 2 - 0.5, color="w", lw=1)
    axes[0].axvline(h / 2 - 0.5, color="w", lw=1)
    axes[0].set_title("base map (layer2)")

    l1 = maps["level1"][sample]          # (4, 14, 14)
    grid1 = np.block([[l1[0], l1[1]], [l1[2], l1[3]]])
    axes[1].imshow(grid1, cmap="viridis")
    axes[1].axhline(grid1.shape[0] / 2 - 0.5, color="w", lw=1)
    axes[1].axvline(grid1.shape[1] / 2 - 0.5, color="w", lw=1)
    axes[1].set_title("level-1 quadrants")

    l2 = maps["level2"][sample]          # (16, 7, 7)
    # index q1*4+q2 (q1 = quadrant raster, q2 = sub-quadrant raster
    # within q1) → spatial cell (row, col) so the panel lines up with
    # the base/level-1 panels
    cells = np.empty((4, 4), object)
    for q1 in range(4):
        for q2 in range(4):
            cells[(q1 // 2) * 2 + q2 // 2,
                  (q1 % 2) * 2 + q2 % 2] = l2[q1 * 4 + q2]
    grid2 = np.block(cells.tolist())
    axes[2].imshow(grid2, cmap="viridis")
    axes[2].axhline(grid2.shape[0] / 2 - 0.5, color="w", lw=1)
    axes[2].axvline(grid2.shape[1] / 2 - 0.5, color="w", lw=1)
    axes[2].set_title("level-2 sub-quadrants")
    for ax in axes:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig
