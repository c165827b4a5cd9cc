"""Train the TPU-native pose-landmark model on the on-device generator.

Thin env-knob wrapper around ``surya_tpu.models.pose.train_pose_landmark``
(the same loop the ``python -m surya_tpu pose-train`` CLI runs): the
synthetic articulated-stick-figure generator executes INSIDE the jitted
train step — sample, render, forward, backward, and update are one XLA
program; the host contributes nothing but a PRNG key per step.

Run: python scripts/pose_train_demo.py [STEPS] → runs/pose_landmark/
Env knobs (bench.py convention, for reduced CPU runs when the TPU
tunnel is down): POSE_SIZE, POSE_BATCH, POSE_WIDTH, POSE_OUT,
POSE_PLATFORM=cpu; POSE_OCCLUDE_P / POSE_MIRROR_P enable the
generator's on-device occlusion / chirality augmentation.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from surya_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

if os.environ.get("POSE_PLATFORM"):  # env var alone is ignored here —
    # the axon plugin latches the platform; the config API works.
    jax.config.update("jax_platforms", os.environ["POSE_PLATFORM"])

from surya_tpu.models.pose import train_pose_landmark  # noqa: E402

if __name__ == "__main__":
    train_pose_landmark(
        steps=int(sys.argv[1]) if len(sys.argv) > 1 else 600,
        batch=int(os.environ.get("POSE_BATCH", "64")),
        image_size=int(os.environ.get("POSE_SIZE", "256")),
        width=int(os.environ.get("POSE_WIDTH", "32")),
        out_dir=os.environ.get("POSE_OUT", "runs/pose_landmark"),
        occlude_p=float(os.environ.get("POSE_OCCLUDE_P", "0")),
        mirror_p=float(os.environ.get("POSE_MIRROR_P", "0")),
    )
