"""Video inference: per-frame pose classification with annotated output.

Parity with ``experiment/test_on_video_cnn.py:212-307``: read a video,
per frame extract the 47 pose features (landmark detection + the jnp
feature math), run the classifier, overlay the predicted label +
softmax confidence, and write an annotated video.

TPU-native upgrade: frames are processed in BATCHES through one jitted
forward (the reference runs batch-1 per frame, ``:253-254``), so device
utilization survives the Python frame loop; mode-conditional dummy
inputs reproduce ``:264-271``.

cv2 and mediapipe are gated imports — the classifier path works with
any ``LandmarkExtractor`` (e.g. precomputed landmarks in tests).

Usage:
  python -m surya_tpu.infer.video CKPT_DIR VIDEO.mp4 --out annotated.mp4
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from surya_tpu.core.config import ModelConfig
from surya_tpu.data.augment import eval_preprocess
from surya_tpu.features import extract_features_47
from surya_tpu.models import get_model


def make_frame_classifier(cfg: ModelConfig, variables,
                          image_size: int = 224) -> Callable:
    """Returns jitted fn: (frames f32 [0,1] (B,H,W,3), feats (B,47)) →
    (pred (B,), confidence (B,))."""
    model = get_model(cfg)

    @jax.jit
    def classify(frames, feats):
        from surya_tpu.models.common import apply_mode_ablation

        images = eval_preprocess(frames, out_size=image_size)
        images, feats = apply_mode_ablation(cfg.mode, images, feats)
        logits = model.apply(variables, images, feats, train=False)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(probs, axis=-1)
        return preds, jnp.max(probs, axis=-1)

    return classify


def run_video_inference(cfg: ModelConfig, variables, video_path: str,
                        class_names: list[str],
                        output_path: str | None = None,
                        extractor=None, batch_size: int = 16,
                        image_size: int = 224,
                        display: bool = False) -> list[dict]:
    """Returns per-frame records [{frame, label, confidence}] and
    optionally writes the annotated video.

    ``display=True`` additionally shows each annotated frame in a live
    window (``cv2.imshow``; quit with 'q') — parity with the reference's
    interactive mode (``experiment/test_on_video_cnn.py:294-300``).
    Requires a GUI-capable OpenCV build; headless environments should
    use ``output_path`` instead. Note: display implies per-frame
    annotation, so with ``batch_size>1`` frames show in batch bursts."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise ImportError("cv2 required for video IO") from e

    if extractor is None:
        from surya_tpu.data.prep.still_image_dataset import (
            mediapipe_extractor,
        )
        extractor = mediapipe_extractor()

    classify = make_frame_classifier(cfg, variables, image_size)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = None
    if output_path:
        writer = cv2.VideoWriter(
            output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not writer.isOpened():  # ref guards this (:239-241)
            raise RuntimeError(
                f"cv2.VideoWriter failed to open {output_path!r} "
                "(codec mp4v unavailable or path unwritable)")

    import tempfile

    records = []
    frame_idx = 0
    done = False
    while not done:
        # collect a batch of frames
        frames_bgr = []
        while len(frames_bgr) < batch_size:
            ok, frame = cap.read()
            if not ok:
                done = True
                break
            frames_bgr.append(frame)
        if not frames_bgr:
            break

        if hasattr(extractor, "process_batch"):
            # device-dispatched extractors (the neural landmark net):
            # ONE program launch for the whole batch — per-frame calls
            # would be tunnel-RPC-bound
            results = extractor.process_batch(frames_bgr)
            lms = [lm for lm, _ in results]
            det = [d for _, d in results]
        else:
            lms, det = [], []
            for frame in frames_bgr:
                # landmark extraction is path-based; give it the frame
                # via a temp file only if the extractor needs a path
                if hasattr(extractor, "process_array"):
                    lm, d = extractor.process_array(frame)
                else:
                    with tempfile.NamedTemporaryFile(suffix=".jpg") as tf:
                        cv2.imwrite(tf.name, frame)
                        lm, d = extractor(tf.name)
                lms.append(lm)
                det.append(d)

        rgb = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
                        for f in frames_bgr]).astype(np.float32) / 255.0
        # resize on host to a fixed staging size for batching
        staged = np.stack([cv2.resize(f, (image_size, image_size))
                           for f in rgb])
        feats = np.asarray(extract_features_47(
            jnp.asarray(np.stack(lms)), jnp.asarray(np.asarray(det))))
        feats = np.nan_to_num(feats)   # NaN→0 (ref :261)

        preds, confs = classify(jnp.asarray(staged), jnp.asarray(feats))
        preds = np.asarray(preds)
        confs = np.asarray(confs)

        for i, frame in enumerate(frames_bgr):
            label = class_names[int(preds[i])]
            conf = float(confs[i])
            records.append({"frame": frame_idx, "label": label,
                            "confidence": conf})
            if writer is not None or display:
                if det[i]:
                    # skeleton overlay (test_on_video_cnn.py:280-292)
                    from surya_tpu.data.prep.sequence_features import (
                        _annotate,
                    )

                    frame = _annotate(frame, lms[i])
                cv2.putText(frame, f"{label} ({conf:.2f})", (16, 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0),
                            2)
                if writer is not None:
                    writer.write(frame)
                if display:
                    # live window (test_on_video_cnn.py:294-300)
                    cv2.imshow("surya_tpu inference", frame)
                    if cv2.waitKey(1) & 0xFF == ord("q"):
                        done = True
                        break
            frame_idx += 1

    cap.release()
    if writer is not None:
        writer.release()
    if display:
        cv2.destroyAllWindows()
    return records


def main(argv: list[str] | None = None) -> int:
    """CLI entry (also reachable as ``python -m surya_tpu video``)."""
    import argparse
    import json

    from surya_tpu.core.checkpoint import load_checkpoint_variables

    ap = argparse.ArgumentParser(prog="surya_tpu video")
    ap.add_argument("params_path")
    ap.add_argument("video")
    ap.add_argument("--out", default=None)
    ap.add_argument("--model", default="quadtree")
    ap.add_argument("--mode", default="fusion")
    ap.add_argument("--classes", required=True,
                    help="JSON file with class names list")
    ap.add_argument("--display", action="store_true",
                    help="show annotated frames live (q to quit)")
    ap.add_argument("--pose-ckpt", default=None,
                    help="msgpack checkpoint of the TPU-native landmark "
                         "net (models/pose, scripts/pose_train_demo.py): "
                         "replaces MediaPipe for landmark extraction")
    args = ap.parse_args(argv)
    with open(args.classes) as f:
        class_names = json.load(f)
    cfg = ModelConfig(name=args.model, mode=args.mode,
                      num_classes=len(class_names))
    extractor = None
    if args.pose_ckpt:
        from surya_tpu.models.pose import load_pose_extractor

        extractor = load_pose_extractor(args.pose_ckpt)
    # accepts a CheckpointManager dir, a save_params full-variables
    # tree, or a bare params tree — same contract as every other CLI
    variables = load_checkpoint_variables(args.params_path)
    recs = run_video_inference(cfg, variables, args.video, class_names,
                               output_path=args.out, extractor=extractor,
                               display=args.display)
    print(json.dumps(recs[:10], indent=2))
    print(f"{len(recs)} frames classified")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
