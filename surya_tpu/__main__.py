"""CLI: one entry point replacing the reference's nine hand-edited
scripts (§5.6 — module-level constants become presets + dotted
overrides).

  python -m surya_tpu list-presets
  python -m surya_tpu train --preset quadtree-fusion \
      [--synthetic] [--out DIR] [--plot] [--train.lr=3e-4 ...]
  python -m surya_tpu compare NAME=CKPT:PRESET ... [--split valid] [--out DIR]
  python -m surya_tpu bench
  python -m surya_tpu pack --root DATA --out DIR [--staging 256]
  python -m surya_tpu export CKPT out.stablehlo [--preset P] [--batch-size N] [--input-dtype uint8]
  python -m surya_tpu serve CKPT [--preset P] [--port 8577] [--classes names.json]
  python -m surya_tpu export-torch CKPT out.pth [--preset P]
  python -m surya_tpu cam CKPT --preset P [--target layer4] [--out DIR]
  python -m surya_tpu video PARAMS VIDEO --classes names.json [--out f.mp4]
  python -m surya_tpu pose-train [--steps N] [--width W] [--out DIR]
  python -m surya_tpu ingest pt-windows PT_ROOT OUT   (reference .pt → .npz)
  python -m surya_tpu ingest clip-csv PROCESSED OUT   (reference CSVs → canonical)
"""

from __future__ import annotations

import json
import os
import sys


def _build_mesh(cfg):
    """Mesh from the --mesh.* config subtree (data/model/seq axes)."""
    from surya_tpu.core.mesh import MeshSpec, create_mesh

    return create_mesh(MeshSpec(data=cfg.mesh.data, model=cfg.mesh.model,
                                seq=cfg.mesh.seq))


def _build_data(cfg, pad_eval_to: int = 1):
    """Pick the data source: synthetic, sequence (temporal models), or
    disk (spatial models)."""
    from surya_tpu.models import TEMPORAL_MODELS

    temporal = cfg.model.name in TEMPORAL_MODELS
    if cfg.data.synthetic:
        from surya_tpu.data import (
            ArrayDataSource,
            make_synthetic_spatial,
            make_synthetic_temporal,
        )

        gen = (make_synthetic_temporal if temporal
               else make_synthetic_spatial)
        kw = dict(num_classes=cfg.model.num_classes,
                  image_size=cfg.data.image_size)
        if temporal:
            kw["seq_len"] = cfg.data.seq_len
        splits = {s: gen(per_class=max(cfg.data.synthetic_size
                                       // cfg.model.num_classes, 2),
                         seed=i, **kw)
                  for i, s in enumerate(("train", "valid", "test"))}
        return ArrayDataSource(splits, cfg.data.batch_size,
                               pad_eval_to=pad_eval_to)
    if temporal:
        if cfg.data.seq_len != cfg.model.seq_len:
            raise ValueError(
                f"data.seq_len={cfg.data.seq_len} != "
                f"model.seq_len={cfg.model.seq_len}; override both "
                "together (the model's temporal embedding is sized to "
                "its seq_len)")
        if cfg.data.packed_dir:
            from surya_tpu.data.packed import PackedSequenceSource

            return PackedSequenceSource(cfg.data, seed=cfg.train.seed,
                                        pad_eval_to=pad_eval_to)
        from surya_tpu.data.sequences import SequenceDataSource

        return SequenceDataSource(cfg.data, seed=cfg.train.seed,
                                  pad_eval_to=pad_eval_to)
    if cfg.data.packed_dir:
        from surya_tpu.data.packed import PackedDataSource

        return PackedDataSource(cfg.data, seed=cfg.train.seed,
                                pad_eval_to=pad_eval_to)
    from surya_tpu.data.dataset import DiskDataSource

    return DiskDataSource(cfg.data, seed=cfg.train.seed,
                          pad_eval_to=pad_eval_to)


def cmd_train(argv: list[str]) -> int:
    import argparse

    from surya_tpu.core.config import get_preset, parse_cli_overrides
    from surya_tpu.core.metrics import MetricsLogger
    from surya_tpu.train import train_and_evaluate

    ap = argparse.ArgumentParser(prog="surya_tpu train")
    ap.add_argument("--preset", default="quadtree-fusion")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", default="runs/latest")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="restore latest checkpoint (incl. optimizer "
                         "state) and continue")
    ap.add_argument("--profile-dir", default=None,
                    help="jax.profiler trace dir (TensorBoard)")
    ap.add_argument("--tensorboard", action="store_true",
                    help="mirror metrics as TensorBoard scalars "
                         "under OUT/tb (§5.5)")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable jax.debug_nans (SURVEY §5.2); "
                         "disables the in-step NaN guard so the origin "
                         "of the first NaN errors out loudly")
    args, rest = ap.parse_known_args(argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    cfg = get_preset(args.preset)
    if args.synthetic:
        cfg = cfg.override({"data.synthetic": "true"})
    if args.debug_nans:
        cfg = cfg.override({"train.nan_guard": "false"})
    overrides = parse_cli_overrides(rest) if rest else {}
    if overrides:
        cfg = cfg.override(overrides)
    os.makedirs(args.out, exist_ok=True)
    if "train.checkpoint_dir" not in overrides:  # don't clobber -- flag
        cfg = cfg.override(
            {"train.checkpoint_dir": os.path.join(args.out, "ckpt")})
    with open(os.path.join(args.out, "config.json"), "w") as f:
        f.write(cfg.to_json())

    mesh = _build_mesh(cfg)
    data = _build_data(cfg, pad_eval_to=mesh.shape["data"])
    logger = MetricsLogger(
        os.path.join(args.out, "metrics.jsonl"),
        tensorboard_dir=(os.path.join(args.out, "tb")
                         if args.tensorboard else None))
    try:
        summary = train_and_evaluate(cfg, data, mesh=mesh, logger=logger,
                                     resume=args.resume,
                                     profile_dir=args.profile_dir)
    finally:
        logger.close()  # flush JSONL + TensorBoard writers

    if args.plot:
        from surya_tpu.utils.plotting import (
            plot_confusion_matrix,
            plot_history,
        )

        plot_history(summary["history"],
                     os.path.join(args.out, "history.png"),
                     summary["best_epoch"])
        if "test" in summary:
            names = getattr(data, "class_names",
                            [str(i) for i in
                             range(cfg.model.num_classes)])
            plot_confusion_matrix(
                summary["test"]["confusion"], names,
                os.path.join(args.out, "confusion.png"))
    result = {k: v for k, v in summary.get("test", {}).items()
              if k != "confusion"}
    print(json.dumps({"best_epoch": summary["best_epoch"],
                      "best_metric": summary["best_metric"],
                      "test": result}))
    return 0


def cmd_eval(argv: list[str]) -> int:
    """Evaluate a checkpoint on a split (evaluate_model_cnn.py parity)."""
    import argparse

    from surya_tpu.core.checkpoint import load_checkpoint_variables
    from surya_tpu.core.config import get_preset, parse_cli_overrides
    from surya_tpu.train.compare import evaluate_checkpoint

    ap = argparse.ArgumentParser(prog="surya_tpu eval")
    ap.add_argument("checkpoint")
    ap.add_argument("--preset", default="quadtree-fusion")
    ap.add_argument("--split", default="test")
    ap.add_argument("--synthetic", action="store_true")
    args, rest = ap.parse_known_args(argv)
    cfg = get_preset(args.preset)
    if args.synthetic:
        cfg = cfg.override({"data.synthetic": "true"})
    if rest:
        cfg = cfg.override(parse_cli_overrides(rest))
    mesh = _build_mesh(cfg)
    data = _build_data(cfg, pad_eval_to=mesh.shape["data"])
    variables = load_checkpoint_variables(args.checkpoint)
    out = evaluate_checkpoint(cfg, variables, data, split=args.split,
                              mesh=mesh)
    print(json.dumps({k: (float(v) if not hasattr(v, "tolist")
                          else v.tolist())
                      for k, v in out.items() if k != "confusion"}))
    return 0


def cmd_export(argv: list[str]) -> int:
    """AOT-export a checkpoint as a self-contained StableHLO serving
    artifact (surya_tpu/infer/serve.py)."""
    import argparse

    from surya_tpu.core.checkpoint import load_checkpoint_variables
    from surya_tpu.core.config import get_preset, parse_cli_overrides
    from surya_tpu.infer.serve import export_model

    ap = argparse.ArgumentParser(prog="surya_tpu export")
    ap.add_argument("checkpoint")
    ap.add_argument("out", help="output artifact path (.stablehlo)")
    ap.add_argument("--preset", default="quadtree-fusion")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--param-dtype", default=None,
                    choices=["bfloat16", "float16", "float32"],
                    help="cast baked-in weights (bfloat16 roughly "
                         "halves the artifact; BN stats stay f32)")
    ap.add_argument("--input-dtype", default="float32",
                    choices=["float32", "bfloat16", "uint8"],
                    help="image wire format: uint8 takes RAW 0-255 "
                         "pixels and bakes the /255 into the program "
                         "(4x smaller host->device transfer)")
    args, rest = ap.parse_known_args(argv)
    cfg = get_preset(args.preset)
    if rest:
        cfg = cfg.override(parse_cli_overrides(rest))
    variables = load_checkpoint_variables(args.checkpoint)
    import jax.numpy as jnp

    export_model(cfg.model, variables, args.out,
                 batch_size=args.batch_size,
                 image_size=cfg.data.image_size,
                 param_dtype=(None if args.param_dtype is None
                              else jnp.dtype(args.param_dtype)),
                 input_dtype=jnp.dtype(args.input_dtype))
    print(json.dumps({"artifact": os.path.abspath(args.out),
                      "bytes": os.path.getsize(args.out),
                      "batch_size": args.batch_size,
                      "input_dtype": args.input_dtype,
                      "model": cfg.model.name}))
    return 0


def cmd_export_torch(argv: list[str]) -> int:
    """Export a trained checkpoint as a reference-named torch
    state_dict (models/full_export.py — the inverse of full_import):
    the resulting ``.pth`` loads directly into the reference's own
    ``get_model`` via ``load_state_dict``."""
    import argparse

    from surya_tpu.core.checkpoint import load_checkpoint_variables
    from surya_tpu.core.config import get_preset, parse_cli_overrides
    from surya_tpu.models.full_export import EXPORTERS

    ap = argparse.ArgumentParser(prog="surya_tpu export-torch")
    ap.add_argument("checkpoint")
    ap.add_argument("out", help="output path (.pth; .npz if torch "
                                "is unavailable)")
    ap.add_argument("--preset", default="quadtree-fusion")
    args, rest = ap.parse_known_args(argv)
    cfg = get_preset(args.preset)
    if rest:
        cfg = cfg.override(parse_cli_overrides(rest))
    name = cfg.model.name
    if name not in EXPORTERS:
        print(f"no torch exporter for model {name!r}")
        return 1
    variables = load_checkpoint_variables(args.checkpoint)
    kw = {}
    if name in ("quadtree", "quadtree_3d", "hybrid_quadtree_3d"):
        kw["mode"] = cfg.model.mode
    if name == "standard_multimodal":
        kw["backbone"] = cfg.model.backbone
    sd = EXPORTERS[name](variables, **kw)
    try:
        import torch

        torch.save({k: torch.from_numpy(v.copy()) if v.ndim else
                    torch.tensor(v) for k, v in sd.items()}, args.out)
        fmt = "torch"
    except ImportError:
        import numpy as np

        out = args.out if args.out.endswith(".npz") else args.out + ".npz"
        np.savez(out, **sd)
        args.out, fmt = out, "npz"
    print(json.dumps({"artifact": os.path.abspath(args.out),
                      "format": fmt, "model": name,
                      "tensors": len(sd)}))
    return 0


def cmd_check() -> int:
    """Environment check (parity with the reference's standalone smoke
    scripts: Zero123/check_zero123plus.py, check_model.py,
    Background_remove/test_single_background.py)."""
    import importlib.util

    def probe(name):
        return importlib.util.find_spec(name) is not None

    report = {}
    import jax

    report["jax_backend"] = jax.default_backend()
    report["devices"] = [str(d) for d in jax.devices()]
    for dep, why in [("PIL", "image IO"), ("cv2", "video IO/skeletons"),
                     ("mediapipe", "pose landmark extraction (optional: "
                                   "TPU-native landmark net needs none)"),
                     ("rembg", "background removal (optional: "
                               "TPU-native U2-Net backend needs none)"),
                     ("diffusers", "Zero123-Plus multiview (optional: "
                                   "TPU-native sampler needs none)"),
                     ("matplotlib", "plots"),
                     ("sklearn", "metric cross-checks (tests)")]:
        report[dep] = {"available": probe(dep), "needed_for": why}
    report["tpu_native_backends"] = {
        "u2net_background_removal": "models/segmentation/u2net.py",
        "euler_ancestral_multiview": "models/diffusion/",
        "pose_landmark_detection": "models/pose/landmark_net.py",
    }
    from surya_tpu import native

    report["native_decoder"] = native.available()
    print(json.dumps(report, indent=2))
    return 0


def cmd_cam(argv: list[str]) -> int:
    """Batch Grad-CAM overlays for a trained checkpoint
    (``resnet/grad_cam_analysis.py:237-441`` parity as a subcommand;
    hierarchical targets level1/level2 are the beyond-reference
    extension — interpret/gradcam.py)."""
    import argparse

    from surya_tpu.core.checkpoint import load_checkpoint_variables
    from surya_tpu.core.config import get_preset, parse_cli_overrides
    from surya_tpu.interpret.gradcam import save_batch_grad_cam

    ap = argparse.ArgumentParser(prog="surya_tpu cam")
    ap.add_argument("checkpoint")
    ap.add_argument("--preset", default="quadtree-fusion")
    ap.add_argument("--split", default="test")
    ap.add_argument("--out", default="runs/cams")
    ap.add_argument("--target", default="layer4",
                    help="layer3|layer4 (quadtree), "
                         "layer2|level1|level2 (hierarchical families)")
    ap.add_argument("--alpha", type=float, default=0.4)
    ap.add_argument("--limit", type=int, default=0,
                    help="max batches (0 = all)")
    ap.add_argument("--synthetic", action="store_true")
    args, rest = ap.parse_known_args(argv)
    cfg = get_preset(args.preset)
    if args.synthetic:
        cfg = cfg.override({"data.synthetic": "true"})
    if rest:
        cfg = cfg.override(parse_cli_overrides(rest))
    data = _build_data(cfg)
    variables = load_checkpoint_variables(args.checkpoint)
    names = getattr(data, "class_names",
                    [str(i) for i in range(cfg.model.num_classes)])

    def batches():
        for i, b in enumerate(data.eval_batches(args.split)):
            if args.limit and i >= args.limit:
                break
            if hasattr(data, "device_transform"):
                # classify the normalized images, overlay on the raw
                mb = data.device_transform(args.split, None, b)
                yield (mb[0], mb[1], b[2], b[0])
            else:
                yield b

    n = save_batch_grad_cam(cfg.model, variables, batches(), names,
                            args.out, target_layer=args.target,
                            alpha=args.alpha)
    print(f"wrote {n} CAM overlays to {args.out}")
    return 0


def cmd_pack(argv: list[str]) -> int:
    """Build the packed pre-decoded dataset cache (data/packed.py):
    one offline decode pass, then decode-free training epochs via
    ``--data.packed_dir``."""
    import argparse

    from surya_tpu.data.packed import pack_dataset

    ap = argparse.ArgumentParser(prog="surya_tpu pack")
    ap.add_argument("--root", default="data/flat_image_dataset_final")
    ap.add_argument("--out", required=True, help="pack output dir")
    ap.add_argument("--staging", type=int, default=256,
                    help="decoded side length (DiskDataSource staging)")
    ap.add_argument("--sequences", action="store_true",
                    help="pack a windowed .npz sequence dataset "
                         "(--root = seq_root) instead of the flat "
                         "image layout")
    ap.add_argument("--seq-len", type=int, default=4)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)
    if args.sequences:
        from surya_tpu.data.packed import pack_sequences

        meta = pack_sequences(args.root, args.out, seq_len=args.seq_len,
                              overwrite=args.overwrite)
    else:
        meta = pack_dataset(args.root, args.out, staging=args.staging,
                            overwrite=args.overwrite)
    print(json.dumps({"out": os.path.abspath(args.out),
                      "kind": meta["kind"],
                      "splits": meta["splits"]}))
    return 0


def cmd_pose_train(argv: list[str]) -> int:
    """Train the TPU-native pose-landmark net (the MediaPipe stand-in)
    on the on-device synthetic generator; the checkpoint feeds
    --pose-ckpt in the video / still-image-prep / sequence-prep CLIs."""
    import argparse

    from surya_tpu.models.pose import train_pose_landmark

    ap = argparse.ArgumentParser(prog="surya_tpu pose-train")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=256,
                    help="training resolution (divisible by 16); "
                         "stored in the checkpoint")
    ap.add_argument("--width", type=int, default=32,
                    help="base channel width (divisible by 8)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="runs/pose_landmark")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--occlude-p", type=float, default=0.0,
                    help="per-sample random-patch occlusion probability "
                         "(on-device augmentation)")
    ap.add_argument("--mirror-p", type=float, default=0.0,
                    help="per-sample horizontal-mirror probability "
                         "(chirality augmentation)")
    args = ap.parse_args(argv)
    summary = train_pose_landmark(
        steps=args.steps, batch=args.batch, image_size=args.image_size,
        width=args.width, out_dir=args.out, peak_lr=args.lr,
        seed=args.seed, occlude_p=args.occlude_p, mirror_p=args.mirror_p)
    return 0 if summary["pck10"] > 0 else 1


def cmd_compare(argv: list[str]) -> int:
    """Multi-model comparison tier (``comparative analysis/
    analysis.py:33-167`` as a CLI): evaluate N trained checkpoints on
    one split, print accuracy + weighted P/R/F1 + R² per model, write
    per-model confusion matrices and the comparison bar chart.

      python -m surya_tpu compare quadtree=runs/a/ckpt:quadtree-fusion \
          resnet18=runs/b/ckpt:comparative-resnet18 \
          [--split valid] [--out DIR] [--data.data_root=... ...]
    """
    import argparse

    from surya_tpu.core.config import get_preset, parse_cli_overrides
    from surya_tpu.core.checkpoint import load_checkpoint_variables
    from surya_tpu.train.compare import compare_models

    ap = argparse.ArgumentParser(prog="surya_tpu compare")
    ap.add_argument("entries", nargs="+",
                    help="NAME=CKPT_PATH:PRESET triples")
    ap.add_argument("--split", default="valid")
    ap.add_argument("--out", default=None)
    args, rest = ap.parse_known_args(argv)
    overrides = parse_cli_overrides(rest) if rest else {}

    entries = []
    for spec in args.entries:
        if "=" not in spec or ":" not in spec.split("=", 1)[1]:
            raise SystemExit(f"bad entry {spec!r}; "
                             "expected NAME=CKPT_PATH:PRESET")
        name, rhs = spec.split("=", 1)
        path, preset = rhs.rsplit(":", 1)
        cfg = get_preset(preset)
        if overrides:
            cfg = cfg.override(overrides)
        load_checkpoint_variables(path)  # fail fast on a bad path
        entries.append({"name": name, "cfg": cfg, "params_path": path})

    cfg0 = entries[0]["cfg"]
    # One shared data pipeline (the reference's analysis.py single-
    # loader design): every entry is evaluated on entry 0's loader, so
    # the data-relevant config must agree or later checkpoints would be
    # silently scored on the wrong pipeline.
    for e in entries[1:]:
        for field in ("image_size", "num_classes", "num_features",
                      "data_root", "seq_root", "synthetic"):
            v0, v = (getattr(cfg0.data, field, None),
                     getattr(e["cfg"].data, field, None))
            if v0 != v:
                raise SystemExit(
                    f"compare: entry {e['name']!r} data.{field}={v!r} "
                    f"differs from entry 0's {v0!r}; all entries share "
                    "one data pipeline — pass matching --data.* "
                    "overrides")
    mesh = _build_mesh(cfg0)
    data = _build_data(cfg0, pad_eval_to=mesh.shape["data"])
    summary = compare_models(entries, data, split=args.split,
                             out_dir=args.out, mesh=mesh)
    if args.out:
        with open(os.path.join(args.out, "comparison.json"), "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


def cmd_list_presets() -> int:
    from surya_tpu.core.config import get_preset, list_presets

    for name in list_presets():
        cfg = get_preset(name)
        print(f"{name:28s} model={cfg.model.name:20s} "
              f"bs={cfg.data.batch_size:<3d} lr={cfg.train.lr:g} "
              f"epochs={cfg.train.epochs}")
    return 0


def main() -> int:
    from surya_tpu.core.cache import enable_compilation_cache
    from surya_tpu.core.mesh import maybe_initialize_distributed

    # persistent XLA cache: compiles cost 20-40 s through the remote
    # helper; opt out with SURYA_NO_COMPILE_CACHE=1 (core/cache.py)
    enable_compilation_cache()
    maybe_initialize_distributed()  # multi-host (DCN) when configured
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd == "train":
        return cmd_train(argv)
    if cmd == "eval":
        return cmd_eval(argv)
    if cmd == "compare":
        return cmd_compare(argv)
    if cmd == "list-presets":
        return cmd_list_presets()
    if cmd == "pack":
        return cmd_pack(argv)
    if cmd == "cam":
        return cmd_cam(argv)
    if cmd == "video":
        from surya_tpu.infer.video import main as video_main

        return video_main(argv)
    if cmd == "serve":
        from surya_tpu.infer.http_server import main as serve_main

        return serve_main(argv)
    if cmd == "export":
        return cmd_export(argv)
    if cmd == "export-torch":
        return cmd_export_torch(argv)
    if cmd == "pose-train":
        return cmd_pose_train(argv)
    if cmd == "ingest":
        from surya_tpu.data.prep.ingest import main as ingest_main

        return ingest_main(argv)
    if cmd == "check":
        return cmd_check()
    if cmd == "bench":
        # bench.py lives at the repo root (driver contract); make it
        # importable regardless of the caller's cwd
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if root not in sys.path:
            sys.path.insert(0, root)
        import bench

        bench.main()
        return 0
    print(f"unknown command {cmd!r}\n{__doc__}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
