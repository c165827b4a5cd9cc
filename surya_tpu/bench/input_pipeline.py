"""Host input-pipeline throughput: native C++ decode vs PIL.

At ~8k train images/sec/chip the host decode path is the bottleneck
risk (SURVEY §7 "Input-pipeline throughput"); this measures both decode
backends on synthetic JPEGs at the staging size used by
DiskDataSource.

Run: python -m surya_tpu.bench.input_pipeline [n_images] [staging]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np


def main(n_images: int = 256, staging: int = 256,
         src_hw: tuple[int, int] = (480, 640)) -> dict:
    from PIL import Image

    from surya_tpu import native

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_images):
        p = f"{tmp}/img{i:05d}.jpg"
        Image.fromarray(rng.integers(0, 255, (*src_hw, 3),
                                     np.uint8)).save(p, quality=90)
        paths.append(p)

    result = {"n_images": n_images, "staging": staging,
              "src": f"{src_hw[0]}x{src_hw[1]}"}

    t0 = time.perf_counter()
    for p in paths:
        with Image.open(p) as im:
            np.asarray(im.convert("RGB").resize((staging, staging),
                                                Image.BILINEAR))
    result["pil_images_per_sec"] = round(
        n_images / (time.perf_counter() - t0), 1)

    if native.available():
        native.decode_batch(paths[:8], staging)  # warm build
        t0 = time.perf_counter()
        _, ok = native.decode_batch(paths, staging)
        result["native_images_per_sec"] = round(
            n_images / (time.perf_counter() - t0), 1)
        result["native_ok"] = ok
        result["speedup"] = round(result["native_images_per_sec"]
                                  / result["pil_images_per_sec"], 2)
    else:
        result["native_images_per_sec"] = None

    # packed memmap cache (data/packed.py): pay the decode once, then
    # every epoch is a fancy-indexed memmap read
    root = f"{tmp}/flat"
    import os
    import shutil

    os.makedirs(f"{root}/train/c0", exist_ok=True)
    for i, p in enumerate(paths):
        shutil.copy(p, f"{root}/train/c0/img{i:05d}.jpg")
        np.save(f"{root}/train/c0/img{i:05d}.npy",
                rng.normal(size=47).astype(np.float32))
    from surya_tpu.core.config import DataConfig
    from surya_tpu.data.packed import PackedDataSource, pack_dataset

    t0 = time.perf_counter()
    pack_dataset(root, f"{tmp}/pack", staging=staging,
                 splits=("train",), verbose=False)
    result["pack_build_s"] = round(time.perf_counter() - t0, 2)
    src = PackedDataSource(
        DataConfig(data_root=root, batch_size=64,
                   packed_dir=f"{tmp}/pack"))
    for b in src.train_batches(0):  # warm the page cache
        pass
    best = 0.0
    for epoch in range(3):
        t0 = time.perf_counter()
        seen = sum(len(b[2]) for b in src.train_batches(epoch + 1))
        best = max(best, seen / (time.perf_counter() - t0))
    result["packed_images_per_sec"] = round(best, 1)
    result["packed_speedup_vs_pil"] = round(
        best / result["pil_images_per_sec"], 2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    main(n, s)
