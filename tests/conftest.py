"""Test env: 8 virtual CPU devices (the JAX fake backend for mesh tests).

Must run before jax initializes — pytest imports conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin latches the platform before env vars are read;
# force CPU through the config API (reliable under the tunnel).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound accumulated XLA CPU client state across the ~200-test
    suite: full single-process runs were SIGABRTing at ~test 188 (in
    whichever test landed there — a resource-accumulation signature,
    not a test bug) inside device_get. Dropping compiled-executable
    caches after each module keeps the live-program count at one
    module's worth; within-module cache reuse (where recompiles would
    actually cost time) is untouched."""
    yield
    jax.clear_caches()


@pytest.fixture
def disk_dataset(tmp_path):
    """Tiny flat-image dataset in the reference's on-disk layout
    (``split/class/{img.jpg, img.npy}`` + class_feature_means.json —
    ``experiment/dataloader_cnn.py:48-72``). Shared by
    test_data_pipeline.py and test_packed.py."""
    import json

    import numpy as np
    from PIL import Image

    from surya_tpu.features import FEATURE_NAMES_47

    rng = np.random.default_rng(0)
    classes = ["cobra", "plank"]
    root = tmp_path / "flat"
    means = {}
    for split, n in [("train", 6), ("valid", 4), ("test", 4)]:
        for c in classes:
            d = root / split / c
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 255, (48, 48, 3), np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.jpg")
                feats = rng.normal(size=47).astype(np.float32)
                if i == 0:
                    feats[5] = np.nan  # exercise imputation
                np.save(d / f"img_{i}.npy", feats)
            # one image without .npy must be skipped
            Image.fromarray(arr).save(d / "orphan.jpg")
    for c in classes:
        means[c] = {name: float(i) for i, name in
                    enumerate(FEATURE_NAMES_47)}
    (root / "class_feature_means.json").write_text(json.dumps(means))
    return str(root)


@pytest.fixture(scope="session")
def mesh8():
    from surya_tpu.core.mesh import MeshSpec, create_mesh
    return create_mesh(MeshSpec(data=8))


@pytest.fixture(scope="session")
def mesh1():
    from surya_tpu.core.mesh import single_device_mesh
    return single_device_mesh()
