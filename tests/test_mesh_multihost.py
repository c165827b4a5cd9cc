"""Multi-host input-feed path (core/mesh.py shard_batch).

True multi-process JAX can't run on this single host (and two
concurrent XLA CPU clients are unstable here — CLAUDE.md), so these
tests pin the pieces that ARE verifiable in one process:

- the per-process assembly (`_shard_batch_multiprocess`) with
  nproc=1/rank=0 must reproduce the plain device_put sharding exactly
  (`make_array_from_process_local_data` degenerates to it);
- simulated multi-process row-slicing: cutting each rank's slice and
  re-concatenating covers the global batch exactly once, in order;
- indivisible global batches fail loudly.
"""

import numpy as np
import pytest

from surya_tpu.core.mesh import (
    _shard_batch_multiprocess,
    shard_batch,
)


def _batch(n=16):
    rng = np.random.default_rng(0)
    return (rng.normal(size=(n, 8, 8, 3)).astype(np.float32),
            rng.normal(size=(n, 47)).astype(np.float32),
            rng.integers(0, 4, n).astype(np.int32))


def test_single_process_assembly_matches_device_put(mesh8):
    batch = _batch()
    via_put = shard_batch(mesh8, batch)       # nproc==1 fast path
    via_mpl = tuple(_shard_batch_multiprocess(mesh8, x, 1, 0)
                    for x in batch)
    for a, b in zip(via_put, via_mpl):
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rank_slices_tile_the_global_batch():
    x = np.arange(16 * 3).reshape(16, 3)
    nproc = 4
    per = 16 // nproc
    slices = [np.asarray(x)[r * per:(r + 1) * per] for r in range(nproc)]
    np.testing.assert_array_equal(np.concatenate(slices), x)
    assert all(s.shape[0] == per for s in slices)


def test_indivisible_batch_raises(mesh8):
    x = np.zeros((10, 4), np.float32)
    with pytest.raises(ValueError, match="not divisible"):
        _shard_batch_multiprocess(mesh8, x, 4, 0)
