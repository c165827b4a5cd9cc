"""Multi-host input-feed path (core/mesh.py shard_batch).

True multi-process JAX can't run on this single host (and two
concurrent XLA CPU clients are unstable here — CLAUDE.md), so these
tests pin the pieces that ARE verifiable in one process:

- the per-process assembly (`_shard_batch_multiprocess`) must
  reproduce the plain device_put sharding exactly
  (`make_array_from_process_local_data` degenerates to it);
- the local row range is derived from the sharding's addressable
  indices, not process_index: an unsharded batch axis (cross-host
  tensor parallelism, data=1) must demand ALL rows on every host,
  and a sharded one must demand exactly the union of this host's
  shard spans;
- indivisible global batches fail loudly.
"""

import numpy as np
import pytest

from surya_tpu.core.mesh import (
    MeshSpec,
    _addressable_row_span,
    _shard_batch_multiprocess,
    create_mesh,
    data_sharding,
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
    via_mpl = tuple(_shard_batch_multiprocess(mesh8, x) for x in batch)
    for a, b in zip(via_put, via_mpl):
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_replicated_batch_axis_demands_all_rows():
    """data=1, model=8: every device replicates the batch, so every
    host must supply the FULL global batch — the process_index-slicing
    bug this guards against fed each host a divergent half."""
    mesh = create_mesh(MeshSpec(data=1, model=8))
    sh = data_sharding(mesh, 2)
    assert _addressable_row_span(sh, (16, 4)) == (0, 16)
    out = _shard_batch_multiprocess(mesh, np.arange(32.).reshape(16, 2))
    np.testing.assert_array_equal(
        np.asarray(out), np.arange(32.).reshape(16, 2))


def test_sharded_batch_axis_span_is_shard_union(mesh8):
    """data=8 in one process: the union of all 8 shard spans is the
    whole batch; in a real 2-host run each host's map would contain
    only its 4 shards and the span would be its contiguous half."""
    sh = data_sharding(mesh8, 2)
    assert _addressable_row_span(sh, (16, 4)) == (0, 16)


def test_mixed_mesh_span(mesh8):
    """data=4, model=2: model replicas share spans (deduped), the
    four data shards tile the batch."""
    mesh = create_mesh(MeshSpec(data=4, model=2))
    sh = data_sharding(mesh, 2)
    assert _addressable_row_span(sh, (8, 3)) == (0, 8)
    out = _shard_batch_multiprocess(mesh, np.arange(24.).reshape(8, 3))
    np.testing.assert_array_equal(
        np.asarray(out), np.arange(24.).reshape(8, 3))


def test_indivisible_batch_raises(mesh8):
    x = np.zeros((10, 4), np.float32)
    with pytest.raises(ValueError, match="not divisible"):
        _shard_batch_multiprocess(mesh8, x)
