"""Device mesh construction and sharding helpers.

The reference has no distributed code at all (single ``cuda:0`` everywhere,
e.g. ``Quadtree_from scratch/Quadtree_train.py:28``). This module is the one
place that owns multi-chip topology for the TPU build: a
``Mesh(('data','model','seq'))`` over the device grid, NamedShardings for
batch-axis data parallelism, and ``jax.distributed.initialize`` for
multi-host runs. All collectives are XLA ops inserted by the compiler from
sharding annotations — no hand-written communication outside shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
AXES = (DATA_AXIS, MODEL_AXIS, SEQ_AXIS)


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1
    model: int = 1
    seq: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        d, m, s = self.data, self.model, self.seq
        if d == -1:
            if n_devices % (m * s) != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by model*seq={m * s}")
            d = n_devices // (m * s)
        if d * m * s != n_devices:
            raise ValueError(
                f"mesh {d}x{m}x{s} != {n_devices} devices")
        return d, m, s


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX (DCN) if the coordinator env vars are set.

    Single-host (the common case, incl. tests) is a no-op.
    """
    import os

    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    # Idempotency must be checked WITHOUT touching the XLA backend:
    # jax.process_count() initializes it, after which
    # jax.distributed.initialize() unconditionally raises — so consult
    # the distributed client state instead.
    try:
        from jax._src.distributed import global_state
        already = global_state.client is not None
    except Exception:  # private API moved: assume not initialized
        already = False
    if not already:
        jax.distributed.initialize()


def create_mesh(spec: MeshSpec | None = None,
                devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a 3-axis ('data','model','seq') mesh over the device grid."""
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    d, m, s = spec.resolve(len(devices))
    grid = np.asarray(devices).reshape(d, m, s)
    return Mesh(grid, AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(MeshSpec(data=1), devices=jax.devices()[:1])


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded.

    Single-process (the common case): one ``device_put`` per leaf.

    Multi-host (``jax.distributed.initialize`` ran — SURVEY §5.8): every
    process builds the SAME global batch (data sources are seeded
    identically across hosts), the row range this host's devices
    actually address is cut out, and
    ``jax.make_array_from_process_local_data`` assembles the global
    array from per-process shards — no cross-host transfer; each host
    only feeds its own chips over PCIe, DCN carries nothing for input.
    The range comes from the sharding itself, NOT ``process_index``:
    when the batch axis is replicated over this host's devices (e.g. a
    cross-host tensor-parallel mesh with data=1) every host must supply
    ALL rows, and data shards need not align with process boundaries.
    Host-side decode cost still scales with the global batch under this
    scheme; the packed memmap cache (data/packed.py) makes that read
    ~free, which is why no per-host file-list sharding layer exists.
    """
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))),
            batch)
    return jax.tree.map(
        lambda x: _shard_batch_multiprocess(mesh, x), batch)


def _addressable_row_span(sharding: NamedSharding,
                          global_shape: tuple[int, ...]) -> tuple[int, int]:
    """Contiguous ``[start, stop)`` of global batch rows addressed by this
    process's devices, derived from the sharding's own index map.

    Replicas of an unsharded batch dim address all rows (start=0,
    stop=n); a data-sharded dim yields the union of this host's shard
    spans. jax's ``_array_from_process_local_data`` maps the local
    chunk onto shards by ranking shard start offsets, which requires
    the local rows to be exactly this union, in order — slicing by
    ``process_index`` instead silently feeds divergent data whenever
    shards don't align with process boundaries.
    """
    n = global_shape[0]
    idx_map = sharding.addressable_devices_indices_map(global_shape)
    spans = sorted({(sl[0].start or 0, n if sl[0].stop is None else sl[0].stop)
                    for sl in idx_map.values()})
    start, stop = spans[0]
    for s2, e2 in spans[1:]:
        if s2 != stop:
            raise ValueError(
                "addressable batch rows for this process are "
                f"non-contiguous ({spans}); reorder the mesh so each "
                "host's data shards are adjacent")
        stop = e2
    return start, stop


def _shard_batch_multiprocess(mesh: Mesh, x):
    """Assemble a globally-sharded array from this host's row range."""
    sharding = data_sharding(mesh, np.ndim(x))
    global_shape = np.shape(x)
    ddim = mesh.shape[DATA_AXIS]
    if global_shape[0] % ddim:
        raise ValueError(
            f"global batch {global_shape[0]} not divisible by "
            f"data-axis size {ddim}")
    start, stop = _addressable_row_span(sharding, global_shape)
    local = np.asarray(x)[start:stop]
    return jax.make_array_from_process_local_data(
        sharding, local, global_shape)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
