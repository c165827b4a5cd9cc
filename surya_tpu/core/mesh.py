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
    identically across hosts), this host's contiguous row-slice is cut
    out, and ``jax.make_array_from_process_local_data`` assembles the
    global array from per-process shards — no cross-host transfer; each
    host only feeds its own chips over PCIe, DCN carries nothing for
    input. Host-side decode cost still scales with the global batch
    under this scheme; the packed memmap cache (data/packed.py) makes
    that read ~free, which is why no per-host file-list sharding layer
    exists.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))),
            batch)
    return jax.tree.map(
        lambda x: _shard_batch_multiprocess(mesh, x, nproc,
                                            jax.process_index()), batch)


def _shard_batch_multiprocess(mesh: Mesh, x, nproc: int, rank: int):
    """Assemble a globally-sharded array from this host's row slice."""
    n = np.shape(x)[0]
    if n % nproc:
        raise ValueError(
            f"global batch {n} not divisible by process count {nproc}")
    per = n // nproc
    local = np.asarray(x)[rank * per:(rank + 1) * per]
    return jax.make_array_from_process_local_data(
        data_sharding(mesh, np.ndim(x)), local)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
