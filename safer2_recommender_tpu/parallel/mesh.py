"""Device mesh and sharding helpers.

The reference has **no** communication backend — its "parallel runtime" is a
POSIX-thread work queue with a mutex-guarded iterator copy-pasted into every
model (e.g. reference ials.h:326-361, safer2.h:445-490). The TPU-native
replacement is SPMD over a 1-D `jax.sharding.Mesh`:

  * axis "data": users (or items) rows. All per-row independent work — the
    normal-equation assembly einsums, the batched Cholesky solves, the
    per-user loss/dual computations, and evaluation scoring — shards over
    this axis.
  * d x d Gramians and quantile statistics are tiny and latency-bound;
    XLA inserts `psum`-style all-reduces over ICI for them automatically
    when the batch inputs are sharded and the outputs are replicated.

Single-device execution degrades to no-ops: every helper accepts
``mesh=None`` and then simply places arrays on the default device.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Optional[Sequence[Any]] = None,
             axis_name: str = DATA_AXIS) -> Mesh:
    """Build a 1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def row_sharding(mesh: Optional[Mesh], ndim: int,
                 axis_name: str = DATA_AXIS) -> Optional[NamedSharding]:
    """Sharding that splits the leading (row) axis over the mesh."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


# A SINGLE >= 512 MB host->device transfer never completes over the
# tunneled TPU runtime (measured round 3: a bare jax.device_put of a
# 512 MB ones() hangs and wedges the chip; 256 MB completes — this was
# the true cause of the round-1 "factored-solve hang", see
# ops/block_chol.py). Large host arrays are therefore shipped in row
# chunks and concatenated on device.
_TRANSFER_CHUNK_BYTES = 128 * 1024 * 1024


def _chunked_put(x, sharding):
    x = np.asarray(x)
    row_bytes = x.nbytes // x.shape[0]
    if row_bytes > _TRANSFER_CHUNK_BYTES:
        # A single row exceeds the transfer budget (rows would clamp to
        # 1 and each per-chunk transfer would still hang the tunneled
        # runtime): chunk the FLATTENED array by elements and reshape
        # on device instead.
        flat = x.reshape(-1)
        elems = max(1, _TRANSFER_CHUNK_BYTES // x.itemsize)
        parts = [jax.device_put(flat[i:i + elems])
                 for i in range(0, flat.size, elems)]
        shape = x.shape
        cat = lambda *p: jnp.concatenate(p).reshape(shape)  # noqa: E731
        out_sh = sharding
        if out_sh is None and jax.default_backend() != "cpu":
            out_sh = jax.sharding.SingleDeviceSharding(
                parts[0].devices().pop())
        if out_sh is None:
            return jax.jit(cat)(*parts)
        return jax.jit(cat, out_shardings=out_sh)(*parts)
    rows = max(1, _TRANSFER_CHUNK_BYTES // max(1, row_bytes))
    parts = [jax.device_put(x[i:i + rows])
             for i in range(0, x.shape[0], rows)]
    out_sh = sharding
    if out_sh is None and jax.default_backend() != "cpu":
        out_sh = jax.sharding.SingleDeviceSharding(parts[0].devices().pop())
    cat = lambda *p: jnp.concatenate(p, axis=0)  # noqa: E731
    if out_sh is None:
        return jax.jit(cat)(*parts)
    return jax.jit(cat, out_shardings=out_sh)(*parts)


def put(x, sharding):
    """device_put honoring ``sharding=None`` (single-device).

    When the sharding spans multiple processes (a multi-host mesh from
    ``jax.distributed.initialize``), ``jax.device_put`` cannot target
    non-addressable devices; every process holds the same full host
    array (each host parses the full CSV), so the global array is
    assembled from each process's addressable shards instead.

    Host arrays above _TRANSFER_CHUNK_BYTES transfer in row chunks (see
    above) on the single-process paths.
    """
    if (jax.process_count() > 1 and sharding is not None
            and not sharding.is_fully_addressable):
        # global_shape must be passed explicitly: without it the helper
        # assumes each process holds only ITS slice and scales the
        # sharded dimension by process_count — but every host here has
        # the same full array, so that would concatenate the copies
        # (every bucket process_count-times too long).
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=x.shape)
    if (not isinstance(x, jax.Array) and np.ndim(x) > 0
            and np.asarray(x).nbytes > _TRANSFER_CHUNK_BYTES):
        # _chunked_put also handles the single-huge-row case by
        # element-chunking the flattened array
        return _chunked_put(x, sharding)
    if sharding is None:
        return jax.device_put(x)
    return jax.device_put(x, sharding)


def to_host(x) -> np.ndarray:
    """``np.asarray`` that also works for multi-process global arrays.

    A jitted program over a multi-host mesh can return row-sharded
    outputs whose shards live partly on other processes' devices;
    ``np.asarray`` on those raises. Replicate first (an all-gather over
    the array's own mesh), then convert."""
    if isinstance(x, jax.Array) and not (x.is_fully_addressable
                                         or x.is_fully_replicated):
        sh = NamedSharding(x.sharding.mesh, P())
        x = jax.jit(lambda a: a, out_shardings=sh)(x)
    return np.asarray(x)


def shard_pytree_rows(tree, mesh: Optional[Mesh]):
    """Shard every array leaf of a pytree along its leading axis;
    scalar (0-d) leaves replicate."""
    if mesh is None:
        return jax.tree_util.tree_map(lambda x: put(x, None), tree)

    def _shard(x):
        nd = np.ndim(x)
        sh = row_sharding(mesh, nd) if nd else replicated(mesh)
        return put(x, sh)

    return jax.tree_util.tree_map(_shard, tree)


def num_shards(mesh: Optional[Mesh]) -> int:
    return 1 if mesh is None else int(np.prod(list(mesh.shape.values())))
