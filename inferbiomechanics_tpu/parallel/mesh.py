"""Device mesh construction and sharding rules.

Capability parity: the reference's entire distributed story is DDP over
NCCL — one process per GPU, DistributedSampler data sharding, implicit
gradient all-reduce, rank-0 checkpointing (SURVEY.md §2.10). The
TPU-native equivalent here is SPMD over a ``jax.sharding.Mesh``:

- a ``data`` axis shards the batch dimension; parameters/optimizer state
  are replicated on it. XLA inserts the gradient all-reduce (psum) over
  ICI during pjit compilation — there is no explicit process group,
  barrier, or reduce call anywhere in the framework.
- a ``model`` axis is reserved for tensor-parallel sharding of the larger
  models (diffusion backbone); with size 1 everything below reduces to
  pure data parallelism.
- multi-host: ``jax.distributed.initialize`` + per-host window sharding
  in the loader (``WindowDataset.batches(shard_index=process_index)``)
  replace DistributedSampler.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'
CONFIG_AXIS = 'config'   # hyperparameter-sweep grid axis (train/sweep.py)


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With the default ``model_parallel=1`` this is a pure data-parallel
    mesh. Device order follows ``jax.devices()`` so the data axis rides
    ICI within a slice.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f'{n} devices not divisible by model_parallel={model_parallel}')
    arr = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_sweep_mesh(k_configs: int,
                    n_devices: Optional[int] = None,
                    devices: Optional[Sequence] = None) -> Mesh:
    """2-D (config, data) mesh for sweeps over pod-sharded datasets.

    The config axis gets the largest divisor of the device count that
    also divides K (so the [K, ...] grid state shards evenly); the rest
    of the devices form the data axis carrying the trial shards. With
    K coprime to the device count this degenerates to a pure data mesh
    (config axis 1) — the caller can detect that via ``mesh.shape``.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    c = 1
    for cand in range(min(k_configs, n), 0, -1):
        if n % cand == 0 and k_configs % cand == 0:
            c = cand
            break
    arr = np.array(devs).reshape(c, n // c)
    return Mesh(arr, (CONFIG_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sh):
    """device_put that is multi-host safe: on multi-process clusters the
    caller's array is its process-local shard (or a replicated copy)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def shard_batch(mesh: Mesh, *arrays):
    """Place host batch arrays with the batch dim split on `data`."""
    sh = batch_sharding(mesh)
    out = tuple(_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, sh), tree)
