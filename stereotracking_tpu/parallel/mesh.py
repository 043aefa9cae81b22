"""Device-mesh helpers: data-parallel training, multi-stream inference.

The reference scales by NCCL DDP over GPUs (SURVEY.md section 2.8); the
TPU-native equivalent is a ``jax.sharding.Mesh`` with the batch (training) or
stream (inference) axis sharded and parameters replicated — XLA inserts the
ICI collectives (gradient psum, global batch-norm means) automatically.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data',)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs[:n]).reshape(shape), axis_names)


def shard_batch(batch, mesh: Mesh, axis: str = 'data'):
    """Place every array in the pytree with its leading dim sharded.

    Single-process: a plain sharded ``device_put``.  Multi-process
    (``jax.distributed``): each process supplies its LOCAL slice of the
    global batch and the global array is assembled with
    ``make_array_from_process_local_data`` — global batch size is
    ``local_batch * process_count`` (DDP semantics, reference
    tools/train.py:42-47).
    """
    multiprocess = jax.process_count() > 1

    def put(x):
        spec = P(axis) if getattr(x, 'ndim', 0) >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multiprocess and spec != P():
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
