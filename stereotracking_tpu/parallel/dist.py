"""Multi-process (multi-host) runtime helpers.

TPU-native analog of the reference's launcher + collective plumbing
(/root/reference/tools/train.py:42-47 ``--launcher`` init;
mmtrack/evaluation/metrics/mot_drone_metrics.py:323-362
``all_gather_object`` / broadcast): a thin wrapper around
``jax.distributed`` plus a pickle-based object all-gather built on
``multihost_utils.process_allgather``.

Environment variables (used when CLI flags are absent, mirroring the
reference's env-driven launchers):
    STTPU_COORDINATOR   coordinator address, e.g. ``localhost:9511``
    STTPU_NUM_PROCESSES total process count
    STTPU_PROCESS_ID    this process's rank
"""
from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional, Tuple

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize the JAX distributed runtime; returns (rank, world_size).

    No-op (0, 1) when neither arguments nor STTPU_* env vars request a
    multi-process run.
    """
    import jax

    coordinator = coordinator or os.environ.get('STTPU_COORDINATOR')
    if num_processes is None and 'STTPU_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['STTPU_NUM_PROCESSES'])
    if process_id is None and 'STTPU_PROCESS_ID' in os.environ:
        process_id = int(os.environ['STTPU_PROCESS_ID'])

    if not num_processes or num_processes == 1:
        return 0, 1
    # Generous shutdown barrier: ranks compile their programs
    # independently, and on a cold compilation cache the slowest rank can
    # trail the fastest by more than the 300 s default (observed in the
    # 2-process CPU eval test), which fails the coordination-service
    # shutdown barrier even though both ranks finish correctly.
    shutdown_timeout = int(os.environ.get('STTPU_SHUTDOWN_TIMEOUT', '1200'))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               shutdown_timeout_seconds=shutdown_timeout)
    # Establish the Gloo CPU-collective context NOW, while the ranks are
    # still in lockstep: the context's key-value address exchange has a
    # hard 30 s timeout inside XLA, and the first real collective happens
    # only after each rank independently compiles + evaluates its share —
    # a skew that routinely exceeds 30 s on a cold compile cache
    # ("Gloo context initialization failed: GetKeyValue() timed out").
    # A coordination-service barrier bounds the skew to ~ms, then a tiny
    # allgather creates the context for the device set.
    from jax.experimental import multihost_utils
    import jax.numpy as jnp
    multihost_utils.sync_global_devices('sttpu_dist_init')
    multihost_utils.process_allgather(jnp.zeros((1,), jnp.int32))
    return jax.process_index(), jax.process_count()


def rank_world() -> Tuple[int, int]:
    import jax
    return jax.process_index(), jax.process_count()


def allgather_pyobj(obj: Any) -> List[Any]:
    """Gather one picklable object from every process (identity at world 1).

    Objects are pickled, zero-padded to the global max length, all-gathered
    as uint8 tensors over the distributed runtime, and unpickled per rank —
    the analog of torch.distributed's ``all_gather_object``.
    """
    import jax
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        np.asarray([blob.size], np.int64))).reshape(-1)
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[:blob.size] = blob
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(lens), -1)
    return [pickle.loads(gathered[r, :int(lens[r])].tobytes())
            for r in range(len(lens))]
