"""Device-mesh utilities: SPMD data parallelism over ICI.

The reference's only multi-device strategy is single-node DDP via Accelerate/
NCCL (SURVEY.md §2.10).  TPU-native equivalent: a 1-D ``data`` mesh with
batch-sharded inputs and replicated params — XLA inserts the gradient
all-reduce (psum) during jit; barriers/gather_for_metrics become free SPMD
semantics + a host-side ``process_allgather`` for pickled metric objects on
multi-host.

Scaling axes beyond DP (tp/pp/sp/ep) are not required for parity (the model
is ~70M params; max attention length is 65 tokens) but the mesh helper
accepts extra axes so larger variants can shard the hypothesis dimension.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host bring-up: ``jax.distributed.initialize``.

    The reference's equivalent is Accelerate's torch.distributed/NCCL init
    (base_trainer.py:22, rdzv via ddp01.yaml).  On TPU pods the three args
    are auto-discovered from the environment; on CPU/GPU fleets pass them
    explicitly.  No-op when already initialized or when single-process.
    Returns the process index.
    """
    # NOTE: do NOT touch jax.process_count()/devices() before initialize() —
    # any backend query instantiates the local backend, after which
    # initialize() always raises (and multi-host setup silently never
    # happens; caught in r2 code review)
    if jax.distributed.is_initialized():
        return jax.process_index()
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        if coordinator_address is not None or (num_processes or 1) > 1:
            # the caller explicitly asked for multi-process: failing to
            # bring it up must be loud, not a silent N-way duplicated run
            raise
        # no coordinator configured/discoverable -> single-process; fine,
        # SPMD still works across the local devices
    return jax.process_index()


def allgather_rows(rows):
    """Pool per-process lists of ``{str: np.ndarray}`` rows across hosts —
    the ``gather_for_metrics(use_gather_object=True)`` replacement
    (train_diff_hand_obj.py:333-335).  Single-process: identity.

    ``multihost_utils.process_allgather`` returns the SAME pytree with each
    array leaf stacked on a new leading process axis (not a per-process
    list), so the stacked leaves are split back into one row per process
    here.  Requires equal leaf shapes across processes (eval rows satisfy
    this: every process scores its equal-size batch slice, padding masked
    by a ``_valid`` column rather than filtered).  Non-array values cannot
    cross hosts and are dropped — reconstruct them from an index column.
    """
    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils

    out = []
    for r in rows:
        arrays = {}
        for k, v in r.items():
            a = np.asarray(v)
            if a.dtype.kind in "biufc":  # numeric/bool leaves only
                arrays[k] = a
        stacked = multihost_utils.process_allgather(arrays, tiled=False)
        for p in range(jax.process_count()):
            out.append({k: v[p] for k, v in stacked.items()})
    return out


def host_local_rows(x):
    """This process's rows of a batch-sharded array, as host numpy.

    Under multi-host SPMD a jitted output spans non-addressable devices and
    ``np.asarray`` on it raises; each process must extract only the rows it
    owns (also preventing every sample being scored process_count times).
    Fully-addressable arrays (single host) return all rows unchanged.
    """
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def host_local_indices(x, n: int) -> np.ndarray:
    """Global row indices this process owns in a batch-sharded array of
    leading size ``n`` (for slicing host-side columns like _valid/_index
    consistently with :func:`host_local_rows`)."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.arange(n)
    parts = []
    for s in sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0):
        sl = s.index[0]
        parts.append(np.arange(sl.start or 0, sl.stop if sl.stop is not None else n))
    return np.concatenate(parts)


def sync_processes(name: str = "barrier"):
    """accel.wait_for_everyone() equivalent (train_diff_hand_obj.py:140)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over ALL addressable devices (all hosts' devices on a
    pod — jax.devices() is global under multi-host SPMD)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch with the leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to(batch: Dict[str, Any], size: int):
    """Pad the leading axis to ``size`` (repeat last element), with a mask.

    Eval shards must divide the mesh size; the returned ``valid`` mask lets
    metric reducers drop the padding (replaces torch's drop_last=False +
    gather_for_metrics de-duplication).
    """
    import numpy as np

    n = next(iter(batch.values())).shape[0]
    valid = np.zeros((size,), bool)
    valid[:n] = True
    if n == size:
        return batch, valid

    def pad(x):
        reps = np.concatenate([x, np.repeat(x[-1:], size - n, axis=0)], axis=0)
        return reps

    return {k: pad(np.asarray(v)) for k, v in batch.items()}, valid
