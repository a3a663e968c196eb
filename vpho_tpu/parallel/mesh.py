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
    if jax.process_count() > 1:
        return jax.process_index()
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process (no coordinator found): fine — SPMD still works
        # across the local devices
        pass
    return jax.process_index()


def process_allgather(obj):
    """Host-side all-gather of arbitrary pytrees across processes — the
    ``gather_for_metrics(use_gather_object=True)`` replacement
    (train_diff_hand_obj.py:333-335).  Single-process: identity list."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))


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
