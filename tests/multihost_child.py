"""Child process for the REAL multi-process test (test_multihost.py).

Spawned N times; each process brings up jax.distributed over a localhost
coordinator with 1 CPU device, builds the global 1-D data mesh, runs a
psum-carrying jitted step on a batch-sharded array, and exercises the
host-side gather helpers (allgather_rows / host_local_rows /
host_local_indices).  Prints one JSON line for the parent to assert on.
"""
import json
import os
import sys


def main():
    coord = sys.argv[1]
    num = int(sys.argv[2])
    pid = int(sys.argv[3])

    # one CPU device per process: the mesh spans processes, not threads
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vpho_tpu.parallel import mesh as M

    rank = M.init_distributed(coordinator_address=coord, num_processes=num,
                              process_id=pid)
    assert rank == pid, (rank, pid)
    assert jax.process_count() == num

    import jax.numpy as jnp
    import numpy as np

    mesh = M.make_mesh()
    assert mesh.devices.size == num

    # batch-sharded input, replicated "params"; the jitted fn contains a
    # cross-process mean (the gradient-psum pattern)
    from jax.sharding import NamedSharding, PartitionSpec as P

    global_shape = (num * 2, 3)
    local = np.full((2, 3), float(pid), np.float32)
    arrs = [jax.device_put(local, jax.local_devices()[0])]
    x = jax.make_array_from_single_device_arrays(
        global_shape, NamedSharding(mesh, P("data")), arrs)

    @jax.jit
    def step(x):
        return x + x.mean()  # mean over the global batch -> all-reduce

    y = step(x)
    mean = sum(range(num)) / num
    own = M.host_local_rows(y)
    np.testing.assert_allclose(own, local + mean, rtol=1e-6)
    idx = M.host_local_indices(y, global_shape[0])
    np.testing.assert_array_equal(idx, np.arange(pid * 2, pid * 2 + 2))

    # metric-row gather: each process contributes one row; all see all
    rows = [{"v": np.array([pid, pid + 0.5], np.float32),
             "skipme": "non-numeric"}]
    pooled = M.allgather_rows(rows)
    assert len(pooled) == num
    got = sorted(float(r["v"][0]) for r in pooled)
    assert got == [float(i) for i in range(num)], got
    assert all("skipme" not in r for r in pooled)

    M.sync_processes("done")
    print(json.dumps({"pid": pid, "ok": True, "procs": jax.process_count()}))


if __name__ == "__main__":
    main()
