"""On-chip throughput of the force_optim 3000-iteration refinement loop.

BASELINE.json config #4: the reference's offline pseudo-force labeling runs
3000 serial Adam iterations per batch with a host-side Python loop
(lib/engine/force_optimization.py:110-207).  Ours jits the entire two-phase
loop (engine/force_optim.py optimize_forces) — this measures samples/s at
reference batch shapes on one chip.

Env: BENCH_BATCH (64), BENCH_ITERS (3).
Prints one JSON line (metric force_optim_throughput, samples/sec/chip).
"""
import json
import os
import time

import numpy as np

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax


def main():
    B = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    from vpho_tpu.engine.force_optim import optimize_forces
    from vpho_tpu.models import anchor as anchor_lib
    from vpho_tpu.models.mano import load_mano

    tables = anchor_lib.load_anchor_tables(load_mano(side="right"))
    rng = np.random.RandomState(0)
    force_contact = (rng.rand(B, 32) > 0.6).astype(np.float32) * rng.rand(B, 32)
    vert3d = rng.randn(B, 778, 3).astype(np.float32) * 0.08
    gravity = np.tile(np.array([[[0.0, 1.0, 0.0]]], np.float32), (B, 1, 1))
    com = np.zeros((B, 1, 3), np.float32)

    out = optimize_forces(force_contact, vert3d, gravity, com, tables)
    jax.block_until_ready(out)

    times = []
    for i in range(iters):
        fc = force_contact * np.float32(1.0 + 1e-6 * (i + 1))  # defeat the
        t0 = time.perf_counter()                               # tunnel cache
        out = optimize_forces(fc, vert3d, gravity, com, tables)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    print(json.dumps({
        "metric": "force_optim_throughput",
        "value": round(B / dt, 2),
        "unit": "samples/sec/chip",
        "batch": B,
        "ms_per_batch_3000_iters": round(1000 * dt, 1),
    }))


if __name__ == "__main__":
    main()
