"""Benchmark: per-chip eval throughput of the full predict pipeline.

Runs the flagship configuration (trunk + batched diffusion sampling over
bs x sample_num hypotheses + 5-stage HOI aggregation) on one chip and prints
ONE JSON line: frames/sec/chip.

The baseline constant below is the reference's CUDA eval throughput for the
blessed config (batch 64, S=100, 50 ODE steps, topk 30/10) — the reference
publishes no number (BASELINE.md), so we anchor on the north-star target of
beating the scipy-RK45-bound reference pipeline; vs_baseline is computed
against an estimated 2.0 frames/s/GPU for that host-bound loop.
"""
import json
import os
import sys
import time


import jax
import jax.numpy as jnp

from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import ModelConfig, VPHONet, forward_predict

# estimated reference throughput (frames/s per GPU) for the blessed eval
# config — the scipy-RK45 ODE sampler alone runs 50 adaptive steps of
# host-side integration per batch (score_based_model.py:91)
BASELINE_FPS = 2.0


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    sample_num = int(os.environ.get("BENCH_SAMPLES", "100"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    method = os.environ.get("BENCH_METHOD", "rk4")
    cfg = ModelConfig(sample_num=sample_num, sampling_steps=steps,
                      topk_hand=30, topk_obj=10, patch_size=256,
                      compute_dtype=dtype_name, ode_method=method)
    ctx = V.make_context(cfg)
    model = VPHONet(compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16" else None)

    batch = make_batch(ctx, jax.random.PRNGKey(0), batch_size, 256)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch, False)

    fn = jax.jit(lambda v, b, r: forward_predict(model, v, ctx, b, r))
    rng = jax.random.PRNGKey(3)

    # compile + warmup
    out = fn(variables, batch, rng)
    jax.block_until_ready(out)

    # fence EVERY iteration and take the median: a single stale/async future
    # must not produce a bogus headline number
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(variables, batch, jax.random.fold_in(rng, i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]

    fps = batch_size / dt
    print(json.dumps({
        "metric": "eval_throughput",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
