"""Benchmark: per-chip eval throughput of the full predict pipeline.

Runs the flagship configuration (trunk + batched diffusion sampling over
bs x sample_num hypotheses + 5-stage HOI aggregation) on one chip and prints
ONE JSON line: frames/sec/chip.

The baseline is MEASURED from the reference's own code on this host
(``bench_reference.py`` -> BASELINE_MEASURED.json): the reference's eval is
bound by its host-side scipy-RK45 sampler (score_based_model.py:45-105, one
denoiser forward per RHS eval at bs*S=6400).  We use the OPTIMISTIC estimate
of the CUDA reference (measured host scaffolding + measured nfev x denoiser
FLOPs at an assumed 10 TFLOP/s effective GPU) as the denominator — i.e. we
compare against the reference at its best, not its torch-CPU floor (0.141
fps on this host).  Methodology in BASELINE.md.
"""
import json
import os
import sys
import time


from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp

from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import ModelConfig, VPHONet, forward_predict

# measured optimistic-GPU reference throughput (frames/s) for the blessed
# eval config; falls back to the checked-in measurement if the json is absent
BASELINE_FPS = 2.471
try:
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE_MEASURED.json")) as _f:
        BASELINE_FPS = float(json.load(_f)["ref_gpu_fps_optimistic"])
except (OSError, KeyError, ValueError):
    pass


def main():
    # blessed eval config (BASELINE.md): batch 64, S=100, 50 ODE steps
    batch_size = int(os.environ.get("BENCH_BATCH", "64"))
    sample_num = int(os.environ.get("BENCH_SAMPLES", "100"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    # bf16 compute is the bench default: the promotion gate
    # (tests/test_torch_parity.py::test_ode_sampler_vs_reference_cond_ode_sampler)
    # shows the bf16 heun@50 end-state error (0.0381) stays INSIDE the
    # reference's own RK45 integration-error band (0.0462) — the dtype is
    # not the accuracy bottleneck, the shared integration budget is.
    # dpm3m default: DPM-Solver++(3M), one score eval per step at 3rd
    # order; same promotion gate as heun/dpm2m/bf16 (end-state error 0.0314
    # vs dpm2m 0.0358 / heun 0.0360, all inside the reference RK45's own
    # 0.0462 band) at identical cost to dpm2m (874.9 vs 856.3 f/s measured,
    # within host swing; docs/PERF.md r4)
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    method = os.environ.get("BENCH_METHOD", "dpm3m")
    from vpho_tpu.utils import transforms as T

    T.set_quat_mean_impl(os.environ.get("BENCH_QUAT", T.QUAT_MEAN_IMPL))
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

    # fence every GROUP and take the median group: chaining `chain` async
    # dispatches per fence amortizes the host<->device RTT (~30 ms on this
    # tunnel, i.e. up to 15% of a bs=64 iteration if fenced singly) — this is
    # the steady-state serving throughput; a stale future still can't fake a
    # good number because each group is bounded by its own fence
    chain = int(os.environ.get("BENCH_CHAIN", "4"))

    def run_groups(n, base):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            for j in range(chain):
                out = fn(variables, batch,
                         jax.random.fold_in(rng, base + i * chain + j))
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / chain)
        return ts

    # report median/min/spread over groups so round-over-round deltas are
    # attributable (host/tunnel swing vs a real regression); if the spread
    # exceeds 3% of the median, double the group count once and remeasure
    times = run_groups(iters, 0)
    s = sorted(times)
    med = s[len(s) // 2]
    spread = (s[-1] - s[0]) / med
    if spread > 0.03:
        times += run_groups(iters, 10_000)
        s = sorted(times)
        med = s[len(s) // 2]
        spread = (s[-1] - s[0]) / med

    fps = batch_size / med
    print(json.dumps({
        "metric": "eval_throughput",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "fps_best": round(batch_size / s[0], 3),
        "spread_pct": round(100 * spread, 2),
        "groups": len(times),
    }))


if __name__ == "__main__":
    main()
