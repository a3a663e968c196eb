"""XLA cost analysis (FLOPs + bytes) of the predict pipeline and its pieces.

Computes rooflines for the blessed eval config: with v5e peak ~197 TFLOP/s
bf16 and ~819 GB/s HBM, prints per-component min-time bounds so measured
times can be attributed to compute vs bandwidth vs overhead.
"""
import json
import os

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp

from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.engine.profiling import flops_of
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import ModelConfig, VPHONet, forward_predict

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BW = 819e9      # v5e HBM bytes/s


def report(name, fn, *args):
    c = flops_of(fn, *args)
    t_flop = c["flops"] / PEAK_FLOPS * 1e3
    t_bw = c["bytes_accessed"] / PEAK_BW * 1e3
    print(json.dumps({
        "component": name,
        "gflops": round(c["flops"] / 1e9, 1),
        "gbytes": round(c["bytes_accessed"] / 1e9, 2),
        "min_ms_compute": round(t_flop, 2),
        "min_ms_hbm": round(t_bw, 2),
    }))


def main():
    B = int(os.environ.get("BENCH_BATCH", "64"))
    S = int(os.environ.get("BENCH_SAMPLES", "100"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    method = os.environ.get("BENCH_METHOD", "dpm2m")
    cfg = ModelConfig(sample_num=S, sampling_steps=steps, topk_hand=30,
                      topk_obj=10, patch_size=256, compute_dtype=dtype_name,
                      ode_method=method)
    ctx = V.make_context(cfg)
    model = VPHONet(compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16" else None)
    batch = make_batch(ctx, jax.random.PRNGKey(0), B, 256)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch, False)

    report("trunk", lambda v, b: model.apply(v, b, False, method=VPHONet.trunk),
           variables, batch)
    report("fpn_only", lambda v, b: model.apply(
        v, b["rgb"], False,
        method=lambda m, rgb, train: m.feature_extractor(rgb, train=train)),
        variables, batch)
    report("full_predict",
           lambda v, b, r: forward_predict(model, v, ctx, b, r),
           variables, batch, jax.random.PRNGKey(3))


if __name__ == "__main__":
    main()
