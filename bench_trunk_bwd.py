"""Trunk-backward attribution probe (PERF.md follow-up).

bench_train_components.py measured trunk fwd ~16 ms vs trunk fwd+bwd ~87 ms
(bf16, bs=64, RTT-subtracted) -- a 4.4x bwd/fwd ratio where conv dgrad+wgrad
should be ~2-3x.  This probe isolates WHERE the backward time lives:

  * feature_extractor (dual ResNet-50 FPN) alone, fwd and fwd+bwd,
    in BN train mode (batch stats) vs eval mode (running stats), so the
    BN-backward reductions are attributable;
  * the trunk's post-FPN heads (roi_align, heatmap heads, realign,
    encoders, cross modules) by subtraction;
  * XLA cost analysis (FLOPs + bytes) per jit, so each stage gets an
    achieved-TFLOP/s / achieved-GB/s figure against the v5e roofline
    (197 bf16 TFLOP/s, 819 GB/s).

Knobs: BENCH_BATCH (64), BENCH_DTYPE (bfloat16), BENCH_ITERS (7).
Run: python bench_trunk_bwd.py            (real chip via axon)
"""
import json
import os
import time

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp

from vpho_tpu.configs.config import Config
from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.engine.trainer import create_train_state
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import VPHONet


def timed(fn, *args, iters):
    """Median wall ms; the last arg must be a seed scalar.

    Each call gets a DISTINCT seed value: the axon tunnel short-circuits
    re-executions with identical arguments (measured 0.22 ms for a 1.7
    TFLOP grad), so repeating the same args times nothing.
    """
    out = fn(*args, jnp.float32(0))
    jax.block_until_ready(out)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, jnp.float32(1 + i))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def cost(fn, *args):
    """XLA cost analysis: (GFLOPs, GB accessed) of the compiled fn."""
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return (c.get("flops", 0.0) / 1e9,
                c.get("bytes accessed", 0.0) / 1e9)
    except Exception:
        return (float("nan"), float("nan"))


def main():
    bs = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "7"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    cfg = Config(batch_size=bs, repeat_num=20, patch_size=256,
                 compute_dtype=dtype_name)
    ctx = V.make_context(cfg.to_model_config())
    model = VPHONet(compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16"
                    else None)
    batch = make_batch(ctx, jax.random.PRNGKey(0), bs, 256)
    state = create_train_state(model, ctx, cfg, batch, steps_per_epoch=100,
                               rng=jax.random.PRNGKey(206))
    rgb = batch["rgb"]
    res = {"dtype": dtype_name, "batch": bs}

    def fe_loss(params, rgb, seed, train):
        rgb = rgb + (seed * 1e-3).astype(rgb.dtype)
        variables = {"params": params, "batch_stats": state.batch_stats,
                     "buffers": state.buffers}
        if train:
            (h, o), _ = model.apply(
                variables, rgb, train=True, mutable=["batch_stats"],
                method=lambda m, x, train: m.feature_extractor(x, train=train))
        else:
            h, o = model.apply(
                variables, rgb, train=False,
                method=lambda m, x, train: m.feature_extractor(x, train=train))
        return (h.astype(jnp.float32).sum() + o.astype(jnp.float32).sum())

    def trunk_loss(params, data, seed, train):
        data = dict(data, rgb=data["rgb"] + (seed * 1e-3).astype(data["rgb"].dtype))
        variables = {"params": params, "batch_stats": state.batch_stats,
                     "buffers": state.buffers}
        kw = dict(method=VPHONet.trunk, rngs={"dropout": jax.random.PRNGKey(3)})
        if train:
            out, _ = model.apply(variables, data, True,
                                 mutable=["batch_stats"], **kw)
        else:
            out = model.apply(variables, data, False, **kw)
        return (out["encoding_hand"].sum() + out["pd_hm_hand"].sum()
                + out["pd_hm_obj"].sum() + out["encoding_obj"].sum()
                + out["pd_phy"]["scale"].sum())

    stages = {
        "fe_fwd_train": jax.jit(lambda p, x, s: fe_loss(p, x, s, True)),
        "fe_fwd_eval": jax.jit(lambda p, x, s: fe_loss(p, x, s, False)),
        "fe_bwd_train": jax.jit(jax.grad(lambda p, x, s: fe_loss(p, x, s, True))),
        "fe_bwd_eval": jax.jit(jax.grad(lambda p, x, s: fe_loss(p, x, s, False))),
        # full-remat A/B: the bwd above is HBM-bound (~80% roofline) at 28%
        # MXU -- recomputing the forward during backward trades saved-
        # activation reads for idle FLOPs
        "fe_bwd_remat": jax.jit(jax.grad(
            jax.checkpoint(lambda p, x, s: fe_loss(p, x, s, True)))),
    }
    only = os.environ.get("BENCH_STAGES", "")
    for name, fn in stages.items():
        if only and name not in only.split(","):
            continue
        ms = timed(fn, state.params, rgb, iters=iters)
        gflop, gb = cost(fn, state.params, rgb, jnp.float32(0))
        res[name] = {"ms": round(ms, 2), "gflop": round(gflop, 1),
                     "gb": round(gb, 2)}
        print(json.dumps({name: res[name]}), flush=True)

    tstages = {
        "trunk_fwd_train": jax.jit(lambda p, d, s: trunk_loss(p, d, s, True)),
        "trunk_bwd_train": jax.jit(jax.grad(lambda p, d, s: trunk_loss(p, d, s, True))),
        "trunk_bwd_eval": jax.jit(jax.grad(lambda p, d, s: trunk_loss(p, d, s, False))),
    }
    for name, fn in tstages.items():
        if only and name not in only.split(","):
            continue
        ms = timed(fn, state.params, batch, iters=iters)
        gflop, gb = cost(fn, state.params, batch, jnp.float32(0))
        res[name] = {"ms": round(ms, 2), "gflop": round(gflop, 1),
                     "gb": round(gb, 2)}
        print(json.dumps({name: res[name]}), flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
