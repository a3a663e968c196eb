"""Train-step time attribution (real chip): decompose the full train step
into trunk-forward / trunk-fwd+bwd / full-loss fwd+bwd / +optimizer, so the
gap between the measured step time and the trunk's FLOPs bound is visible.

Each stage is its own jit; subtract the previous stage's median to
attribute.  Knobs: BENCH_BATCH (64), BENCH_DTYPE (float32), BENCH_ITERS (5).
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
from vpho_tpu.engine.trainer import create_train_state, make_train_step
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import VPHONet


def timed(fn, *args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def record(res, key, ms):
    res[key] = ms
    print(json.dumps({key: round(ms, 2)}), flush=True)


def main():
    bs = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    cfg = Config(batch_size=bs, repeat_num=20, patch_size=256,
                 compute_dtype=dtype_name)
    ctx = V.make_context(cfg.to_model_config())
    model = VPHONet(compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16"
                    else None)
    batch = make_batch(ctx, jax.random.PRNGKey(0), bs, 256)
    state = create_train_state(model, ctx, cfg, batch, steps_per_epoch=100,
                               rng=jax.random.PRNGKey(206))
    rng = jax.random.PRNGKey(1)
    res = {}

    @jax.jit
    def trunk_fwd(params, batch):
        variables = {"params": params, "batch_stats": state.batch_stats,
                     "buffers": state.buffers}
        out, _ = model.apply(variables, batch, True, method=VPHONet.trunk,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(3)})
        return out["encoding_hand"].sum() + out["pd_hm_hand"].sum()

    record(res, "trunk_fwd_ms", timed(trunk_fwd, state.params, batch, iters=iters))

    @jax.jit
    def trunk_fwd_bwd(params, batch):
        return jax.grad(lambda p: trunk_fwd(p, batch))(params)

    record(res, "trunk_fwd_bwd_ms", timed(trunk_fwd_bwd, state.params, batch, iters=iters))

    @jax.jit
    def full_fwd(params, batch):
        variables = {"params": params, "batch_stats": state.batch_stats,
                     "buffers": state.buffers}
        total, _, _ = V.forward_train(model, variables, ctx, batch, rng)
        return total

    record(res, "full_fwd_ms", timed(full_fwd, state.params, batch, iters=iters))

    @jax.jit
    def full_fwd_bwd(params, batch):
        return jax.grad(lambda p: full_fwd(p, batch))(params)

    record(res, "full_fwd_bwd_ms", timed(full_fwd_bwd, state.params, batch, iters=iters))

    step = make_train_step(model, ctx)
    st = state
    st, loss = step(st, batch, rng)
    jax.block_until_ready(loss)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        st, loss = step(st, batch, jax.random.fold_in(rng, i))
        jax.block_until_ready(loss)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    record(res, "full_step_ms", ts[len(ts) // 2] * 1e3)

    res = {k: round(v, 2) for k, v in res.items()}
    res["dtype"] = dtype_name
    res["batch"] = bs
    print(json.dumps(res))


if __name__ == "__main__":
    main()
