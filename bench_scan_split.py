"""Probe: what does the OBJECT portion of the fused 105-d ODE scan cost?

Times the real combined hand+obj scan (as forward_candidates builds it)
against a hand-only 96-d scan and an obj-only 9-d scan at blessed shapes.
combined - hand_only isolates the object head's in-scan cost (pose encoder
+ 3-bank einsum head + solver algebra on 9 dims) — the candidate saving if
the object head were folded into the hand head's Pallas kernel dispatch.
Group-fenced, fresh seed per call (axon short-circuit protocol).
"""
import json
import os
import time

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp

from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.diffusion.sampler import ode_sampler
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import ModelConfig, VPHONet, _score_fn

B = int(os.environ.get("BENCH_BATCH", "64"))
S = int(os.environ.get("BENCH_SAMPLES", "100"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
METHOD = os.environ.get("BENCH_METHOD", "dpm3m")


def timed(name, fn, iters=5, groups=3):
    out = fn(jnp.float32(0))
    jax.block_until_ready(out)
    ts, k = [], 1
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(jnp.float32(k))
            k += 1
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    print(json.dumps({"scan": name, "median_ms": round(ts[len(ts) // 2] * 1e3, 2)}),
          flush=True)


def main():
    cfg = ModelConfig(sample_num=S, sampling_steps=STEPS, topk_hand=30,
                      topk_obj=10, patch_size=256, compute_dtype="bfloat16",
                      ode_method=METHOD)
    ctx = V.make_context(cfg)
    model = VPHONet(compute_dtype=jnp.bfloat16)
    batch = make_batch(ctx, jax.random.PRNGKey(0), B, 256)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch, False)
    out = model.apply(variables, batch, False, method=VPHONet.trunk)

    score_h = _score_fn(model, variables, ctx.sde, "hand", out["encoding_hand"], S)
    score_o = _score_fn(model, variables, ctx.sde, "obj", out["encoding_obj"], S)

    def score_both(x, t):
        return jnp.concatenate([score_h(x[:, :96], t), score_o(x[:, 96:], t)],
                               axis=-1)

    def scan(score, dim):
        @jax.jit
        def run(seed):
            key = jax.random.fold_in(jax.random.PRNGKey(3), seed.astype(jnp.int32))
            return ode_sampler(score, key, B * S, dim, ctx.sde, cfg.sample_T0,
                               STEPS, method=METHOD, return_trajectory=False)[1]
        return run

    timed("combined_105d", scan(score_both, 105))
    timed("hand_only_96d", scan(score_h, 96))
    timed("obj_only_9d", scan(score_o, 9))


if __name__ == "__main__":
    main()
