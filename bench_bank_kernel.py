"""Microbench: fused Pallas bank-MLP vs the einsum path, inside a scan at
blessed ODE shapes (B=64, S=100, hand head n=32 / obj head n=3)."""
import json
import os
import time

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp

from vpho_tpu.ops.pallas_bank import fused_bank_mlp

B = int(os.environ.get("BENCH_BATCH", "64"))
S = int(os.environ.get("BENCH_SAMPLES", "100"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))


def run(name, n, D, O, use_pallas, group=1):
    C = 256
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    p0 = jax.random.normal(ks[0], (B * S, C), jnp.bfloat16)
    w1p = jax.random.normal(ks[1], (n, C, D), jnp.float32) * 0.05
    add = jax.random.normal(ks[2], (B, n, D), jnp.float32)
    w2 = jax.random.normal(ks[3], (n, D, O), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (n, O), jnp.float32) * 0.1

    @jax.jit
    def scan_fn(p0, seed):
        def step(p, _):
            out = fused_bank_mlp(p, w1p, add, w2, b2, S, use_pallas=use_pallas,
                                 group=group)
            # feed a slice of the output back so steps are serialized
            upd = out.reshape(B * S, n * O).sum(-1, keepdims=True)
            return (p + (upd * 1e-6 + seed * 1e-9).astype(p.dtype), None)
        return jax.lax.scan(step, p0, None, length=STEPS)[0]

    out = scan_fn(p0, jnp.float32(0))
    jax.block_until_ready(out)
    ts = []
    k = 1
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = scan_fn(p0, jnp.float32(k)); k += 1
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 3)
    ts.sort()
    per_eval = ts[1] / STEPS * 1e3
    print(json.dumps({"impl": name, "ms_per_eval": round(per_eval, 4)}), flush=True)


run("hand_einsum", 32, 256, 3, False)
run("hand_fused", 32, 256, 3, True)
run("hand_fused_g2", 32, 256, 3, True, group=2)
run("hand_fused_g4", 32, 256, 3, True, group=4)
run("obj_einsum", 3, 256, 3, False)
run("obj_fused", 3, 256, 3, True)
