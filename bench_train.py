"""Train-step throughput at the blessed training config (not the driver
contract — that's bench.py, eval).  One chip, synthetic batch, full loss
surface (diffusion score losses + heatmap + mano + physics), fenced median.

Reference anchor: the blessed 45-epoch run is 2-GPU DDP at global bs=64
(BASELINE.md); per-chip fair comparison is bs=32/chip, but we report the
single-chip bs=64 step rate (what --num_devices 1 training runs).
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


def main():
    bs = int(os.environ.get("BENCH_BATCH", "64"))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    cfg = Config(batch_size=bs, repeat_num=20, patch_size=256,
                 compute_dtype=dtype_name)
    ctx = V.make_context(cfg.to_model_config())
    model = VPHONet(compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16"
                    else None)
    batch = make_batch(ctx, jax.random.PRNGKey(0), bs, 256)
    state = create_train_state(model, ctx, cfg, batch, steps_per_epoch=100,
                               rng=jax.random.PRNGKey(206))
    step = make_train_step(model, ctx)

    state, loss = step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(loss)
    times = []
    for i in range(int(os.environ.get("BENCH_ITERS", "5"))):
        t0 = time.perf_counter()
        state, loss = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i))
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    print(json.dumps({
        "metric": "train_throughput",
        "value": round(bs / dt, 3),
        "unit": "frames/sec/chip",
        "step_ms": round(dt * 1e3, 2),
        "total_loss": float(loss["total_loss"]),
    }))


if __name__ == "__main__":
    main()
