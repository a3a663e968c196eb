"""bf16 promotion gate: f32 vs bf16 compute-policy deltas of the FULL
predict pipeline with identical weights and inputs.

The bf16 policy (trunk/encoder/cross/denoiser matmuls in bfloat16, f32
params + all geometry/aggregation) is worth ~+11% eval throughput
(docs/PERF.md).  Promotion to default requires evidence the outputs move
far less than metric resolution (MJE/ADD are reported at 0.01 mm).  This
prints per-output deltas in mm plus hypothesis-selection agreement; run on
the real chip at blessed-ish shapes:

    python bench_precision.py            # bs=16, S=100, steps=50
"""
import json
import os

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import ModelConfig, VPHONet, forward_predict


def main():
    B = int(os.environ.get("BENCH_BATCH", "16"))
    S = int(os.environ.get("BENCH_SAMPLES", "100"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))

    cfg = ModelConfig(sample_num=S, sampling_steps=steps, topk_hand=30,
                      topk_obj=10, patch_size=256)
    ctx = V.make_context(cfg)
    batch = make_batch(ctx, jax.random.PRNGKey(0), B, 256)

    f32 = VPHONet()
    variables = f32.init({"params": jax.random.PRNGKey(1),
                          "dropout": jax.random.PRNGKey(2)}, batch, False)
    bf16 = VPHONet(compute_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(3)
    out32 = jax.jit(lambda v, b, r: forward_predict(f32, v, ctx, b, r))(
        variables, batch, rng)
    out16 = jax.jit(lambda v, b, r: forward_predict(bf16, v, ctx, b, r))(
        variables, batch, rng)

    def mm(a, b):
        d = np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64),
                           axis=-1)
        return float(d.mean() * 1000.0)

    rep = {
        "agg_hand_vert_mm": mm(out32["agg_hand_vert"], out16["agg_hand_vert"]),
        "agg_hand_joint_mm": mm(out32["agg_hand_joint"], out16["agg_hand_joint"]),
        "agg_obj_trans_mm": mm(out32["agg_obj_6d"][..., 6:],
                               out16["agg_obj_6d"][..., 6:]),
        "agg_obj_rot6d_abs": float(np.abs(
            np.asarray(out32["agg_obj_6d"][..., :6], np.float64)
            - np.asarray(out16["agg_obj_6d"][..., :6], np.float64)).mean()),
        "reg_hand_vert_mm": mm(out32["reg_hand_vert"], out16["reg_hand_vert"]),
        # one-candidate outputs measure raw ODE sensitivity (no aggregation)
        "one_hand_vert_mm": mm(out32["diff_final_hand_vert"][:, 0],
                               out16["diff_final_hand_vert"][:, 0]),
    }
    print(json.dumps({k: round(v, 4) for k, v in rep.items()}))


if __name__ == "__main__":
    main()
