"""Component-level latency breakdown of the predict pipeline (not the driver
bench contract — that's bench.py).  Times trunk / hand ODE / obj ODE /
aggregation separately at the blessed shapes to direct optimization work.
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
from vpho_tpu.models import aggregation as agg
from vpho_tpu.models.vpho import ModelConfig, VPHONet, _score_fn, postprocess_diffusion_hand
from vpho_tpu.models.mano import hand_verts_meters


def timed(name, fn, *args, iters=5, groups=3):
    """Median group-fenced wall ms; ``fn``'s last parameter must be a seed.

    Each call gets a DISTINCT seed: the axon tunnel short-circuits
    re-executions with bit-identical arguments (measured 0.22 ms for a
    1.7 TFLOP grad), so repeating the same args times nothing.  Calls are
    dispatched async in groups of ``iters`` with ONE fence per group —
    per-call fencing pays the full host<->device RTT (~30 ms on this
    tunnel), which at these shapes can exceed the kernel itself.
    """
    out = fn(*args, jnp.float32(0))
    jax.block_until_ready(out)
    ts = []
    k = 1
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, jnp.float32(k))
            k += 1
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    print(json.dumps({"component": name, "median_ms": round(ts[len(ts) // 2] * 1e3, 2)}))
    return out


def main():
    B = int(os.environ.get("BENCH_BATCH", "16"))
    S = int(os.environ.get("BENCH_SAMPLES", "100"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    method = os.environ.get("BENCH_METHOD", "heun")
    cfg = ModelConfig(sample_num=S, sampling_steps=steps, topk_hand=30,
                      topk_obj=10, patch_size=256, compute_dtype=dtype_name,
                      ode_method=method)
    ctx = V.make_context(cfg)
    model = VPHONet(compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16" else None)
    batch = make_batch(ctx, jax.random.PRNGKey(0), B, 256)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch, False)

    trunk = jax.jit(lambda v, b, s: model.apply(
        v, dict(b, rgb=b["rgb"] + (s * 1e-3).astype(b["rgb"].dtype)),
        False, method=VPHONet.trunk))
    out = timed("trunk", trunk, variables, batch)

    score_h = _score_fn(model, variables, ctx.sde, "hand", out["encoding_hand"], S)
    ode_h = jax.jit(lambda r, s: ode_sampler(score_h, jax.random.fold_in(r, s.astype(jnp.int32)),
                                             B * S, 96, ctx.sde,
                                             cfg.sample_T0, steps, method=method,
                                             return_trajectory=False)[1])
    final_h = timed("hand_ode", ode_h, jax.random.PRNGKey(3))

    score_o = _score_fn(model, variables, ctx.sde, "obj", out["encoding_obj"], S)
    ode_o = jax.jit(lambda r, s: ode_sampler(score_o, jax.random.fold_in(r, s.astype(jnp.int32)),
                                             B * S, 9, ctx.sde,
                                             cfg.sample_T0, steps, method=method,
                                             return_trajectory=False)[1])
    final_o = timed("obj_ode", ode_o, jax.random.PRNGKey(4))

    hand_mano = postprocess_diffusion_hand(final_h, out["pd_mano_shape"], S)
    fk = jax.jit(lambda hm, s: hand_verts_meters(
        ctx.mano, hm[..., :48] + (s * 1e-6).astype(hm.dtype), hm[..., 48:]))
    timed("fk_all_hypotheses", fk, hand_mano)

    def run_agg(hm, fo, s):
        hm = hm + (s * 1e-6).astype(hm.dtype)
        return agg.hoi_aggregate(
            ctx.mano, ctx.registry, ctx.anchor_tables,
            cam_intrinsic=batch["cam_intr_crop_flip"],
            root_joint_flip=batch["root_joint_flip"],
            root_joint=batch["root_joint"], is_right=batch["is_right"],
            force_local=out["pd_phy"]["force_local"],
            is_grasped=batch["is_grasped"],
            hand_pose_diff=hm[..., :48], hand_pose_regression=out["pd_mano_pose"],
            hand_shape=hm[..., 48:], hand_heatmap=out["pd_hm_hand"],
            hand_bbox=batch["bbox_hand"], hand_topk=cfg.topk_hand,
            obj_pose6d=fo.reshape(B, S, 9), obj_heatmap=out["pd_hm_obj"],
            obj_bbox=batch["bbox_obj_rect"], obj_topk=cfg.topk_obj,
            obj_ids=batch["obj_id"])["hand_agg_vert"]

    timed("aggregation", jax.jit(run_agg), hand_mano, final_o)


if __name__ == "__main__":
    main()
