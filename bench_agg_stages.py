"""Stage-level latency breakdown INSIDE hoi_aggregate (perf tooling, not the
driver bench contract — that's bench.py).

bench_components.py puts ~40 ms (RTT-subtracted, bf16 default, bs=64) into
"aggregation" as one number.  This probe times the five orchestration stages
(SURVEY.md §2.6 / reference aggregation.py:1160-1353) separately at blessed
shapes so the next optimization target is a measurement, not a guess:

  1. hand_heatmap_cascade      (5 levels x joints-FK over 2S candidates)
  2. obj_topk_by_heatmap (B,S) (kpt27 projection + bicubic heat sampling)
  3. stage-4 re-rank           (k^2 candidates: heatmap + physics3 paths,
                                2048-vert distance matrices)
  4. hand_physics_rerank       (K+1 full-FK 778-vert candidates vs object)
  5. fused-object transform    (verts + CoM + flips)

Every timed call folds a distinct seed into the candidate tensors: the axon
tunnel short-circuits re-executions with bit-identical arguments (measured
0.22 ms for a 1.7 TFLOP grad), so repeating the same args times nothing.

Knobs: BENCH_BATCH (64), BENCH_SAMPLES (100), BENCH_DTYPE (bfloat16 policy
for the trunk that produces the inputs), BENCH_ITERS (7).
"""
import json
import os
import time

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp

from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.utils import transforms as T_mod

T_mod.set_quat_mean_impl(os.environ.get("BENCH_QUAT", T_mod.QUAT_MEAN_IMPL))
from vpho_tpu.diffusion.sampler import ode_sampler
from vpho_tpu.models import aggregation as agg
from vpho_tpu.models import anchor as anchor_lib
from vpho_tpu.models import heads
from vpho_tpu.models import vpho as V
from vpho_tpu.models.mano import hand_verts_meters
from vpho_tpu.models.vpho import (ModelConfig, VPHONet, _score_fn,
                                  postprocess_diffusion_hand)


def timed(name, fn, *args, iters=5, groups=3):
    """Group-fenced: ``iters`` async dispatches per fence — per-call fencing
    pays the ~30 ms tunnel RTT, which swamps ms-scale stages."""
    only = os.environ.get("BENCH_STAGES", "")
    if only and name not in only.split(","):
        return None
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
    print(json.dumps({"stage": name, "median_ms": round(ts[len(ts) // 2] * 1e3, 2)}),
          flush=True)
    return out


def main():
    B = int(os.environ.get("BENCH_BATCH", "64"))
    S = int(os.environ.get("BENCH_SAMPLES", "100"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    iters = int(os.environ.get("BENCH_ITERS", "7"))
    cfg = ModelConfig(sample_num=S, sampling_steps=steps, topk_hand=30,
                      topk_obj=10, patch_size=256, compute_dtype=dtype_name,
                      ode_method="heun")
    ctx = V.make_context(cfg)
    model = VPHONet(compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16" else None)
    batch = make_batch(ctx, jax.random.PRNGKey(0), B, 256)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch, False)

    out = jax.jit(lambda v, b: model.apply(v, b, False, method=VPHONet.trunk))(
        variables, batch)
    score_h = _score_fn(model, variables, ctx.sde, "hand", out["encoding_hand"], S)
    final_h = jax.jit(lambda r: ode_sampler(
        score_h, r, B * S, 96, ctx.sde, cfg.sample_T0, steps, method="heun",
        return_trajectory=False)[1])(jax.random.PRNGKey(3))
    score_o = _score_fn(model, variables, ctx.sde, "obj", out["encoding_obj"], S)
    final_o = jax.jit(lambda r: ode_sampler(
        score_o, r, B * S, 9, ctx.sde, cfg.sample_T0, steps, method="heun",
        return_trajectory=False)[1])(jax.random.PRNGKey(4))
    hand_mano = postprocess_diffusion_hand(final_h, out["pd_mano_shape"], S)
    obj_pose6d = final_o.reshape(B, S, 9)
    jax.block_until_ready((hand_mano, obj_pose6d))

    K, k, phy_topk = cfg.topk_hand, cfg.topk_obj, 5

    # --- stage 1: hand heatmap cascade -------------------------------------
    def stage1(hm, seed):
        hm = hm + (seed * 1e-6).astype(hm.dtype)
        return agg.hand_heatmap_cascade(
            ctx.mano, hm[..., :48], out["pd_mano_pose"], hm[..., 48:],
            batch["root_joint_flip"], batch["cam_intr_crop_flip"],
            out["pd_hm_hand"], batch["bbox_hand"], K)["agg_vert"]
    timed("1_hand_cascade", jax.jit(stage1), hand_mano, iters=iters)

    # shared downstream inputs (computed once, excluded from stage timings)
    hand_sel = jax.jit(lambda hm: agg.hand_heatmap_cascade(
        ctx.mano, hm[..., :48], out["pd_mano_pose"], hm[..., 48:],
        batch["root_joint_flip"], batch["cam_intr_crop_flip"],
        out["pd_hm_hand"], batch["bbox_hand"], K))(hand_mano)
    hand_vert_cam = hand_sel["agg_vert"] + batch["root_joint_flip"][:, None]
    force_point, force_global = anchor_lib.force_local_to_global(
        ctx.anchor_tables, out["pd_phy"]["force_local"], hand_vert_cam)

    # --- stage 2: object translation top-k over S --------------------------
    def stage2(p6d, seed):
        p6d = p6d + (seed * 1e-6).astype(p6d.dtype)
        topk, w = agg.obj_topk_by_heatmap(
            ctx.registry, p6d, batch["root_joint"], batch["obj_id"],
            batch["is_right"], batch["cam_intr_crop_flip"],
            out["pd_hm_obj"], batch["bbox_obj_rect"], k)
        return agg.obj_fuse_topk(p6d, topk, w)
    timed("2_obj_heat_topk_S", jax.jit(stage2), obj_pose6d, iters=iters)

    # stage-4 candidate set (fixed once)
    cand = jnp.concatenate([
        jnp.broadcast_to(obj_pose6d[:, :k, None, :6], (B, k, k, 6)),
        jnp.broadcast_to(obj_pose6d[:, None, :k, 6:], (B, k, k, 3)),
    ], axis=-1).reshape(B, k * k, 9)

    # --- stage 4a: k^2 heatmap re-rank --------------------------------------
    def stage4a(c, seed):
        c = c + (seed * 1e-6).astype(c.dtype)
        topk, w = agg.obj_topk_by_heatmap(
            ctx.registry, c, batch["root_joint"], batch["obj_id"],
            batch["is_right"], batch["cam_intr_crop_flip"],
            out["pd_hm_obj"], batch["bbox_obj_rect"], phy_topk)
        return agg.obj_fuse_topk(c, topk, w)
    timed("4a_obj_heat_rerank_k2", jax.jit(stage4a), cand, iters=iters)

    # --- stage 4b: k^2 physics3 re-rank (2048-vert distance matrices) ------
    def stage4b(c, seed):
        c = c + (seed * 1e-6).astype(c.dtype)
        topk, w = agg.obj_topk_by_physics3(
            ctx.registry, c, batch["root_joint"], batch["obj_id"],
            batch["is_right"], force_point, force_global, phy_topk)
        return agg.obj_fuse_topk(c, topk, w)
    timed("4b_obj_physics3_k2", jax.jit(stage4b), cand, iters=iters)

    # --- stage 5: per-finger physics re-rank (full 778-vert FK) ------------
    obj_agg_6d = jax.jit(stage4a)(cand, jnp.float32(0))
    pose_cam = obj_agg_6d.at[..., 6:].add(batch["root_joint"])
    obj_vert_fused = heads.flip_pt3d(
        heads.object_transform(ctx.registry, pose_cam, batch["obj_id"], "verts"),
        batch["is_right"])
    obj_com_fused = heads.flip_pt3d(
        heads.object_transform(ctx.registry, pose_cam, batch["obj_id"], "CoM"),
        batch["is_right"])
    new_cand = jnp.concatenate([
        jnp.broadcast_to(hand_sel["agg_hand_mano"][:, None, :48], (B, K + 1, 48)),
        jnp.broadcast_to(hand_sel["agg_hand_mano"][:, None, 48:], (B, K + 1, 10)),
    ], axis=-1)

    def stage5(nc, seed):
        nc = nc + (seed * 1e-6).astype(nc.dtype)
        return agg.hand_physics_rerank(
            ctx.mano, ctx.anchor_tables, nc, batch["root_joint_flip"],
            obj_vert_fused, obj_com_fused, out["pd_phy"]["force_local"],
            phy_topk)["agg_vert"]
    timed("5_hand_physics_rerank", jax.jit(stage5), new_cand, iters=iters)

    # --- fused-object transform (stage-4 epilogue) --------------------------
    def stage4c(p, seed):
        p = p + (seed * 1e-6).astype(p.dtype)
        v = heads.object_transform(ctx.registry, p, batch["obj_id"], "verts")
        return heads.flip_pt3d(v, batch["is_right"])
    timed("4c_fused_obj_transform", jax.jit(stage4c), obj_agg_6d, iters=iters)

    # --- reference total: the whole hoi_aggregate in one jit ---------------
    def total(hm, fo, seed):
        hm = hm + (seed * 1e-6).astype(hm.dtype)
        return agg.hoi_aggregate(
            ctx.mano, ctx.registry, ctx.anchor_tables,
            cam_intrinsic=batch["cam_intr_crop_flip"],
            root_joint_flip=batch["root_joint_flip"],
            root_joint=batch["root_joint"], is_right=batch["is_right"],
            force_local=out["pd_phy"]["force_local"],
            is_grasped=batch["is_grasped"],
            hand_pose_diff=hm[..., :48], hand_pose_regression=out["pd_mano_pose"],
            hand_shape=hm[..., 48:], hand_heatmap=out["pd_hm_hand"],
            hand_bbox=batch["bbox_hand"], hand_topk=K,
            obj_pose6d=fo.reshape(B, S, 9), obj_heatmap=out["pd_hm_obj"],
            obj_bbox=batch["bbox_obj_rect"], obj_topk=k,
            obj_ids=batch["obj_id"])["hand_agg_vert"]
    timed("total_hoi_aggregate", jax.jit(total), hand_mano, final_o, iters=iters)


if __name__ == "__main__":
    main()
