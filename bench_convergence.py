"""End-to-end LEARNING evidence: train the full vpho_net (all losses, both
diffusion heads, physics cue) on the synthetic signal task and watch eval
MJE fall on held-out frames.

Without real DexYCB on this host no MPJPE-vs-reference number can exist;
this is the strongest trainability evidence available: the fixture stream
with ``signal=True`` paints the projected hand joints / object keypoints
into the image, so a generalizing image->pose mapping exists, every loss
term is live, and a fresh key yields a fresh sample (no memorization).
Prints one JSON line per eval point:

    {"step": N, "reg_mje_mm": ..., "agg_mje_mm": ..., "one_mje_mm": ...,
     "obj_trans_mm": ..., "total_loss": ...}

Run on the real chip (default) or CPU (slow).  Knobs: CONV_STEPS (default
400), CONV_BATCH (16), CONV_EVAL_EVERY (100), CONV_PATCH (128).
"""
import json
import os
import time

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from vpho_tpu.configs.config import Config
from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.engine.trainer import (create_train_state, make_predict_step,
                                     make_train_step, postprocess_hand_vert,
                                     postprocess_obj_rt)
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import VPHONet


def main():
    steps = int(os.environ.get("CONV_STEPS", "400"))
    B = int(os.environ.get("CONV_BATCH", "16"))
    every = int(os.environ.get("CONV_EVAL_EVERY", "100"))
    patch = int(os.environ.get("CONV_PATCH", "128"))

    dtype_name = os.environ.get("CONV_DTYPE", "float32")

    cfg = Config(batch_size=B, sampling_steps=10, sample_num=20, repeat_num=4,
                 patch_size=patch, topk_hand=5, topk_obj=5, num_workers=0,
                 compute_dtype=dtype_name)
    ctx = V.make_context(cfg.to_model_config())
    model = VPHONet(compute_dtype=jnp.bfloat16 if dtype_name == "bfloat16"
                    else None)

    train_key = jax.random.PRNGKey(11)
    eval_batch = make_batch(ctx, jax.random.PRNGKey(999), B, patch, signal=True)
    sample = make_batch(ctx, jax.random.PRNGKey(0), B, patch, signal=True)

    state = create_train_state(model, ctx, cfg, sample, steps_per_epoch=steps,
                               rng=jax.random.PRNGKey(206))
    train_step = make_train_step(model, ctx)
    predict = make_predict_step(model, ctx)

    def mje_mm(pd, gt):
        return float(np.linalg.norm(np.asarray(pd) - np.asarray(gt),
                                    axis=-1).mean() * 1000.0)

    def report(step, loss):
        pd = predict(state, eval_batch, jax.random.PRNGKey(5))
        root = eval_batch["root_joint"]
        is_right = eval_batch["is_right"]
        gt_j = np.asarray(postprocess_hand_vert(
            eval_batch["gt_hand_jt3d_flip"], root, is_right))
        gt_rt = np.asarray(postprocess_obj_rt(eval_batch["gt_obj"], root))
        rec = {
            "step": step,
            "reg_mje_mm": mje_mm(postprocess_hand_vert(pd["reg_hand_joint"], root, is_right), gt_j),
            "agg_mje_mm": mje_mm(postprocess_hand_vert(pd["agg_hand_joint"], root, is_right), gt_j),
            "one_mje_mm": mje_mm(postprocess_hand_vert(
                pd["diff_final_hand_joint"][:, 0], root, is_right), gt_j),
            "obj_trans_mm": mje_mm(np.asarray(postprocess_obj_rt(
                pd["agg_obj_6d"], root))[..., 3], gt_rt[..., 3]),
            "total_loss": None if loss is None else float(loss["total_loss"]),
        }
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in rec.items()}), flush=True)

    report(0, None)
    t0 = time.time()
    loss = None
    for i in range(1, steps + 1):
        batch = make_batch(ctx, jax.random.fold_in(train_key, i), B, patch,
                           signal=True)
        state, loss = train_step(state, batch, jax.random.PRNGKey(77))
        if i % every == 0 or i == steps:
            report(i, loss)
    print(json.dumps({"train_seconds": round(time.time() - t0, 1),
                      "frames_seen": steps * B}), flush=True)

    # bf16 promotion gate on the TRAINED weights: the random-init comparison
    # is uninformative (the denoiser's zero-initialized final layers make the
    # ODE conditioning-independent at init, and untrained heatmaps turn topk
    # selection into a coin flip) — what matters is whether the bf16 policy
    # moves TASK metrics on a model whose predictions track supervision
    bf16_model = VPHONet(compute_dtype=jnp.bfloat16)
    predict16 = make_predict_step(bf16_model, ctx)
    pd16 = predict16(state, eval_batch, jax.random.PRNGKey(5))
    predict32 = (predict if dtype_name == "float32"
                 else make_predict_step(VPHONet(), ctx))
    pd32 = predict32(state, eval_batch, jax.random.PRNGKey(5))
    root, is_right = eval_batch["root_joint"], eval_batch["is_right"]
    gt_j = np.asarray(postprocess_hand_vert(
        eval_batch["gt_hand_jt3d_flip"], root, is_right))
    rec = {}
    for tag, pd in (("f32", pd32), ("bf16", pd16)):
        rec[f"agg_mje_mm_{tag}"] = round(mje_mm(postprocess_hand_vert(
            pd["agg_hand_joint"], root, is_right), gt_j), 2)
        rec[f"reg_mje_mm_{tag}"] = round(mje_mm(postprocess_hand_vert(
            pd["reg_hand_joint"], root, is_right), gt_j), 2)
        rec[f"one_mje_mm_{tag}"] = round(mje_mm(postprocess_hand_vert(
            pd["diff_final_hand_joint"][:, 0], root, is_right), gt_j), 2)
    print(json.dumps(rec), flush=True)

    # integrator promotion gate on the SAME trained weights: identical state,
    # identical eval batch and rng — only the ODE solver differs, so any
    # task-metric gap is attributable to the integrator alone (the r4 dpm3m
    # promotion evidence; module-level gate in tests/test_torch_parity.py)
    import dataclasses as _dc
    rec = {}
    for m in ("heun", "dpm2m", "dpm3m"):
        # swap only the cfg on the existing context: VPHOContext is a
        # NamedTuple, so the loaded MANO/YCB/anchor assets are reused
        ctx_m = ctx._replace(cfg=_dc.replace(ctx.cfg, ode_method=m))
        pd_m = make_predict_step(model, ctx_m)(state, eval_batch,
                                               jax.random.PRNGKey(5))
        rec[f"agg_mje_mm_{m}"] = round(mje_mm(postprocess_hand_vert(
            pd_m["agg_hand_joint"], root, is_right), gt_j), 2)
        rec[f"one_mje_mm_{m}"] = round(mje_mm(postprocess_hand_vert(
            pd_m["diff_final_hand_joint"][:, 0], root, is_right), gt_j), 2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
