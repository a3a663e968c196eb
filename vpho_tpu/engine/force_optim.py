"""Offline pseudo-force label optimization (force_optim pipeline).

TPU-native rewrite of lib/engine/force_optimization.py: the reference runs
3000 serial Adam iterations per batch on GPU with a host-side Python loop
(:141-187); here the ENTIRE two-phase inner optimization is one jitted
``lax.fori_loop`` (300 gravity-only steps on the direction weights, then
2700 steps of force+moment+contact-distribution on scale+weights) —
per-sample independent, so it vectorizes over the whole batch and scales
embarrassingly across the data mesh.

Per-batch decision variables (:35-38): ``scale`` (bs, 32) init 0.05 and
``weight`` (bs, 32, 8) init 0, optimized with AdamW(lr=1e-3).  Outputs are
written per image as ``hand_force_*.pkl`` {force_local, force_global}
(:234-249), consumed at train time by the dataset's ``get_force``.
"""
from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import anchor as anchor_lib
from ..models.heads import local_force_from_scale_weight

N_ANCHOR = 32
PHASE1_ITERS = 300
TOTAL_ITERS = 3000
LR = 1e-3


def _safe_norm(x, axis=-1, eps=1e-12):
    """norm with finite gradient at 0 (jnp.linalg.norm grad is NaN there —
    with zero contact the moment is exactly 0 and would poison the params)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def _losses(scale, weight, contact_mask, force_contact, vert3d, gravity, com, tables):
    """One evaluation of the four loss terms (force_optimization.py:141-171)."""
    s = scale * contact_mask
    force_local = local_force_from_scale_weight(s, weight)
    force_point, force_global = anchor_lib.force_local_to_global(
        tables, force_local, vert3d)

    resultant = force_global.sum(1, keepdims=True) + gravity     # (bs, 1, 3)
    force_loss = _safe_norm(resultant[:, 0]).mean()
    sum_weight = jax.lax.stop_gradient(force_loss)

    total = force_global.sum(1, keepdims=True)
    cos_proj = jnp.einsum("...i,...i->...", total, -gravity)
    gravity_loss = jnp.mean((cos_proj - 1.0) ** 2)

    arm = force_point - com
    moment = jnp.cross(arm, force_global).sum(1)
    moment_loss = _safe_norm(moment).mean() * 30.0
    moment_loss = moment_loss / (100.0 * sum_weight**2 + 1e-8)

    sn = s / (jax.lax.stop_gradient(jnp.linalg.norm(s, axis=-1, keepdims=True)) + 1e-8)
    fcn = force_contact / (jax.lax.stop_gradient(
        jnp.linalg.norm(force_contact, axis=-1, keepdims=True)) + 1e-8)
    dist = jnp.log(jnp.abs(fcn / (sn + 1e-8)) + 1e-8) * contact_mask
    dist_loss = jnp.mean(dist**2) * 0.1 / (1000.0 * sum_weight**2 + 1e-8)

    return force_loss, gravity_loss, moment_loss, dist_loss, (force_local, force_point, force_global)


@partial(jax.jit, static_argnames=("iters_phase1", "iters_total"))
def optimize_forces(force_contact: jax.Array, vert3d: jax.Array, gravity: jax.Array,
                    com: jax.Array, tables: anchor_lib.ForceAnchorTables,
                    iters_phase1: int = PHASE1_ITERS, iters_total: int = TOTAL_ITERS):
    """Run the full two-phase inner optimization for a batch.

    force_contact: (bs, 32); vert3d: (bs, 778, 3) flipped GT verts;
    gravity: (bs, 1, 3); com: (bs, 1, 3).
    Returns force_local/force_point/force_global (bs, 32, 3) and final losses.
    """
    bs = force_contact.shape[0]
    contact_mask = (force_contact > 0.1).astype(jnp.float32)
    params = {
        "scale": jnp.full((bs, N_ANCHOR), 0.05),
        "weight": jnp.zeros((bs, N_ANCHOR, 8)),
    }
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)

    def phase1_loss(p):
        _, gl, _, _, _ = _losses(p["scale"], p["weight"], contact_mask,
                                 force_contact, vert3d, gravity, com, tables)
        return gl

    def phase2_loss(p):
        fl, _, ml, dl, _ = _losses(p["scale"], p["weight"], contact_mask,
                                   force_contact, vert3d, gravity, com, tables)
        return fl + ml + dl

    def step(i, carry):
        params, opt_state = carry
        grads = jax.lax.cond(
            i < iters_phase1,
            lambda p: _mask_scale_grad(jax.grad(phase1_loss)(p)),
            jax.grad(phase2_loss),
            params,
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    def _mask_scale_grad(g):
        # phase 1 optimizes only the direction weights (optimizer1, :37)
        return {"scale": jnp.zeros_like(g["scale"]), "weight": g["weight"]}

    params, _ = jax.lax.fori_loop(0, iters_total, step, (params, opt_state))

    fl, gl, ml, dl, (force_local, force_point, force_global) = _losses(
        params["scale"], params["weight"], contact_mask, force_contact,
        vert3d, gravity, com, tables)
    return {
        "force_local": force_local,
        "force_point": force_point,
        "force_global": force_global,
        "losses": {"force": fl, "gravity": gl, "moment": ml, "dist": dl},
    }


class ForceOptimizer:
    """Batch runner: applies the flip protocol, optimizes, writes pkl labels."""

    def __init__(self, cfg, tables: anchor_lib.ForceAnchorTables, registry):
        self.cfg = cfg
        self.tables = tables
        self.registry = registry

    def run_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        gravity = jnp.asarray(batch["gravity"])
        com = jnp.asarray(batch["obj_CoM"])
        is_right = jnp.asarray(batch["is_right"]).astype(bool)
        # flip gravity/CoM into the right-hand frame (:132-136)
        from ..utils.transforms import flip_point3d

        gravity = flip_point3d(gravity, ~is_right)
        com = flip_point3d(com, ~is_right)

        out = optimize_forces(
            jnp.asarray(batch["force_contact"]),
            jnp.asarray(batch["gt_hand_vert_flip"]),
            gravity, com, self.tables,
        )
        # zero ungrasped samples (:189-192)
        grasp = jnp.asarray(batch["is_grasped"]).astype(bool)[:, None, None]
        force_local = jnp.where(grasp, out["force_local"], 0.0)
        force_global = jnp.where(grasp, out["force_global"], 0.0)
        return {
            "force_local": np.asarray(force_local),
            "force_global": np.asarray(force_global),
            "force_point": np.asarray(out["force_point"]),
            "losses": {k: float(v) for k, v in out["losses"].items()},
        }

    @staticmethod
    def save_force(result: Dict[str, np.ndarray], rgb_paths, dataset_name="dexycb"):
        """Per-image pkl dump (force_optimization.py:234-249)."""
        for i, p in enumerate(rgb_paths):
            if dataset_name == "dexycb":
                save_path = p.replace("DexYCB/", "DexYCB/cache/hand_force/") \
                             .replace(".jpg", ".pkl").replace("color_", "hand_force_")
            elif dataset_name == "ho3d":
                save_path = p.replace("HO3D_v2/", "HO3D_v2/cache/hand_force/") \
                             .replace(".png", ".pkl").replace("rgb/", "hand_force/")
            else:
                raise NotImplementedError(dataset_name)
            os.makedirs(os.path.dirname(save_path), exist_ok=True)
            with open(save_path, "wb") as f:
                pickle.dump({"force_local": result["force_local"][i],
                             "force_global": result["force_global"][i]}, f)
