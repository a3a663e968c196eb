"""Batched evaluation metrics (hand + object), pure JAX.

Re-implementation of lib/engine/test.py's criteria as vmapped device code:
the reference loops per sample in Python and round-trips torch<->numpy<->cuda
per item (test.py:250-279, 604-618); here every criterion is one batched
kernel over the whole eval shard.

Object criteria (TesterObject): MCE, MCE2 (HOISDF axis-aligned corner),
OCE, ADD, ADD-S, ADD-0.1d, ADDS-0.1d, REP, REP5, F-score@{2,5,10mm,2,5,10cm},
Chamfer-L2.  Hand criteria (TesterHand): MJE, PA-MJE (Umeyama-aligned), MVE,
PA-MVE, per-joint JE.

Units follow the reference: inputs in meters, reports in mm (x1000 at format
time, engine/tester.py).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..utils import transforms as T
from ..models.ycb import YCBRegistry

Array = jax.Array
_HI = jax.lax.Precision.HIGHEST

# 8 bbox corners inside the 27-point lattice (i,j,k in {0,2} of the 3x3x3 grid)
BBOX8_IN_KPT27 = jnp.array([0, 2, 6, 8, 18, 20, 24, 26])

FSCORE_THRESHOLDS = (0.002, 0.005, 0.010, 0.020, 0.050, 0.100)
FSCORE_KEYS = ("FSCORE@2mm", "FSCORE@5mm", "FSCORE@10mm",
               "FSCORE@2cm", "FSCORE@5cm", "FSCORE@10cm")


def _apply_rt(pts: Array, rt: Array) -> Array:
    """pts (..., N, 3), rt (..., 3, 4) -> transformed points."""
    return jnp.einsum("...ni,...ji->...nj", pts, rt[..., :3], precision=_HI) + rt[..., None, :, 3]


def _pairwise_min_dist(a: Array, b: Array, b_mask: Array | None = None) -> Array:
    """min over b of ||a_i - b_j||; a (..., P, 3), b (..., Q, 3) -> (..., P)."""
    a2 = jnp.sum(a * a, -1)[..., :, None]
    b2 = jnp.sum(b * b, -1)[..., None, :]
    ab = jnp.einsum("...pd,...qd->...pq", a, b, precision=_HI)
    d2 = jnp.maximum(a2 + b2 - 2 * ab, 0.0)
    if b_mask is not None:
        d2 = jnp.where(b_mask[..., None, :] > 0, d2, jnp.inf)
    return jnp.sqrt(jnp.min(d2, axis=-1))


def hand_metrics(gt_joint: Array, pd_joint: Array, gt_vert: Array, pd_vert: Array
                 ) -> Dict[str, Array]:
    """Per-sample hand criteria (TesterHand, test.py:657-679).

    gt_joint (N, 21, 3); pd_joint (N, 21, 3); verts likewise (778).
    Returns per-sample arrays (meters).
    """
    je = jnp.linalg.norm(gt_joint - pd_joint, axis=-1)           # (N, 21)
    mje = je.mean(-1)
    pd_joint_aligned = jax.vmap(T.rigid_align)(pd_joint, gt_joint)
    pa_mje = jnp.linalg.norm(gt_joint - pd_joint_aligned, axis=-1).mean(-1)

    ve = jnp.linalg.norm(gt_vert - pd_vert, axis=-1)
    mve = ve.mean(-1)
    pd_vert_aligned = jax.vmap(T.rigid_align)(pd_vert, gt_vert)
    pa_mve = jnp.linalg.norm(gt_vert - pd_vert_aligned, axis=-1).mean(-1)
    return {"MJE": mje, "PA_MJE": pa_mje, "JE": je, "MVE": mve, "PAMVE": pa_mve}


def load_bop_symmetries(path: str = "asset/2023_NIPS_DeepSimHO/assets_models_info.json",
                        max_sym_disc_step: float = 0.01):
    """BOP symmetry transform banks per YCB class (test.py:103-150, 202-227).

    Returns (R, t): (21, S, 3, 3) and (21, S, 3) numpy arrays padded with
    identities; identity-only when the asset json is absent (then
    SMCE == MCE, matching the reference's disabled-by-default behavior).
    """
    import json as _json
    import math as _math
    import os as _os

    import numpy as _np

    if not _os.path.exists(path):
        R = _np.tile(_np.eye(3), (21, 1, 1, 1))
        t = _np.zeros((21, 1, 3))
        return R, t
    info = _json.load(open(path))
    banks = []
    for obj_idx in range(1, 22):
        mi = info[str(obj_idx)]
        trans_disc = [(_np.eye(3), _np.zeros(3))]
        for sym in mi.get("symmetries_discrete", []):
            m = _np.reshape(sym, (4, 4))
            trans_disc.append((m[:3, :3], m[:3, 3]))
        trans_cont = []
        for sym in mi.get("symmetries_continuous", []):
            axis = _np.asarray(sym["axis"], float)
            offset = _np.asarray(sym["offset"], float)
            steps = int(_np.ceil(_np.pi / max_sym_disc_step))
            dstep = 2 * _np.pi / steps
            for i in range(1, steps):
                a = i * dstep
                k = axis / _np.linalg.norm(axis)
                K = _np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
                Rr = _np.eye(3) + _math.sin(a) * K + (1 - _math.cos(a)) * (K @ K)
                trans_cont.append((Rr, -Rr @ offset + offset))
        bank = []
        for Rd, td in trans_disc:
            if trans_cont:
                for Rc, tc in trans_cont:
                    bank.append((Rc @ Rd, Rc @ td + tc))
            else:
                bank.append((Rd, td))
        banks.append(bank)
    S = max(len(b) for b in banks)
    R = _np.tile(_np.eye(3), (21, S, 1, 1))
    t = _np.zeros((21, S, 3))
    for i, b in enumerate(banks):
        for j, (Rj, tj) in enumerate(b):
            R[i, j] = Rj
            t[i, j] = tj / 1000.0  # mm -> m (test.py:224)
    return R, t


def smce(registry: YCBRegistry, sym_R: Array, sym_t: Array, pd_rt: Array,
         gt_rt: Array, obj_ids: Array) -> Array:
    """Symmetry-aware MCE: min over symmetry transforms of the bbox-corner
    error (criterion_SMCE, test.py:377-398).  sym_R/sym_t from
    ``load_bop_symmetries``.  Note the reference computes but never reports
    this in its live loop ("very slow", test.py:258) — provided for parity.
    """
    kpt = jnp.take(registry.kpt3d, obj_ids, axis=0)
    bbox8 = kpt[:, BBOX8_IN_KPT27]                               # (N, 8, 3)
    R = jnp.take(jnp.asarray(sym_R, jnp.float32), obj_ids, axis=0)  # (N, S, 3, 3)
    t = jnp.take(jnp.asarray(sym_t, jnp.float32), obj_ids, axis=0)  # (N, S, 3)
    sym_b = jnp.einsum("nki,nsji->nskj", bbox8, R, precision=_HI) + t[:, :, None]
    gt_b = _apply_rt(sym_b, gt_rt[:, None])                      # (N, S, 8, 3)
    pd_b = _apply_rt(bbox8, pd_rt)                               # (N, 8, 3)
    err = jnp.linalg.norm(pd_b[:, None] - gt_b, axis=-1).mean(-1)  # (N, S)
    return err.min(-1)


def object_metrics(registry: YCBRegistry, pd_rt: Array, gt_rt: Array,
                   obj_ids: Array, cam_intr: Array) -> Dict[str, Array]:
    """Per-sample object criteria (TesterObject, test.py:354-520).

    pd_rt/gt_rt: (N, 3, 4); obj_ids: (N,) 0-based; cam_intr: (N, 3, 3).
    """
    kpt = jnp.take(registry.kpt3d, obj_ids, axis=0)              # (N, 27, 3)
    bbox8 = kpt[:, BBOX8_IN_KPT27]                               # (N, 8, 3)
    vs = jnp.take(registry.verts_sampled, obj_ids, axis=0)       # (N, 2048, 3)
    vf = jnp.take(registry.verts_full, obj_ids, axis=0)          # (N, Vmax, 3)
    vmask = jnp.take(registry.verts_full_mask, obj_ids, axis=0)  # (N, Vmax)
    diameter = jnp.take(registry.diameter, obj_ids, axis=0)

    # MCE / OCE on the bbox corners (test.py:354-374)
    pd_b = _apply_rt(bbox8, pd_rt)
    gt_b = _apply_rt(bbox8, gt_rt)
    mce = jnp.linalg.norm(pd_b - gt_b, axis=-1).mean(-1)
    oce = jnp.linalg.norm(pd_b.mean(-2) - gt_b.mean(-2), axis=-1)

    # ADD / ADD-S / REP on sampled verts (test.py:419-450)
    pd_v = _apply_rt(vs, pd_rt)
    gt_v = _apply_rt(vs, gt_rt)
    add = jnp.linalg.norm(pd_v - gt_v, axis=-1).mean(-1)
    adds = _pairwise_min_dist(pd_v, gt_v).mean(-1)
    pd_proj = T.project_pt3d_to_pt2d(pd_v, cam_intr[:, None])
    gt_proj = T.project_pt3d_to_pt2d(gt_v, cam_intr[:, None])
    rep = jnp.linalg.norm(pd_proj - gt_proj, axis=-1).mean(-1)

    # MCE2: HOISDF axis-aligned-bbox corner error on transformed verts
    # (test.py:153-193, 401-417)
    def aabb_corners(v):
        mn, mx = v.min(-2), v.max(-2)
        ci = jnp.array([[0, 1, 0, 0, 1, 0, 1, 1],
                        [0, 0, 1, 0, 1, 1, 0, 1],
                        [0, 0, 0, 1, 0, 1, 1, 1]])
        mm = jnp.stack([mn, mx], axis=-2)                        # (N, 2, 3)
        return jnp.stack(
            [mm[..., ci[0], 0], mm[..., ci[1], 1], mm[..., ci[2], 2]], axis=-1)
    mce2 = jnp.linalg.norm(aabb_corners(pd_v) - aabb_corners(gt_v), axis=-1).mean(-1)

    # F-score + Chamfer on FULL verts (test.py:452-503, use_sampled=False),
    # masked over mesh padding
    pd_f = _apply_rt(vf, pd_rt)
    gt_f = _apply_rt(vf, gt_rt)
    d_p2g = _pairwise_min_dist(pd_f, gt_f, vmask)                # (N, Vmax)
    d_g2p = _pairwise_min_dist(gt_f, pd_f, vmask)
    cnt = vmask.sum(-1)

    def masked_mean(x):
        return (x * vmask).sum(-1) / cnt

    cd = 0.5 * (masked_mean(d_p2g) + masked_mean(d_g2p))
    out = {
        "MCE": mce, "MCE2": mce2, "OCE": oce, "ADD": add, "ADDS": adds,
        "REP": rep, "CD": cd,
        "ADD01d": (add <= diameter * 0.1).astype(jnp.float32),
        "ADDS01d": (adds <= diameter * 0.1).astype(jnp.float32),
        "REP5": (rep < 5.0).astype(jnp.float32),
    }
    for th, key in zip(FSCORE_THRESHOLDS, FSCORE_KEYS):
        precision = masked_mean((d_p2g < th).astype(jnp.float32))
        recall = masked_mean((d_g2p < th).astype(jnp.float32))
        out[key] = (2 * precision * recall) / (precision + recall + 1e-6)
    return out
