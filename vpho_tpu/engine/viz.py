"""Visualization dumps in the Batch3D pkl convention.

Port of the reference's visualization writers (train_diff_hand_obj.py:604-856,
force_optimization.py:209-232): point-cloud dicts whose keys carry a
``_#RRGGBB`` color suffix, pickled under ``<run>/viz/``, plus heatmap overlay
JPGs.  These pkls are the output-fidelity artifact the north-star requires.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict

import numpy as np

from ..models.ycb import YCBRegistry
from ..data.augment import IMG_MEAN, IMG_STD


def _rand_color_hex(rng: np.random.RandomState, exclude=(0, 255, 0)) -> str:
    while True:
        c = rng.randint(0, 256, 3)
        if not np.array_equal(c, np.asarray(exclude)):
            return f"#{c[0]:02X}{c[1]:02X}{c[2]:02X}"


def _dump(save_dir: str, name: str, data: Dict[str, np.ndarray]):
    path = os.path.join(save_dir, "viz", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({k: np.asarray(v) if not isinstance(v, (str, type(None))) else v
                     for k, v in data.items()}, f)
    return path


def save_viz_hand(save_dir: str, idx: int, *, gt_vert, gt_obj_vert, pd_vert_reg,
                  pd_vert_diff, pd_vert_agg, rgb_path: str = "", max_hyp: int = 20,
                  seed: int = 0):
    """Hand multi-hypothesis dump (train_diff_hand_obj.py:637-665)."""
    rng = np.random.RandomState(seed)
    reg_dt = {
        "rgb_path": rgb_path,
        "gt_hand_#000000": gt_vert,
        "gt_obj_#00FF00": gt_obj_vert,
        "pd_vert_reg_#00FF00": pd_vert_reg,
        "pd_vert_diff_agg_#FF0000": pd_vert_agg,
    }
    _dump(save_dir, f"{idx}_hand_reg_&_diff_mean.pkl", reg_dt)
    multi = dict(reg_dt)
    for s in range(min(len(pd_vert_diff), max_hyp)):
        multi[f"hand_diff_vert_{s}_{_rand_color_hex(rng)}"] = pd_vert_diff[s]
    return _dump(save_dir, f"{idx}_hand_multihyperthesis.pkl", multi)


def save_viz_obj(save_dir: str, idx: int, registry: YCBRegistry, obj_id: int, *,
                 gt_rt, pd_rt_cands, pd_rt_agg, gt_hand, rgb_path: str = "",
                 max_hyp: int = 20, seed: int = 0):
    """Object multi-hypothesis dump (train_diff_hand_obj.py:604-635)."""
    rng = np.random.RandomState(seed)
    verts = np.asarray(registry.verts_sampled[obj_id])

    def tf(rt):
        return verts @ np.asarray(rt)[:3, :3].T + np.asarray(rt)[:3, 3]

    dt = {
        "rgb_path": rgb_path,
        "obj_name": registry.names[obj_id],
        "gt_hand_#000000": gt_hand,
        "obj_gt_vert_#00FF00": tf(gt_rt),
        "obj_pd_vert_mean_#FF0000": tf(pd_rt_agg),
    }
    for s in range(min(len(pd_rt_cands), max_hyp)):
        dt[f"obj_diff_vert_{s}_{_rand_color_hex(rng)}"] = tf(pd_rt_cands[s])
    return _dump(save_dir, f"{idx}_obj_multihyperthesis.pkl", dt)


def save_viz_force(save_dir: str, idx: int, *, vert, force_point, force_global,
                   gravity, com, obj_mesh, skeleton=None):
    """Force visualization (force_optimization.py:209-232)."""
    force = np.stack([np.asarray(force_point),
                      np.asarray(force_point) + np.asarray(force_global) * 0.3], axis=1)
    grav = np.concatenate([np.asarray(com),
                           np.asarray(com) + np.asarray(gravity) * 0.3], axis=0)[None]
    dt = {
        "vert_#00FF00": vert,
        "force_#FF0000": force,
        "gravity_#0000FF": grav,
        "obj_mesh_#000000": obj_mesh,
    }
    if skeleton is not None:
        dt["skeleton_#00FF00"] = skeleton
    return _dump(save_dir, f"{idx}_optimized_force.pkl", dt)


def make_heatmap_overlay(rgb_crop: np.ndarray, heatmaps: np.ndarray) -> np.ndarray:
    """Grid of per-joint heatmap overlays (viz_fn.make_heatmaps analogue).

    rgb_crop: (H, W, 3) uint8; heatmaps: (J, H, W) -> (H, (J+1)*W, 3)."""
    import cv2

    H, W = rgb_crop.shape[:2]
    panels = [rgb_crop]
    for j in range(heatmaps.shape[0]):
        hm = np.clip(heatmaps[j], 0, 1)
        hm8 = (hm * 255).astype(np.uint8)
        cmap = cv2.applyColorMap(hm8, cv2.COLORMAP_JET)[..., ::-1]
        overlay = (0.6 * rgb_crop + 0.4 * cmap).astype(np.uint8)
        panels.append(overlay)
    return np.concatenate(panels, axis=1)


def save_viz_heatmap(save_dir: str, idx: int, *, rgb_norm, bbox_hand, bbox_obj,
                     pd_hm_hand, gt_hm_hand, pd_hm_obj, gt_hm_obj):
    """Heatmap JPG grids (train_diff_hand_obj.py:667-703)."""
    import cv2

    rgb = ((np.asarray(rgb_norm) * IMG_STD + IMG_MEAN) * 255).clip(0, 255).astype(np.uint8)
    out_paths = []
    for tag, bbox, pd_hm, gt_hm in (
        ("hand", bbox_hand, pd_hm_hand, gt_hm_hand),
        ("obj", bbox_obj, pd_hm_obj, gt_hm_obj),
    ):
        b = np.asarray(bbox).astype(np.int64)
        crop = rgb[max(b[1], 0):b[3], max(b[0], 0):b[2]]
        if crop.size == 0:
            continue
        size = np.asarray(pd_hm).shape[-1]
        crop = cv2.resize(crop, (size, size))
        gt_row = make_heatmap_overlay(crop, np.asarray(gt_hm))
        pd_row = make_heatmap_overlay(crop, np.asarray(pd_hm))
        grid = np.concatenate([gt_row, pd_row], axis=0)
        path = os.path.join(save_dir, "viz", f"{idx}_gt&pd_{tag}_heatmap.jpg")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cv2.imwrite(path, grid[..., ::-1])
        out_paths.append(path)
    return out_paths
