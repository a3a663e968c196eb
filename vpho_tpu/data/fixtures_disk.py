"""On-disk synthetic DexYCB mini-dataset builder.

Writes a real-shaped s0-format tree (640x480 jpgs + dex_ycb_s0_*_data.json)
with geometrically consistent annotations (projected synthetic-MANO joints,
object pose), so the FULL per-item pipeline — JPEG decode, crop/warp, aug,
FK translation correction, flip protocol, heatmaps, contact labels — runs
end-to-end with no real assets.  Used by tests/test_dexycb_dataset.py and
bench_input.py (loader-throughput measurement on real-shaped inputs).

Reference shape contract: lib/dataset/dexycb6.py:276-509 (__getitem__ input
files) — 640x480 color_*.jpg frames under <subject>/<seq>/<camera>/.
"""
from __future__ import annotations

import json
import os

import numpy as np


def build_mini_dexycb(root: str, n: int = 3, seed: int = 0,
                      sides=None, image_size=(640, 480)) -> str:
    """Build an n-sample fake DexYCB tree under ``root``; returns ``root``.

    ``sides``: per-sample 'right'/'left' list (default: all right except
    every third sample left, exercising the flip protocol).
    """
    import cv2

    from . import dexycb as D

    rng = np.random.RandomState(seed)
    W, H = image_size
    fx = fy = 600.0
    ppx, ppy = W / 2.0, H / 2.0
    if sides is None:
        sides = ["left" if i % 3 == 2 else "right" for i in range(n)]

    model, _ = D._fk_fn("right")
    comps = np.asarray(model.hands_components)
    hmean = np.asarray(model.hands_mean)
    K = np.array([[fx, 0, ppx], [0, fy, ppy], [0, 0, 1]])

    samples = {}
    for i in range(n):
        side = sides[i]
        pca = rng.randn(45) * 0.1
        beta = rng.randn(10) * 0.3
        global_rot = rng.randn(3) * 0.2
        transl = np.array([0.04 * rng.rand() - 0.02, 0.01, 0.55])
        aa_flat = pca @ comps + hmean
        _, jt3d = D.get_hand_vert(aa_flat, beta, global_rot, transl,
                                  side == "right")
        jt2d = jt3d @ K.T
        jt2d = jt2d[:, :2] / jt2d[:, 2:]

        obj_rt = np.concatenate([np.eye(3), transl[:, None] + 0.02], axis=1)
        seq = (f"20200820-subject-0{i % 9 + 1}/20200820_1355{i:02d}/"
               f"836212060125")
        color_file = f"{seq}/color_{i:06d}.jpg"
        os.makedirs(os.path.join(root, os.path.dirname(color_file)),
                    exist_ok=True)
        # real-shaped photographic-complexity content: smooth gradients +
        # noise compress like natural images (a flat random image would
        # inflate decode cost; a constant one would deflate it)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        img = np.stack([
            127 + 80 * np.sin(xx / 37 + i) + 20 * rng.randn(H, W),
            127 + 80 * np.cos(yy / 53 + i) + 20 * rng.randn(H, W),
            127 + 60 * np.sin((xx + yy) / 71) + 20 * rng.randn(H, W),
        ], axis=-1)
        img = np.clip(img, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, color_file), img)

        samples[f"s{i}"] = {
            "color_file": color_file,
            "intrinsics": {"fx": fx, "fy": fy, "ppx": ppx, "ppy": ppy},
            "ycb_ids": [1 + i % 21],
            "ycb_grasp_ind": 0,
            "mano_side": side,
            "mano_betas": beta.tolist(),
            "joint_3d": [jt3d.tolist()],
            "joint_2d": [jt2d.tolist()],
            "pose_y": [obj_rt.tolist()],
            "pose_m": [np.concatenate([global_rot, pca, transl]).tolist()],
        }

    for split in ("train", "test"):
        with open(os.path.join(root, f"dex_ycb_s0_{split}_data.json"),
                  "w") as f:
            json.dump(samples, f)
    return root
