"""On-device (XLA-fused) input preprocessing.

The last host-side pixel stage of the reference's DexYCB loader
(dexycb6.py:276-509: cv2.warpAffine crop, albumentations color aug,
normalize, RandomErasing, heatmap stamping) re-expressed as ONE jitted
batch graph.  The host keeps only what a CPU must do: JPEG decode, the
2D-point retry-loop math, FK label correction, and drawing the stochastic
aug *parameters* (data/dexycb.py device_mode; augment.py
sample_device_params).  Pixels move to the device once, as uint8 frames.

Stages (train):
  uint8 frames -> bicubic inverse-affine crop (ops/image.affine_warp;
  rotation-aware) -> RGB shift -> color jitter -> combined blur conv ->
  normalize -> RandomErasing fills -> heatmap synthesis (ops/heatmap jax
  generators).  Eval skips the stochastic stages and uses the gather-free
  rectilinear warp path.

The output batch drops the raw fields and carries exactly the host-mode
keys (rgb, hm_hand, hm_obj), so trainer/eval code is mode-agnostic.
Parity with the host pipeline is pinned by tests/test_device_pipeline.py.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.color import color_jitter, depthwise_blur, erase_regions, rgb_shift
from ..ops.heatmap import adaptive_bbox_heatmap, square_bbox_heatmap
from ..ops.image import affine_warp

IMG_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMG_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)

RAW_KEYS = ("rgb_full", "warp_minv", "jt2d", "kpt2d", "rgb_shift",
            "jitter_bcsh", "blur_kernel", "erase_rects")


def preprocess_batch(batch: Dict[str, jax.Array], rng: jax.Array,
                     patch_size: int, heatmap_size: int, hand_sigma: float,
                     obj_sigma: float, is_train: bool,
                     erase_mode: str = "pixel") -> Dict[str, jax.Array]:
    """Raw device-mode batch -> batch with rgb / hm_hand / hm_obj.

    ``is_train`` is static: the eval graph contains no stochastic stages
    and uses the dense rectilinear warp (eval crops never rotate); the
    train graph uses the general rotation-aware warp + the full aug chain.
    """
    x = batch["rgb_full"].astype(jnp.float32)              # (B, H, W, 3)
    x = affine_warp(x, batch["warp_minv"], patch_size,
                    rectilinear=not is_train)
    x = jnp.clip(x, 0.0, 255.0)  # cv2 saturates to uint8 after the warp
    if is_train:
        x = rgb_shift(x, batch["rgb_shift"])
        x = color_jitter(x, batch["jitter_bcsh"])
        x = depthwise_blur(x, batch["blur_kernel"])
    x = (x / 255.0 - IMG_MEAN) / IMG_STD
    if is_train:
        x = erase_regions(x, batch["erase_rects"], rng, mode=erase_mode)

    hm_hand = adaptive_bbox_heatmap(batch["jt2d"], batch["bbox_hand"],
                                    heatmap_size, hand_sigma)
    hm_obj = square_bbox_heatmap(batch["kpt2d"], batch["bbox_obj_rect"],
                                 heatmap_size, obj_sigma,
                                 batch["is_right"])
    out = {k: v for k, v in batch.items() if k not in RAW_KEYS}
    out["rgb"] = x
    out["hm_hand"] = hm_hand.astype(jnp.float32)
    out["hm_obj"] = hm_obj.astype(jnp.float32)
    return out


def make_device_preprocess(cfg, is_train: bool):
    """Jitted closure over the static config knobs.

    Returns ``fn(batch, rng=None) -> batch``; host-side numpy batches are
    fine (jit moves them once).  Under a mesh, call after ``shard_batch`` —
    every stage is per-sample elementwise, so it runs SPMD with no
    collectives.
    """
    P = int(cfg.patch_size)
    H = int(cfg.heatmap_size)
    hs = float(cfg.heatmap_hand_sigma)
    os_ = float(cfg.heatmap_obj_sigma)
    mode = getattr(cfg, "random_erasing_mode", "pixel")

    fn = jax.jit(functools.partial(
        preprocess_batch, patch_size=P, heatmap_size=H, hand_sigma=hs,
        obj_sigma=os_, is_train=is_train, erase_mode=mode))

    def run(batch, rng=None):
        if "rgb_full" not in batch:
            return batch  # already host-preprocessed
        if rng is None:
            rng = jax.random.PRNGKey(0)
        # collate stacks python bools to a numpy bool array; heatmap shift
        # wants it array-like, which it already is
        return fn(batch, rng)

    return run
