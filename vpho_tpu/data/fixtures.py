"""Synthetic, geometrically-consistent batches for hermetic tests/benches.

The reference offers no test fixtures (SURVEY.md §4); real DexYCB requires a
large download.  This module fabricates batches with the exact key contract
of the live dataset (dexycb6.py:471-508) whose geometry is self-consistent:
GT MANO params -> FK verts/joints, a camera, projected 2D joints -> bboxes ->
GT heatmaps, an object pose near the hand -> keypoints/heatmaps.  Everything
is deterministic in the PRNG key.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mano import MANOModel, hand_verts_meters
from ..models import heads
from ..ops.heatmap import adaptive_bbox_heatmap, square_bbox_heatmap
from ..utils import transforms as T


def _bbox_from_pts(pt2d: jax.Array, scale: float, size: int) -> jax.Array:
    """Tight bbox around 2D points, expanded by ``scale``, clipped to crop."""
    mn = pt2d.min(axis=-2)
    mx = pt2d.max(axis=-2)
    c = (mn + mx) / 2
    half = (mx - mn) / 2 * scale + 2.0
    bbox = jnp.concatenate([c - half, c + half], axis=-1)
    return jnp.clip(bbox, 0.0, size - 1.0)


def _rectangularize(bbox: jax.Array, size: int) -> jax.Array:
    """Square bbox with the max side (misc_fn rectangularize semantics)."""
    c = (bbox[..., :2] + bbox[..., 2:]) / 2
    half = jnp.max(bbox[..., 2:] - bbox[..., :2], axis=-1, keepdims=True) / 2
    sq = jnp.concatenate([c - half, c + half], axis=-1)
    return jnp.clip(sq, 0.0, size - 1.0)


_JIT_CACHE: dict = {}


def make_batch(ctx, key: jax.Array, batch_size: int = 2, patch_size: int = 128,
               heatmap_size: int = 64, signal: bool = False) -> Dict[str, jax.Array]:
    """Build one synthetic batch (jitted per shape — eager per-op dispatch is
    pathologically slow on small hosts).

    ``signal=True`` paints the projected hand joints / object keypoints into
    the image as Gaussian blobs (hand in channel 0, object in channel 1) so
    an image->pose mapping actually EXISTS: fresh-key batches then form a
    learnable synthetic task for end-to-end convergence demos
    (bench_convergence.py), not just a shape/contract fixture."""
    sig = (id(ctx.mano.v_template), batch_size, patch_size, heatmap_size, signal)
    if sig not in _JIT_CACHE:
        _JIT_CACHE[sig] = jax.jit(
            lambda k: _make_batch_impl(ctx, k, batch_size, patch_size,
                                       heatmap_size, signal))
    return _JIT_CACHE[sig](key)


def _paint_blobs(pt2d: jax.Array, size: int, sigma: float) -> jax.Array:
    """Sum-of-Gaussians splat of (B, N, 2) points onto a (B, size, size) map,
    evaluated as a separable outer product (no gathers)."""
    ax = jnp.arange(size, dtype=jnp.float32)
    gx = jnp.exp(-((ax[None, None] - pt2d[..., 0:1]) ** 2) / (2 * sigma**2))
    gy = jnp.exp(-((ax[None, None] - pt2d[..., 1:2]) ** 2) / (2 * sigma**2))
    return jnp.einsum("bny,bnx->byx", gy, gx)


def _make_batch_impl(ctx, key: jax.Array, batch_size: int = 2, patch_size: int = 128,
                     heatmap_size: int = 64, signal: bool = False) -> Dict[str, jax.Array]:
    B = batch_size
    keys = jax.random.split(key, 10)
    mano: MANOModel = ctx.mano

    gt_pose = jax.random.normal(keys[0], (B, 48)) * 0.2
    gt_shape = jax.random.normal(keys[1], (B, 10)) * 0.3
    gt_mano = jnp.concatenate([gt_pose, gt_shape], axis=-1)
    vert, joint = hand_verts_meters(ctx.mano, gt_pose, gt_shape)

    root = jnp.concatenate(
        [jax.random.normal(keys[2], (B, 2)) * 0.02,
         0.5 + jax.random.uniform(keys[3], (B, 1)) * 0.2], axis=-1)
    f = patch_size * 2.2
    K = jnp.tile(jnp.array([[f, 0, patch_size / 2], [0, f, patch_size / 2], [0, 0, 1.0]]),
                 (B, 1, 1))

    joint_cam = joint + root[:, None]
    jt2d = T.project_points_batched(joint_cam, K)
    bbox_hand = _bbox_from_pts(jt2d, 1.2, patch_size)
    bbox_hand_rect = _rectangularize(bbox_hand, patch_size)

    obj_ids = jax.random.randint(keys[4], (B,), 0, 21)
    obj_rot = T.matrix_to_rotation_6d(
        T.axis_angle_to_matrix(jax.random.normal(keys[5], (B, 3))))
    # object translation: near the hand, wrist-relative (dexycb6.py:447-451)
    obj_trans_rel = jax.random.normal(keys[6], (B, 3)) * 0.03
    gt_obj = jnp.concatenate([obj_rot, obj_trans_rel], axis=-1)

    kpt_cam = heads.object_transform(
        ctx.registry, gt_obj.at[..., 6:].add(root), obj_ids, "keypoint")
    kpt2d = T.project_points_batched(kpt_cam, K)
    bbox_obj = _bbox_from_pts(kpt2d, 1.2, patch_size)
    bbox_obj_rect = _rectangularize(bbox_obj, patch_size)

    hm_hand = adaptive_bbox_heatmap(jt2d, bbox_hand, heatmap_size, 2.0)
    hm_obj = square_bbox_heatmap(kpt2d, bbox_obj, heatmap_size, 2.0)

    # unit gravity DIRECTION (the reference gravity assets are unit vectors)
    gravity = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (B, 1, 1))
    force_local = jax.random.normal(keys[7], (B, 32, 3)) * 0.1

    rgb = jax.random.normal(keys[8], (B, patch_size, patch_size, 3)) * 0.5
    if signal:
        sigma = patch_size / 64.0
        hand_map = _paint_blobs(jt2d, patch_size, sigma)
        obj_map = _paint_blobs(kpt2d, patch_size, sigma)
        rgb = (rgb * 0.1).at[..., 0].add(2.0 * hand_map).at[..., 1].add(2.0 * obj_map)

    return {
        "rgb": rgb,
        "bbox_hand": bbox_hand,
        "bbox_obj": bbox_obj,
        "bbox_hand_rect": bbox_hand_rect,
        "bbox_obj_rect": bbox_obj_rect,
        "is_right": jnp.ones((B,), bool),
        "is_ho3d": jnp.zeros((B,), bool),
        "is_grasped": jnp.ones((B,), jnp.float32),
        "root_joint": root,
        "root_joint_flip": root,
        "cam_intr_crop": K,
        "cam_intr_crop_flip": K,
        "gravity": gravity,
        "obj_CoM": heads.object_transform(
            ctx.registry, gt_obj.at[..., 6:].add(root), obj_ids, "CoM"),
        "obj_id": obj_ids,
        "obj_name": obj_ids,  # integer ids everywhere in the TPU build
        "gt_mano": gt_mano,
        "gt_obj": gt_obj,
        "gt_hand_vert_flip": vert,
        "gt_hand_jt3d_flip": joint,
        "hm_hand": hm_hand,
        "hm_obj": hm_obj,
        "force_local": force_local,
    }
