"""Multi-hypothesis cue aggregation (hand cascade + object physics ranking).

Functional JAX rewrite of lib/model/aggregation.py.  The reference freely
in-place-mutates candidate tensors and loops per-sample to bound GPU memory
(``cdist_memory_save``/``nn_for_r_memory_save``, aggregation.py:1115-1158);
here every stage is a pure batched function — candidate bookkeeping goes
through ``.at[]`` / ``where`` and the (B, n_cand, 32, 2048) distance tensors
are computed as one batched matmul-based cdist (they fit comfortably in HBM).

Key structures kept bit-compatible with the reference:
  * cascade levels over MANO_PARAMS_LEVEL / MANO_JOINT_LEVEL with the
    observe-downstream-joints trick (aggregation.py:134-157)
  * regression pose injected as extra candidates, with its wrist params
    overwritten by the diffusion wrists at level 0 (:120-143)
  * eigh quaternion averaging of top-k candidates, optionally heat-weighted
  * object: trans top-k -> rot top-k -> k x k cross-product candidates ->
    physics3/heatmap re-ranking switched per-sample by is_grasped (:1199-1287)
  * final per-finger physics re-rank of hand distal/tip levels (:537-626)

Execution parity: the whole module is pinned against the reference's OWN
torch aggregation code running on identical inputs
(tests/test_ref_aggregation_parity.py) — selections bit-identical, fused
outputs within 5e-4.  The reference's select_by_physics computes a
nearest-vertex moment term L it never uses in its score (:571-581); we skip
that dead compute (DEVIATIONS.md D2/D5 — output-identical).  The object
physics3 ranker's live moment-arm arithmetic is reproduced exactly, with
the intent-correct variant behind ``arm_mode="surface"`` (D14).
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..utils import transforms as T
from ..utils.hand import MANO_JOINT_LEVEL, MANO_PARAMS_LEVEL
from ..ops.image import sample_points
from ..ops.pallas_dist import min_dist_and_idx
from . import anchor as anchor_lib
from . import heads
from .mano import MANOModel, hand_joints_meters, hand_verts_meters
from .ycb import YCBRegistry

Array = jax.Array


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def normalize_pt2d_to_bbox(pt2d: Array, bbox: Array) -> Array:
    """Project image-plane points into [-1, 1] bbox-normalized coords.

    pt2d: (B, ..., 2); bbox: (B, 4) xyxy.  (aggregation.py:202-204)
    """
    b = bbox.reshape(bbox.shape[0], *([1] * (pt2d.ndim - 2)), 4)
    return 2.0 * (pt2d - b[..., :2]) / (b[..., 2:] - b[..., :2]) - 1.0


def heat_values(heatmap: Array, pt2d_norm: Array, observe_index: Sequence[int]) -> Array:
    """Bicubic heat lookup for a subset of joints.

    heatmap: (B, J, H, W); pt2d_norm: (B, N, J, 2) -> (B, N, m).
    """
    obs = jnp.asarray(list(observe_index))
    hm = jnp.take(heatmap, obs, axis=1)
    pts = jnp.take(pt2d_norm, obs, axis=2)
    return sample_points(hm, pts, mode="bicubic", align_corners=False)


def batched_min_dist(x: Array, y: Array) -> Array:
    """min_j ||x_i - y_j||: x (..., n, 3), y (..., m, 3) -> (..., n).

    Replaces cdist_memory_save (aggregation.py:1115-1125) with one fused
    matmul-based distance (|x|^2 + |y|^2 - 2xy) — MXU-friendly.
    """
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("...nd,...md->...nm", x, y)
    d2 = jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)
    return jnp.sqrt(jnp.min(d2, axis=-1))


def nearest_points(x: Array, y: Array) -> Array:
    """For each x, the nearest point in y: x (..., n, 3), y (..., m, 3) ->
    (..., n, 3).  (nn_for_r_memory_save, aggregation.py:1128-1158)."""
    return min_dist_and_nearest(x, y)[1]


def min_dist_and_nearest(x: Array, y: Array) -> tuple[Array, Array]:
    """One d2 matrix, both reductions: (min distance (..., n), nearest
    point (..., n, 3)).  Callers needing both (the physics3 ranker) avoid
    materializing the (B, N, 32, 2048) distance tensor twice."""
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("...nd,...md->...nm", x, y)
    d2 = x2 + y2 - 2.0 * xy
    dist = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    idx = jnp.argmin(d2, axis=-1)                                # (..., n)
    near = jnp.take_along_axis(y, idx[..., None].repeat(3, -1), axis=-2)
    return dist, near


def take_candidates(x: Array, idx: Array) -> Array:
    """x: (B, N, ...), idx: (B, K) -> (B, K, ...)."""
    extra = x.ndim - 2
    idxe = idx.reshape(idx.shape + (1,) * extra)
    return jnp.take_along_axis(x, jnp.broadcast_to(idxe, idx.shape + x.shape[2:]), axis=1)


# ---------------------------------------------------------------------------
# hand aggregation
# ---------------------------------------------------------------------------


class HandLevelData(NamedTuple):
    val: Array
    topk: Array
    fused_idx_pose: Array
    topk_idx_pose_aa: Array
    fused_pose: Array


def select_topk_hand_level(
    mano: MANOModel,
    pose: Array,            # (B, N, 48)
    shape: Array,           # (B, N, 10)
    root_joint: Array,      # (B, 3)
    cam_intrinsic: Array,   # (B, 3, 3)
    heatmap: Array,         # (B, 21, H, W)
    bbox: Array,            # (B, 4)
    k: int,
    fuse_index: Sequence[int],
    observe_index: Sequence[int],
    is_independent: bool,
    is_weight: bool,
) -> HandLevelData:
    """One cascade level (select_topk_hand_by_observed_heatmap_and_fuse_by_index,
    aggregation.py:180-284)."""
    B, N = pose.shape[:2]
    K = k
    # joints-only FK: the level score needs projected joints, never verts
    joint = hand_joints_meters(mano, pose, shape)               # (B, N, 21, 3)
    joint_cam = joint + root_joint[:, None, None]
    pt2d = T.project_points_batched(joint_cam, cam_intrinsic)
    pt2d = normalize_pt2d_to_bbox(pt2d, bbox)
    hv = heat_values(heatmap, pt2d, observe_index)              # (B, N, m)

    fuse_idx = jnp.asarray(list(fuse_index))
    if not is_independent:
        score = hv.sum(-1)                                       # (B, N)
        val, topk = jax.lax.top_k(score, K)
        weight = (val + 1e-8) / (val.sum(1, keepdims=True) + 1e-8)
        topk_pose = take_candidates(pose, topk)                  # (B, K, 48)
        topk_idx_pose_aa = topk_pose[:, :, fuse_idx].reshape(B, K, -1, 3)
        quat = T.axis_angle_to_quaternion(topk_idx_pose_aa)      # (B, K, n, 4)
        quat = jnp.swapaxes(quat, 1, 2)                          # (B, n, K, 4)
        fused_quat = T.average_quaternion(quat, weight[:, None] if is_weight else None)
        fused_aa = T.quaternion_to_axis_angle(fused_quat).reshape(B, -1)
    else:
        n = len(fuse_index) // 3                                 # joints fused
        m = len(observe_index)
        n_obs = m // n
        score = hv.reshape(B, N, n_obs, n).mean(-2)              # (B, N, n)
        val, topk = jax.lax.top_k(jnp.swapaxes(score, 1, 2), K)  # (B, n, K)
        val, topk = jnp.swapaxes(val, 1, 2), jnp.swapaxes(topk, 1, 2)  # (B, K, n)
        weight = (val + 1e-8) / (val.sum(1, keepdims=True) + 1e-8)
        weight = jnp.transpose(weight, (0, 2, 1))                # (B, n, K)
        pose_j = pose.reshape(B, N, 16, 3)
        joint_of_param = fuse_idx.reshape(-1, 3)[:, 0] // 3      # (n,)
        # gather pose_j[b, topk[b, k, j], joint_of_param[j]]
        topk_pose = pose_j[
            jnp.arange(B)[:, None, None], topk, joint_of_param[None, None, :]
        ]                                                        # (B, K, n, 3)
        topk_idx_pose_aa = topk_pose
        quat = T.axis_angle_to_quaternion(topk_pose)
        quat = jnp.swapaxes(quat, 1, 2)                          # (B, n, K, 4)
        fused_quat = T.average_quaternion(quat, weight if is_weight else None)
        fused_aa = T.quaternion_to_axis_angle(fused_quat).reshape(B, -1)

    fused_pose = pose.at[:, :, fuse_idx].set(
        jnp.broadcast_to(fused_aa[:, None], (B, N, len(fuse_index)))
    )
    return HandLevelData(val, topk, fused_aa, topk_idx_pose_aa, fused_pose)


def hand_heatmap_cascade(
    mano: MANOModel,
    pose: Array,             # (B, S, 48) diffusion candidates
    pose_regression: Array,  # (B, 48)
    shape: Array,            # (B, S, 10)
    root_joint: Array,
    cam_intrinsic: Array,
    heatmap: Array,
    bbox: Array,
    k: int,
    is_weight: bool = True,
    use_regression_as_candidate: bool = True,
    n_levels: int = 4,
) -> Dict[str, Array]:
    """4-level wrist->tip cascade (select_by_heatmap_cascade, :115-178).

    ``n_levels`` truncates the cascade — the reference's
    select_by_heatmap_cascade_n_level dev variant (:470-535)."""
    B, S = pose.shape[:2]
    if use_regression_as_candidate:
        extra = jnp.broadcast_to(pose_regression[:, None], (B, S, 48))
        pose = jnp.concatenate([pose, extra], axis=1)            # (B, 2S, 48)
        shape = jnp.concatenate([shape, shape], axis=1)

    levels: list[HandLevelData] = []
    for level_i in range(n_levels):
        fuse_idx = MANO_PARAMS_LEVEL[level_i]
        observe_idx: list[int] = []
        for j in range(level_i + 1, 5):
            observe_idx.extend(MANO_JOINT_LEVEL[j])
        if use_regression_as_candidate and level_i == 0:
            # regression copies take the diffusion wrists (:140-143)
            fuse = jnp.asarray(fuse_idx)
            pose = pose.at[:, S:, fuse].set(pose[:, :S, fuse])
        data = select_topk_hand_level(
            mano, pose, shape, root_joint, cam_intrinsic, heatmap, bbox, k,
            fuse_idx, observe_idx, is_independent=level_i != 0, is_weight=is_weight,
        )
        pose = data.fused_pose
        levels.append(data)

    fused_pose = levels[-1].fused_pose[:, 0]                     # (B, 48)
    shape0 = shape[:, 0]
    fused_mano = jnp.concatenate([fused_pose, shape0], axis=-1)
    fused_vert, fused_joint = hand_verts_meters(mano, fused_pose, shape0)
    return {
        "agg_hand_mano": fused_mano,
        "agg_vert": fused_vert,
        "agg_joint": fused_joint,
        "middle_data": levels,
    }


def hand_average_all(mano: MANOModel, pose: Array, shape: Array) -> Dict[str, Array]:
    """Quaternion-mean over all candidates (average_all, :379-424)."""
    B, S = pose.shape[:2]
    pose_aa = pose.reshape(B, S, 16, 3)
    quat = T.axis_angle_to_quaternion(pose_aa)
    quat = jnp.swapaxes(quat, 1, 2)
    fused = T.quaternion_to_axis_angle(T.average_quaternion(quat)).reshape(B, 48)
    shape0 = shape.reshape(B, -1, 10)[:, 0]
    vert, joint = hand_verts_meters(mano, fused, shape0)
    return {
        "agg_hand_mano": jnp.concatenate([fused, shape0], -1),
        "agg_vert": vert,
        "agg_joint": joint,
    }


def hand_physics_rerank(
    mano: MANOModel,
    tables: anchor_lib.ForceAnchorTables,
    pose: Array,            # (B, C, 58) candidates
    root_joint_flip: Array, # (B, 3)
    obj_vert: Array,        # (B, V, 3) fused object surface (camera frame)
    obj_com: Array,         # (B, 1, 3)
    force_local: Array,     # (B, 32, 3)
    k: int,
) -> Dict[str, Array]:
    """Per-finger physics re-rank of distal/tip params (select_by_physics,
    aggregation.py:537-626)."""
    B, C = pose.shape[:2]
    vert, joint = hand_verts_meters(mano, pose[..., :48], pose[..., 48:])
    vert_cam = vert + root_joint_flip[:, None, None]             # (B, C, 778, 3)
    fl = jnp.broadcast_to(force_local[:, None], (B, C, 32, 3))
    force_point, force_global = anchor_lib.force_local_to_global(
        tables, fl, vert_cam
    )                                                            # (B, C, 32, 3)
    force_norm = jnp.linalg.norm(force_global, axis=-1)          # (B, C, 32)
    force_weight = force_norm / (force_norm.sum(-1, keepdims=True) + 1e-12)

    # distance of each anchor point to the object surface — same fused
    # VMEM-resident nearest-vertex kernel as the physics3 ranker (the
    # (B, C, 32, V) distance tensor is ~1.7 GB at blessed shapes)
    dist, _ = min_dist_and_idx(force_point, obj_vert)            # (B, C, 32)
    score = force_weight * dist

    force_dir = force_global / (force_norm[..., None] + 1e-12)
    # NOTE: the reference also computes a torque term L here (:571-577) but
    # never uses it in the final score (:581) — we skip the dead compute.
    I = jnp.linalg.norm(force_dir.sum(-2), axis=-1)              # (B, C)
    score = -(score * I[..., None])                              # (B, C, 32)

    finger_levels = [
        [1, 2, 3, 4], [8, 9, 10, 11], [14, 15, 16, 17], [21, 22, 23, 24], [28, 29, 30, 31]
    ]
    fuse_pose = pose[:, 0]
    for f, anchors in enumerate(finger_levels):
        fscore = score[:, :, jnp.asarray(anchors)].sum(-1)       # (B, C)
        _, topk = jax.lax.top_k(fscore, k)
        fuse_idx = jnp.asarray(
            MANO_PARAMS_LEVEL[2][3 * f : 3 * f + 3] + MANO_PARAMS_LEVEL[3][3 * f : 3 * f + 3]
        )
        sel = take_candidates(pose[..., :48], topk)[:, :, fuse_idx]  # (B, K, 6)
        sel_aa = sel.reshape(B, k, 2, 3)
        quat = jnp.swapaxes(T.axis_angle_to_quaternion(sel_aa), 1, 2)  # (B, 2, K, 4)
        fused = T.quaternion_to_axis_angle(T.average_quaternion(quat)).reshape(B, 6)
        fuse_pose = fuse_pose.at[:, fuse_idx].set(fused)

    fuse_vert, fuse_joint = hand_verts_meters(mano, fuse_pose[:, :48], fuse_pose[:, 48:])
    return {"agg_pose": fuse_pose, "agg_vert": fuse_vert, "agg_joint": fuse_joint}


# ---------------------------------------------------------------------------
# object aggregation
# ---------------------------------------------------------------------------


def obj_topk_by_heatmap(
    registry: YCBRegistry,
    pose6d: Array,          # (B, N, 9), wrist-relative translation
    root_joint: Array,      # (B, 3)
    obj_ids: Array,         # (B,)
    is_right: Array,        # (B,) bool
    cam_intrinsic: Array,
    heatmap: Array,         # (B, 27, H, W)
    bbox: Array,
    k: int,
) -> tuple[Array, Array]:
    """(select_topk_object_by_heatmap, aggregation.py:742-780)."""
    pose_cam = pose6d.at[..., 6:].add(root_joint[:, None])
    pt3d = heads.object_transform(registry, pose_cam, obj_ids, "keypoint")
    pt3d = heads.flip_pt3d(pt3d, is_right)
    pt2d = T.project_points_batched(pt3d, cam_intrinsic)
    pt2d = normalize_pt2d_to_bbox(pt2d, bbox)
    hv = sample_points(heatmap, pt2d, mode="bicubic").sum(-1)    # (B, N)
    val, topk = jax.lax.top_k(hv, k)
    weight = (val + 1e-8) / (val.sum(1, keepdims=True) + 1e-8)
    return topk, weight


def obj_fuse_topk(pose6d: Array, topk: Array, weight: Array | None = None) -> Array:
    """Weighted trans mean + eigh-averaged rotation (fuse_topk, :729-740)."""
    sel = take_candidates(pose6d, topk)                          # (B, K, 9)
    if weight is None:
        trans = sel[..., 6:].mean(1)
    else:
        trans = (sel[..., 6:] * weight[..., None]).sum(1)
    rot = T.average_rot6d(sel[..., :6], weight)
    return jnp.concatenate([rot, trans], axis=-1)


def obj_topk_by_physics3(
    registry: YCBRegistry,
    pose6d: Array,          # (B, N, 9)
    root_joint: Array,
    obj_ids: Array,
    is_right: Array,
    force_point: Array,     # (B, 32, 3)
    force_global: Array,    # (B, 32, 3)
    k: int,
    arm_mode: str = "reference",
) -> tuple[Array, Array]:
    """Weighted force-point-to-surface distance x net-moment ranking
    (select_topk_object_by_physics3, aggregation.py:947-997).

    ``arm_mode`` selects the moment-arm formula for the net-moment factor L
    (DEVIATIONS.md D14):
      * 'reference' (default): the reference's own arithmetic — the arm is
        ``(force_point - nearest_vertex) - CoM`` (nn_for_r_memory_save
        returns x - nearest_y, aggregation.py:1128-1141, then ``r - CoM``
        at :981).  Kept as the default because the published metrics were
        selected with exactly this score.
      * 'surface': the evident geometric intent — the arm from the CoM to
        the contact point on the surface, ``nearest_vertex - CoM``.
    """
    pose_cam = pose6d.at[..., 6:].add(root_joint[:, None])
    obj_com = heads.object_transform(registry, pose_cam, obj_ids, "CoM")
    obj_com = heads.flip_pt3d(obj_com, is_right)                 # (B, N, 1, 3)

    fnorm = jnp.linalg.norm(force_global, axis=-1)               # (B, 32)
    fweight = fnorm / (fnorm.sum(-1, keepdims=True) + 1e-12)

    # Distances are isometry-invariant: |fp - flip(R v + t)| =
    # |R^T (flip(fp) - t) - v|, so transform the 32 force points into each
    # candidate's canonical frame instead of materializing (and flipping)
    # the (B, N, 2048, 3) transformed vertex sets — same math, ~3x less
    # HBM traffic around the distance matrix.
    B_, N_ = pose_cam.shape[:2]
    rotmat = T.rotation_6d_to_matrix(pose_cam[..., :6])          # (B, N, 3, 3)
    trans = pose_cam[..., 6:]                                    # (B, N, 3)
    verts = heads.object_points(registry, obj_ids, "verts")     # (B, V, 3)
    fp_flip = T.flip_point3d(force_point, ~is_right)             # (B, 32, 3)
    fp_local = jnp.einsum(
        "bnij,bnki->bnkj", rotmat, fp_flip[:, None] - trans[:, :, None],
        precision=jax.lax.Precision.HIGHEST)                     # (B, N, 32, 3)
    # fused nearest-vertex search: on TPU a Pallas kernel keeps each
    # (candidates, V) distance tile in VMEM instead of round-tripping the
    # (B, N, 32, V) tensor through HBM for min+argmin (ops/pallas_dist)
    dist, idx = min_dist_and_idx(fp_local, verts)                # (B, N, 32)
    near_canon = verts[jnp.arange(B_)[:, None, None], idx]       # (B, N, 32, 3)
    near = jnp.einsum("bnij,bnkj->bnki", rotmat, near_canon,
                      precision=jax.lax.Precision.HIGHEST) + trans[:, :, None]
    near = heads.flip_pt3d(near, is_right)                       # camera frame
    score = (dist * fweight[:, None]).sum(-1)                    # (B, N)

    fdir = force_global / (fnorm[..., None] + 1e-12)
    r = (force_point[:, None] - near) if arm_mode == "reference" else near
    r = r - obj_com                                              # (B, N, 32, 3)
    L = jnp.linalg.norm(jnp.cross(fdir[:, None], r).sum(-2), axis=-1)  # (B, N)
    score = -(score * L)
    val, topk = jax.lax.top_k(score, k)
    weight = jnp.ones_like(val) / k                              # :995-996
    return topk, weight


# ---------------------------------------------------------------------------
# full HOI orchestration (HOI_Aggregator, aggregation.py:1160-1353)
# ---------------------------------------------------------------------------


def hoi_aggregate(
    mano: MANOModel,
    registry: YCBRegistry,
    tables: anchor_lib.ForceAnchorTables,
    *,
    cam_intrinsic: Array,
    root_joint_flip: Array,
    root_joint: Array,
    is_right: Array,
    force_local: Array,
    is_grasped: Array,
    hand_pose_diff: Array,      # (B, S, 48)
    hand_pose_regression: Array,
    hand_shape: Array,          # (B, S, 10)
    hand_heatmap: Array,
    hand_bbox: Array,
    hand_topk: int,
    obj_pose6d: Array,          # (B, S, 9)
    obj_heatmap: Array,
    obj_bbox: Array,
    obj_topk: int,
    obj_ids: Array,
    phy_topk: int = 5,
    is_weight: bool = True,
    use_regression_as_candidate: bool = True,
    do_physics_selection: bool = True,
) -> Dict[str, Array]:
    """5-stage orchestration.  The three static flags expose the CLI surface
    --do_weighted_average / --use_regression_as_candidate /
    --do_physics_selection (args.py:233-246 — parsed but left unwired in the
    reference, whose live path hardcodes them True, aggregation.py:1188-1189;
    we make them live).  do_physics_selection=False replaces the stage-4
    grasped-sample physics re-rank with the heatmap rank and skips the
    stage-5 per-finger physics re-rank entirely."""
    B = root_joint.shape[0]
    # the stage-4 candidate set is obj_topk^2 and stage-5's is hand_topk+1;
    # clamp the re-rank k so tiny eval configs remain valid
    phy_topk = min(phy_topk, obj_topk * obj_topk, hand_topk + 1)

    # 1. hand heatmap cascade
    hand_sel = hand_heatmap_cascade(
        mano, hand_pose_diff, hand_pose_regression, hand_shape,
        root_joint_flip, cam_intrinsic, hand_heatmap, hand_bbox, hand_topk,
        is_weight=is_weight,
        use_regression_as_candidate=use_regression_as_candidate,
    )
    agg_hand_mano = hand_sel["agg_hand_mano"]
    hand_vert_cam = hand_sel["agg_vert"] + root_joint_flip[:, None]
    force_point, force_global = anchor_lib.force_local_to_global(
        tables, force_local, hand_vert_cam
    )

    # 2. object translation top-k by heatmap
    transl_topk, transl_weight = obj_topk_by_heatmap(
        registry, obj_pose6d, root_joint, obj_ids, is_right,
        cam_intrinsic, obj_heatmap, obj_bbox, obj_topk,
    )
    fused = obj_fuse_topk(obj_pose6d, transl_topk,
                          transl_weight if is_weight else None)
    fused_trans = fused[:, 6:]

    # 3. rotation top-k with the fused translation substituted
    updated = obj_pose6d.at[..., 6:].set(fused_trans[:, None])
    rot_topk, _ = obj_topk_by_heatmap(
        registry, updated, root_joint, obj_ids, is_right,
        cam_intrinsic, obj_heatmap, obj_bbox, obj_topk,
    )

    # 4. k x k cross-product candidates, physics vs heatmap re-rank
    cand_transl = take_candidates(obj_pose6d, transl_topk)[..., 6:]  # (B, k, 3)
    cand_rot = take_candidates(obj_pose6d, rot_topk)[..., :6]        # (B, k, 6)
    k = obj_topk
    cand = jnp.concatenate(
        [
            jnp.broadcast_to(cand_rot[:, None], (B, k, k, 6)),
            jnp.broadcast_to(cand_transl[:, :, None], (B, k, k, 3)),
        ],
        axis=-1,
    ).reshape(B, k * k, 9)

    topk_hm, weight_hm = obj_topk_by_heatmap(
        registry, cand, root_joint, obj_ids, is_right,
        cam_intrinsic, obj_heatmap, obj_bbox, phy_topk,
    )
    if do_physics_selection:
        topk_phy, weight_phy = obj_topk_by_physics3(
            registry, cand, root_joint, obj_ids, is_right, force_point,
            force_global, phy_topk)
        grasped = is_grasped.astype(bool)[:, None]
        new_topk = jnp.where(grasped, topk_phy, topk_hm)
        new_weight = jnp.where(grasped, weight_phy, weight_hm)
    else:
        new_topk, new_weight = topk_hm, weight_hm
    obj_agg_6d = obj_fuse_topk(cand, new_topk,
                               new_weight if is_weight else None)

    pose_cam = obj_agg_6d.at[..., 6:].add(root_joint)
    obj_vert_fused = heads.object_transform(registry, pose_cam, obj_ids, "verts")
    obj_vert_fused = heads.flip_pt3d(obj_vert_fused, is_right)
    obj_com_fused = heads.object_transform(registry, pose_cam, obj_ids, "CoM")
    obj_com_fused = heads.flip_pt3d(obj_com_fused, is_right)

    if not do_physics_selection:
        return {
            "obj_agg_6d": obj_agg_6d,
            "agg_obj_vert": obj_vert_fused,
            "hand_agg_mano": agg_hand_mano,
            "hand_agg_vert": hand_sel["agg_vert"],
            "hand_agg_joint": hand_sel["agg_joint"],
        }

    # 5. per-finger physics re-rank over distal/tip level candidates
    level4 = hand_sel["middle_data"][3].topk_idx_pose_aa[:, :hand_topk]  # (B, K, 5, 3)
    agg_l3 = agg_hand_mano[:, jnp.asarray(MANO_PARAMS_LEVEL[2])].reshape(B, 1, 5, 3)
    agg_l4 = agg_hand_mano[:, jnp.asarray(MANO_PARAMS_LEVEL[3])].reshape(B, 1, 5, 3)
    level4 = jnp.concatenate([level4, agg_l4], axis=1)           # (B, K+1, 5, 3)
    n_cand = hand_topk + 1
    cand_param = jnp.concatenate(
        [jnp.broadcast_to(agg_l3, (B, n_cand, 5, 3)), level4], axis=-2
    )                                                            # (B, K+1, 10, 3)
    new_pose = jnp.broadcast_to(agg_hand_mano[:, None, :48], (B, n_cand, 48))
    new_pose = new_pose.at[:, :, jnp.asarray(MANO_PARAMS_LEVEL[2])].set(
        cand_param[:, :, :5].reshape(B, n_cand, 15)
    )
    new_pose = new_pose.at[:, :, jnp.asarray(MANO_PARAMS_LEVEL[3])].set(
        cand_param[:, :, 5:].reshape(B, n_cand, 15)
    )
    shape_rep = jnp.broadcast_to(agg_hand_mano[:, None, 48:], (B, n_cand, 10))
    new_cand = jnp.concatenate([new_pose, shape_rep], axis=-1)   # (B, K+1, 58)

    hand_final = hand_physics_rerank(
        mano, tables, new_cand, root_joint_flip,
        obj_vert_fused, obj_com_fused, force_local, phy_topk,
    )

    return {
        "obj_agg_6d": obj_agg_6d,
        "agg_obj_vert": obj_vert_fused,
        "hand_agg_mano": hand_final["agg_pose"],
        "hand_agg_vert": hand_final["agg_vert"],
        "hand_agg_joint": hand_final["agg_joint"],
    }


# ---------------------------------------------------------------------------
# remaining aggregation modes + mode dispatch (CLI surface parity:
# --aggregation_mode_hand / --aggregation_mode_obj, args.py:235-245)
# ---------------------------------------------------------------------------


def hand_select_by_heatmap(mano: MANOModel, pose: Array, shape: Array,
                           root_joint: Array, cam_intrinsic: Array, heatmap: Array,
                           bbox: Array, k: int, is_weight: bool = True) -> Dict[str, Array]:
    """Single-level whole-pose heatmap selection (select_by_heatmap, :82-113)."""
    B = pose.shape[0]
    data = select_topk_hand_level(
        mano, pose, shape, root_joint, cam_intrinsic, heatmap, bbox, k,
        fuse_index=list(range(48)), observe_index=list(range(21)),
        is_independent=False, is_weight=is_weight,
    )
    fused_pose = data.fused_pose[:, 0]
    shape0 = shape[:, 0]
    vert, joint = hand_verts_meters(mano, fused_pose, shape0)
    return {
        "agg_hand_mano": jnp.concatenate([fused_pose, shape0], -1),
        "agg_vert": vert, "agg_joint": joint, "topk": data.topk,
    }


def hand_select_random(mano: MANOModel, pose: Array, shape: Array) -> Dict[str, Array]:
    """Take candidate 0 (random, :426-467 — candidates are i.i.d. samples)."""
    B = pose.shape[0]
    fused = pose[:, 0]
    shape0 = shape[:, 0]
    vert, joint = hand_verts_meters(mano, fused, shape0)
    return {
        "agg_hand_mano": jnp.concatenate([fused, shape0], -1),
        "agg_vert": vert, "agg_joint": joint,
    }


def hand_select_by_2d_pt(mano: MANOModel, pose: Array, shape: Array,
                         root_joint: Array, cam_intrinsic: Array, heatmap: Array,
                         bbox: Array, k: int, level: str = "pose") -> Dict[str, Array]:
    """Rank by distance of projected joints to the heatmap argmax peaks
    (select_by_2D_pt, :286-377).  level in {'pose', 'joint'}."""
    B, N = pose.shape[:2]
    J, H, W = heatmap.shape[1:]
    joint = hand_joints_meters(mano, pose, shape)
    joint_cam = joint + root_joint[:, None, None]
    pt2d_proj = normalize_pt2d_to_bbox(
        T.project_points_batched(joint_cam, cam_intrinsic), bbox)

    # heatmap peaks in normalized coords (argmax per joint, :313-323)
    flat = heatmap.reshape(B, J, -1)
    ind = jnp.argmax(flat, axis=-1)
    # NOTE: the reference builds XX from an ij-meshgrid, making its "x" track
    # the ROW index (same quirk as the heatmap realignment); we use the
    # geometrically correct column->x mapping.
    px = (ind % W).astype(heatmap.dtype) / (W - 1) * 2 - 1
    py = (ind // W).astype(heatmap.dtype) / (H - 1) * 2 - 1
    pt2d_hm = jnp.stack([px, py], axis=-1)                       # (B, J, 2)
    score = -jnp.linalg.norm(pt2d_proj - pt2d_hm[:, None], axis=-1)  # (B, N, J)

    if level == "pose":
        val, topk = jax.lax.top_k(score.sum(-1), k)
        sel = take_candidates(pose, topk).reshape(B, k, 16, 3)
        quat = jnp.swapaxes(T.axis_angle_to_quaternion(sel), 1, 2)
        fused = T.quaternion_to_axis_angle(T.average_quaternion(quat)).reshape(B, 48)
        shape0 = shape[:, 0]
        fvert, fjoint = hand_verts_meters(mano, fused, shape0)
        return {
            "agg_hand_mano": jnp.concatenate([fused, shape0], -1),
            "agg_vert": fvert, "agg_joint": fjoint, "topk": topk,
        }
    # joint level: per-joint top-k joint-position mean (no valid mesh)
    val, topk = jax.lax.top_k(jnp.swapaxes(score, 1, 2), k)       # (B, J, k)
    jsel = jnp.take_along_axis(
        jnp.swapaxes(joint, 1, 2), topk[..., None].repeat(3, -1), axis=2)
    fused_joint = jsel.mean(2)                                    # (B, J, 3)
    return {
        "agg_hand_mano": jnp.zeros((B, 58), pose.dtype),
        "agg_vert": jnp.zeros((B, 778, 3), pose.dtype),
        "agg_joint": fused_joint, "topk": topk,
    }


def aggregate_hand(mode: str, mano: MANOModel, **kw) -> Dict[str, Array]:
    """Mode dispatch (HandAggregator.__call__, :63-79)."""
    if mode in ("heatmap_cascade", "heatmap_cascade_n_level"):
        return hand_heatmap_cascade(
            mano, kw["pose"], kw["pose_regression"], kw["shape"], kw["root_joint"],
            kw["cam_intrinsic"], kw["heatmap"], kw["bbox"], kw["k"],
            is_weight=kw.get("is_weight", True),
            use_regression_as_candidate=kw.get("use_regression_as_candidate", True),
            n_levels=kw.get("n_level", 2) if mode.endswith("n_level") else 4)
    if mode == "heatmap":
        return hand_select_by_heatmap(
            mano, kw["pose"], kw["shape"], kw["root_joint"], kw["cam_intrinsic"],
            kw["heatmap"], kw["bbox"], kw["k"], kw.get("is_weight", True))
    if mode in ("2D_pt_pose", "2D_pt_joint"):
        return hand_select_by_2d_pt(
            mano, kw["pose"], kw["shape"], kw["root_joint"], kw["cam_intrinsic"],
            kw["heatmap"], kw["bbox"], kw["k"],
            level="pose" if mode.endswith("pose") else "joint")
    if mode == "average_all":
        return hand_average_all(mano, kw["pose"], kw["shape"])
    if mode == "random":
        return hand_select_random(mano, kw["pose"], kw["shape"])
    raise NotImplementedError(mode)


def obj_heatmap_cascade(
    registry: YCBRegistry,
    pose6d: Array,          # (B, N, 9)
    root_joint: Array,
    obj_ids: Array,
    is_right: Array,
    cam_intrinsic: Array,
    heatmap: Array,
    bbox: Array,
    k: int,
    is_weight: bool = True,
    force_selection: bool = False,
    force_point: Array | None = None,
    force_global: Array | None = None,
    is_grasped: Array | None = None,
    phy_topk: int = 5,
) -> Dict[str, Array]:
    """Standalone object cascade (ObjectAggregator.select_by_heatmap_cascade,
    aggregation.py:661-722): trans1 -> rot1 -> trans2|rot1 -> rot2|trans1,
    then either the k x k force/heatmap re-rank (``force_selection``, the
    "HO3Dv2-ADDS 15.35 -> 14.15" switch, :691) or a plain trans2+rot2 fuse.

    Deviation (documented): the reference's non-force fuse of trans2 reads
    candidates from a tensor whose translations were already overwritten by
    fused_trans1 (:671->708), collapsing trans2 to trans1 — we fuse from the
    actual trans2 candidate set, the clear intent.
    """
    B, N = pose6d.shape[:2]
    common = dict(registry=registry, root_joint=root_joint, obj_ids=obj_ids,
                  is_right=is_right, cam_intrinsic=cam_intrinsic,
                  heatmap=heatmap, bbox=bbox)

    topk, w = obj_topk_by_heatmap(pose6d=pose6d, k=k, **common)
    fused_trans1 = obj_fuse_topk(pose6d, topk, w if is_weight else None)[:, 6:]

    p_rot1 = pose6d.at[..., 6:].set(fused_trans1[:, None])
    topk, w = obj_topk_by_heatmap(pose6d=p_rot1, k=k, **common)
    fused_rot1 = obj_fuse_topk(p_rot1, topk, w if is_weight else None)[:, :6]

    p_trans2 = pose6d.at[..., :6].set(fused_rot1[:, None])
    topk_t2, _ = obj_topk_by_heatmap(pose6d=p_trans2, k=k, **common)
    # the reference's rot2 stage scores ori-rotations with trans=fused_trans1
    # (:685-688) — a tensor byte-identical to the rot1 stage's, so its
    # selection is the rot1 selection; reuse it instead of re-running the
    # full FK + projection + heat-sampling pass over all N candidates
    p_rot2, topk_r2 = p_rot1, topk

    if force_selection:
        assert force_point is not None and is_grasped is not None
        phy_topk = min(phy_topk, k * k)
        trans2_cand = take_candidates(p_trans2, topk_t2).at[..., :6].set(0.0)
        rot2_cand = take_candidates(p_rot2, topk_r2).at[..., 6:].set(0.0)
        cand = (trans2_cand[:, None] + rot2_cand[:, :, None]).reshape(B, k * k, 9)
        topk_p, _ = obj_topk_by_physics3(
            registry, cand, root_joint, obj_ids, is_right,
            force_point, force_global, phy_topk)
        topk_h, _ = obj_topk_by_heatmap(pose6d=cand, k=phy_topk, **common)
        grasped = is_grasped.astype(bool)[:, None]
        new_topk = jnp.where(grasped, topk_p, topk_h)
        fused = obj_fuse_topk(cand, new_topk)            # unweighted (ref :706)
    else:
        # both final fuses are UNWEIGHTED regardless of is_weight, exactly
        # as the reference (:708-710 passes no weight to fuse_topk)
        t2 = obj_fuse_topk(p_trans2, topk_t2)[:, 6:]
        r2 = obj_fuse_topk(p_rot2, topk_r2)[:, :6]
        fused = jnp.concatenate([r2, t2], axis=-1)
    return _obj_result(registry, fused, root_joint, obj_ids, is_right, pose6d)


def obj_select_by_2d_pt(registry: YCBRegistry, pose6d: Array, root_joint: Array,
                        obj_ids: Array, is_right: Array, cam_intrinsic: Array,
                        heatmap: Array, bbox: Array, k: int) -> Dict[str, Array]:
    """Object 2D-peak ranking (select_by_2D_pt, :1001-1052, 'pose' level)."""
    B, N = pose6d.shape[:2]
    J, H, W = heatmap.shape[1:]
    pose_cam = pose6d.at[..., 6:].add(root_joint[:, None])
    pt3d = heads.object_transform(registry, pose_cam, obj_ids, "keypoint")
    pt3d = heads.flip_pt3d(pt3d, is_right)
    pt2d_proj = normalize_pt2d_to_bbox(
        T.project_points_batched(pt3d, cam_intrinsic), bbox)
    flat = heatmap.reshape(B, J, -1)
    ind = jnp.argmax(flat, axis=-1)
    px = (ind % W).astype(heatmap.dtype) / (W - 1) * 2 - 1
    py = (ind // W).astype(heatmap.dtype) / (H - 1) * 2 - 1
    pt2d_hm = jnp.stack([px, py], axis=-1)
    score = -jnp.linalg.norm(pt2d_proj - pt2d_hm[:, None], axis=-1).sum(-1)
    _, topk = jax.lax.top_k(score, k)
    fused = obj_fuse_topk(pose6d, topk)
    return _obj_result(registry, fused, root_joint, obj_ids, is_right, pose6d)


def _obj_result(registry, fused, root_joint, obj_ids, is_right, candidates):
    pose_cam = fused.at[..., 6:].add(root_joint)
    vert = heads.object_transform(registry, pose_cam, obj_ids, "verts")
    vert = heads.flip_pt3d(vert, is_right)
    return {"agg_6d": fused, "candidate_6d": candidates, "agg_obj_vert": vert}


def aggregate_obj(mode: str, registry: YCBRegistry, **kw) -> Dict[str, Array]:
    """Mode dispatch (ObjectAggregator.__call__, :632-644), standalone modes.

    The live predict path uses the HOI orchestration (hoi_aggregate) instead;
    these cover the CLI's non-default choices.
    """
    common = (kw["pose6d"], kw["root_joint"], kw["obj_ids"], kw["is_right"])
    if mode == "heatmap_cascade":
        return obj_heatmap_cascade(
            registry, *common, kw["cam_intrinsic"], kw["heatmap"], kw["bbox"],
            kw["k"], is_weight=kw.get("is_weight", True),
            force_selection=kw.get("force_selection", False),
            force_point=kw.get("force_point"),
            force_global=kw.get("force_global"),
            is_grasped=kw.get("is_grasped"))
    if mode == "heatmap":
        topk, weight = obj_topk_by_heatmap(
            registry, *common, kw["cam_intrinsic"], kw["heatmap"], kw["bbox"], kw["k"])
        fused = obj_fuse_topk(kw["pose6d"], topk,
                              weight if kw.get("is_weight", True) else None)
        return _obj_result(registry, fused, kw["root_joint"], kw["obj_ids"],
                           kw["is_right"], kw["pose6d"])
    if mode == "2D_pt_pose":
        return obj_select_by_2d_pt(
            registry, *common, kw["cam_intrinsic"], kw["heatmap"], kw["bbox"], kw["k"])
    if mode == "average_all":
        B, N = kw["pose6d"].shape[:2]
        topk = jnp.broadcast_to(jnp.arange(min(kw["k"], N))[None],
                                (B, min(kw["k"], N)))
        fused = obj_fuse_topk(kw["pose6d"], topk)
        return _obj_result(registry, fused, kw["root_joint"], kw["obj_ids"],
                           kw["is_right"], kw["pose6d"])
    if mode == "random":
        B = kw["pose6d"].shape[0]
        topk = jnp.zeros((B, 1), jnp.int32)
        fused = obj_fuse_topk(kw["pose6d"], topk)
        return _obj_result(registry, fused, kw["root_joint"], kw["obj_ids"],
                           kw["is_right"], kw["pose6d"])
    raise NotImplementedError(mode)
