"""Pure-JAX MANO hand layer (LBS forward kinematics).

TPU-native replacement for manopth's ``ManoLayer`` as used by the reference
(``lib/model/head_mano.py:48-55``: right hand, ``flat_hand_mean=True``,
``use_pca=False``, ``center_idx=0``, no trans).  The whole FK is a fixed
compute graph of 16 tiny matmuls + one (778,16)x(16,4,4) blend + one batched
point transform — it jits/vmaps cleanly and is the workhorse of candidate
aggregation (called on bs*(S+1) poses x 5 passes per eval batch upstream,
reference aggregation.py:196, 551).

Semantics pinned to manopth:
  * input pose: (..., 48) axis-angle, joint order
    [root, index(3), middle(3), pinky(3), ring(3), thumb(3)]
  * output verts (..., 778, 3) and joints (..., 21, 3) in MILLIMETERS,
    root(wrist)-centered (center_idx=0).  ``get_hand_verts`` (reference
    head_mano.py:78-87) divides by 1000 to meters — we expose
    ``hand_verts_meters`` for that.
  * 21-joint order: wrist, thumb*4, index*4, middle*4, ring*4, pinky*4
    (manopth reorder [0,13,14,15,16,1,2,3,17,4,5,6,18,10,11,12,19,7,8,9,20]).

Assets: loads ``MANO_RIGHT.pkl``/``MANO_LEFT.pkl`` when present (handles the
chumpy arrays inside); otherwise builds a deterministic synthetic model with
identical structure so tests and CI run hermetically (SURVEY.md §4/§7).
"""
from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# manopth fingertip vertex ids (right hand) and final 21-joint reorder
TIP_IDS = (745, 317, 444, 556, 673)
JOINT_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20)
# MANO 16-joint kinematic tree: wrist, index(1-3), middle(4-6), pinky(7-9),
# ring(10-12), thumb(13-15)
PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)

NUM_VERTS = 778
NUM_JOINTS = 16
NUM_SHAPE = 10


class MANOModel(NamedTuple):
    """Static MANO blend-model tensors (device arrays)."""

    v_template: jax.Array      # (778, 3)
    shapedirs: jax.Array       # (778, 3, 10)
    posedirs: jax.Array        # (778, 3, 135)
    J_regressor: jax.Array     # (16, 778)
    weights: jax.Array         # (778, 16)
    faces: np.ndarray          # (1538, 3) int — host-side, topology only
    hands_components: jax.Array  # (45, 45) PCA basis (for dataset PCA->aa)
    hands_mean: jax.Array      # (45,)
    side: str = "right"


def _undo_chumpy(x):
    return np.asarray(x, dtype=np.float64) if not hasattr(x, "r") else np.asarray(x.r, dtype=np.float64)


def load_mano_pkl(path: str) -> MANOModel:
    """Load an official MANO pkl (chumpy-laden) into plain arrays."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    J_reg = data["J_regressor"]
    if hasattr(J_reg, "todense"):
        J_reg = np.asarray(J_reg.todense())
    shapedirs = _undo_chumpy(data["shapedirs"])
    side = "left" if "LEFT" in os.path.basename(path).upper() else "right"
    return MANOModel(
        v_template=jnp.asarray(_undo_chumpy(data["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(_undo_chumpy(data["posedirs"]), jnp.float32),
        J_regressor=jnp.asarray(J_reg, jnp.float32),
        weights=jnp.asarray(_undo_chumpy(data["weights"]), jnp.float32),
        faces=np.asarray(data["f"], np.int32),
        hands_components=jnp.asarray(_undo_chumpy(data["hands_components"]), jnp.float32),
        hands_mean=jnp.asarray(_undo_chumpy(data["hands_mean"]), jnp.float32),
        side=side,
    )


def synthetic_mano(seed: int = 0, side: str = "right") -> MANOModel:
    """Deterministic synthetic MANO-shaped model for hermetic tests.

    Geometry is a plausible hand-scale point cloud (~18cm span) with a valid
    kinematic layout so FK outputs are well-conditioned; it is NOT the real
    hand — real metrics require the official asset.
    """
    rng = np.random.RandomState(seed)
    # joints laid out like a flat hand: wrist at origin, 5 digit chains
    joints = np.zeros((NUM_JOINTS, 3))
    finger_dirs = {
        1: np.array([0.95, 0.20, 0.0]),   # index
        4: np.array([1.0, 0.0, 0.0]),     # middle
        7: np.array([0.90, -0.35, 0.0]),  # pinky
        10: np.array([0.95, -0.18, 0.0]), # ring
        13: np.array([0.60, 0.65, 0.0]),  # thumb
    }
    for base, d in finger_dirs.items():
        d = d / np.linalg.norm(d)
        joints[base] = d * 0.09
        joints[base + 1] = d * 0.12
        joints[base + 2] = d * 0.145
    # verts: cluster around bones with noise
    seg = rng.randint(0, NUM_JOINTS, size=NUM_VERTS)
    alpha = rng.rand(NUM_VERTS, 1)
    parents = np.array(PARENTS)
    parent_pos = joints[np.where(parents[seg] < 0, 0, parents[seg])]
    v_template = parent_pos + alpha * (joints[seg] - parent_pos) + rng.randn(NUM_VERTS, 3) * 0.008
    # J_regressor: average of the nearest verts to each joint
    J_reg = np.zeros((NUM_JOINTS, NUM_VERTS))
    d2 = ((joints[:, None] - v_template[None]) ** 2).sum(-1)
    nearest = np.argsort(d2, axis=1)[:, :20]
    for j in range(NUM_JOINTS):
        J_reg[j, nearest[j]] = 1.0 / 20
    # skinning weights: softmax over inverse bone distance
    w = np.exp(-d2.T / 0.002)
    weights = w / w.sum(1, keepdims=True)
    shapedirs = rng.randn(NUM_VERTS, 3, NUM_SHAPE) * 0.002
    posedirs = rng.randn(NUM_VERTS, 3, 135) * 0.0005
    faces = rng.randint(0, NUM_VERTS, size=(1538, 3)).astype(np.int32)
    comps = np.linalg.qr(rng.randn(45, 45))[0]
    return MANOModel(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        J_regressor=jnp.asarray(J_reg, jnp.float32),
        weights=jnp.asarray(weights, jnp.float32),
        faces=faces,
        hands_components=jnp.asarray(comps, jnp.float32),
        hands_mean=jnp.zeros((45,), jnp.float32),
        side=side,
    )


_DEFAULT_SEARCH = (
    "asset/mano_v1_2/models",
    os.path.join(os.path.dirname(__file__), "..", "..", "asset", "mano_v1_2", "models"),
)


def load_mano(mano_root: str | None = None, side: str = "right") -> MANOModel:
    """Load the official MANO model if available, else the synthetic fixture."""
    fname = f"MANO_{side.upper()}.pkl"
    roots = [mano_root] if mano_root else list(_DEFAULT_SEARCH)
    for root in roots:
        if root is None:
            continue
        path = os.path.join(root, fname)
        if os.path.exists(path):
            return load_mano_pkl(path)
    return synthetic_mano(side=side)


def _rot_planes(pose: jax.Array) -> jax.Array:
    """(B, 48) axis-angle -> (9, 16, B) row-major rotation planes.

    Structure-of-arrays on purpose: (B, 16, 3, 3) rotation tensors pad
    each 3x3 toward an (8, 128) TPU tile (~100x HBM amplification on every
    consumer); planes keep the wide batch on the minor axis.  Same
    clamped-sqrt / Taylor small-angle guards as
    transforms.axis_angle_to_quaternion so gradients at zero rotation stay
    finite.
    """
    B = pose.shape[0]
    aaT = jnp.transpose(pose.reshape(B, 16, 3), (2, 1, 0))       # (3, 16, B)
    sq = jnp.sum(aaT * aaT, axis=0)                              # (16, B)
    angle = jnp.sqrt(jnp.maximum(sq, 1e-24))
    half = 0.5 * angle
    small = angle < 1e-6
    shoa = jnp.where(small, 0.5 - sq / 48.0,
                     jnp.sin(half) / jnp.where(small, 1.0, angle))
    w = jnp.cos(half)
    x, y, z = aaT * shoa
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], 0)     # (9, 16, B)


def _chain_planes(R: jax.Array, j_rest: jax.Array):
    """Root->leaf (R|t) composition in planes.

    MANO's 15 non-root joints are 5 independent 3-deep finger chains
    (``PARENTS``): 3 depth steps of 27 multiply-adds on (5, B) planes.

    R: (9, 16, B) rotation planes; j_rest: (3, 16, B) rest joints ->
    A_R (9, 16, B), A_t (3, 16, B) in MANO joint order.
    """
    B = R.shape[-1]
    parents = jnp.asarray(PARENTS[1:])
    rel = jnp.concatenate(
        [j_rest[:, :1], j_rest[:, 1:] - j_rest[:, parents]], axis=1)
    rootR, roott = R[:, 0], rel[:, 0]                            # (9, B), (3, B)
    Rf = R[:, 1:].reshape(9, 5, 3, B)                            # (.., finger, depth, B)
    tf = rel[:, 1:].reshape(3, 5, 3, B)
    pR = jnp.broadcast_to(rootR[:, None], (9, 5, B))
    pt = jnp.broadcast_to(roott[:, None], (3, 5, B))
    Rs, ts = [], []
    for d in range(3):
        tfd, Rfd = tf[:, :, d], Rf[:, :, d]
        pt = jnp.stack([
            pR[3 * i] * tfd[0] + pR[3 * i + 1] * tfd[1]
            + pR[3 * i + 2] * tfd[2] + pt[i]
            for i in range(3)], 0)
        pR = jnp.stack([
            pR[3 * i] * Rfd[j] + pR[3 * i + 1] * Rfd[3 + j]
            + pR[3 * i + 2] * Rfd[6 + j]
            for i in range(3) for j in range(3)], 0)
        Rs.append(pR)
        ts.append(pt)
    # joints 1..15 are finger-major, depth-minor — exactly stack order
    A_R = jnp.concatenate(
        [rootR[:, None], jnp.stack(Rs, 2).reshape(9, 15, B)], 1)
    A_t = jnp.concatenate(
        [roott[:, None], jnp.stack(ts, 2).reshape(3, 15, B)], 1)
    return A_R, A_t


def mano_fk(model: MANOModel, pose: jax.Array, shape: jax.Array):
    """MANO forward kinematics.

    Args:
      pose: (B, 48) axis-angle, MANO joint order (root first).
      shape: (B, 10) betas.
    Returns:
      verts: (B, 778, 3) mm, wrist-centered.
      joints: (B, 21, 3) mm, wrist-centered, 21-joint manopth order.
    """
    B = pose.shape[0]
    R = _rot_planes(pose)                      # (9, 16, B)

    # shape blend
    v_shaped = model.v_template[None] + jnp.einsum(
        "vds,bs->bvd", model.shapedirs, shape, precision=lax.Precision.HIGHEST
    )  # (B, 778, 3)
    j_rest = jnp.einsum("jv,bvd->bjd", model.J_regressor, v_shaped, precision=lax.Precision.HIGHEST)  # (B, 16, 3)

    # pose blend: (R_k - I) for k=1..15
    eye9 = jnp.asarray([1., 0., 0., 0., 1., 0., 0., 0., 1.], dtype=pose.dtype)
    pose_map = jnp.transpose(R[:, 1:] - eye9[:, None, None],
                             (2, 1, 0)).reshape(B, 135)
    v_posed = v_shaped + jnp.einsum("vdp,bp->bvd", model.posedirs, pose_map, precision=lax.Precision.HIGHEST)

    # kinematic chain in SoA planes (see _rot_planes), then ONE conversion
    # to (B, 16, 3, 3)/(B, 16, 3) for the layout-friendly big LBS einsums
    A_Rp, A_tp = _chain_planes(R, jnp.transpose(j_rest, (2, 1, 0)))
    A_rot = jnp.transpose(A_Rp, (2, 1, 0)).reshape(B, 16, 3, 3)
    A_t = jnp.transpose(A_tp, (2, 1, 0))

    # LBS: per-vertex blended transform applied to (v_posed - skinning offset)
    # A'_k = [R_k | t_k - R_k j_k]  (relative-to-rest correction)
    corr_t = A_t - jnp.einsum("bkij,bkj->bki", A_rot, j_rest, precision=lax.Precision.HIGHEST)
    T_rot = jnp.einsum("vk,bkij->bvij", model.weights, A_rot, precision=lax.Precision.HIGHEST)
    T_t = jnp.einsum("vk,bki->bvi", model.weights, corr_t, precision=lax.Precision.HIGHEST)
    verts = jnp.einsum("bvij,bvj->bvi", T_rot, v_posed, precision=lax.Precision.HIGHEST) + T_t

    # 21 joints = 16 chain joints + 5 fingertips, reordered
    jtr = jnp.concatenate([A_t, verts[:, TIP_IDS, :]], axis=1)
    jtr = jtr[:, JOINT_REORDER, :]

    # center at wrist (center_idx=0), convert to millimeters (manopth output)
    center = jtr[:, :1]
    verts = (verts - center) * 1000.0
    jtr = (jtr - center) * 1000.0
    return verts, jtr


def mano_fk_joints(model: MANOModel, pose: jax.Array, shape: jax.Array) -> jax.Array:
    """Joints-only FK: LBS restricted to the 5 fingertip vertices.

    The cascade aggregator scores candidates by PROJECTED JOINTS only
    (aggregation.py:196-213); computing the full 778-vertex skinning there
    wastes ~99% of the FLOPs (and XLA cannot prune it through the dense
    einsums).  This path runs the kinematic chain plus a (5, 16) LBS.

    TPU layout note: everything here is STRUCTURE-OF-ARRAYS — rotation
    planes (9, J, B) / translation planes (3, J, B) with the wide batch on
    the MINOR axis.  The array-of-structs form ((B, 16, 3, 3) tensors)
    pads each 3x3 toward an (8, 128) TPU tile, amplifying HBM traffic
    ~100x; measured 3.7 ms per 12800-wide call AoS vs ~0.5 ms for the same
    arithmetic SoA (docs/PERF.md).  The joint regressor is folded into the
    shape basis (compile-time (16, 3, 10) table) so no (B, 778, 3)
    shaped-vertex tensor is materialized either.

    Returns (B, 21, 3) mm, wrist-centered, manopth order.
    """
    B = pose.shape[0]
    tip_ids = jnp.asarray(TIP_IDS)
    R = _rot_planes(pose)                                        # (9, 16, B)

    # rest joints straight from the shape betas (regressor folded at
    # compile time), as (3, 16, B) planes
    j_template = jnp.einsum("jv,vd->jd", model.J_regressor, model.v_template,
                            precision=lax.Precision.HIGHEST)
    jdirs = jnp.einsum("jv,vds->jds", model.J_regressor, model.shapedirs,
                       precision=lax.Precision.HIGHEST)
    j_rest = j_template.T[:, :, None] + jnp.einsum(
        "jds,bs->djb", jdirs, shape, precision=lax.Precision.HIGHEST)
    A_R, A_t = _chain_planes(R, j_rest)                          # (9|3, 16, B)

    # relative-to-rest correction + (5, 16) LBS, all in planes
    corr = jnp.stack([
        A_t[i] - (A_R[3 * i] * j_rest[0] + A_R[3 * i + 1] * j_rest[1]
                  + A_R[3 * i + 2] * j_rest[2])
        for i in range(3)], 0)                                   # (3, 16, B)
    w_tips = model.weights[tip_ids]                              # (5, 16)
    T_R = jnp.einsum("vk,xkb->xvb", w_tips, A_R,
                     precision=lax.Precision.HIGHEST)            # (9, 5, B)
    T_t = jnp.einsum("vk,xkb->xvb", w_tips, corr,
                     precision=lax.Precision.HIGHEST)            # (3, 5, B)

    # only the tip rows of the shape/pose blend corrections are needed
    eye9 = jnp.asarray([1., 0., 0., 0., 1., 0., 0., 0., 1.], dtype=pose.dtype)
    pose_map = jnp.transpose(R[:, 1:] - eye9[:, None, None],
                             (2, 1, 0)).reshape(B, 135)
    v_tips = (model.v_template[tip_ids].T[:, :, None]
              + jnp.einsum("vds,bs->dvb", model.shapedirs[tip_ids], shape,
                           precision=lax.Precision.HIGHEST)
              + jnp.einsum("vdp,bp->dvb", model.posedirs[tip_ids], pose_map,
                           precision=lax.Precision.HIGHEST))     # (3, 5, B)
    tips = jnp.stack([
        T_R[3 * i] * v_tips[0] + T_R[3 * i + 1] * v_tips[1]
        + T_R[3 * i + 2] * v_tips[2] + T_t[i]
        for i in range(3)], 0)                                   # (3, 5, B)

    jtr = jnp.concatenate([A_t, tips], axis=1)[:, jnp.asarray(JOINT_REORDER)]
    jtr = (jtr - jtr[:, :1]) * 1000.0                            # wrist-centered mm
    return jnp.transpose(jtr, (2, 1, 0))                         # (B, 21, 3)


def hand_joints_meters(model: MANOModel, pose: jax.Array, shape: jax.Array) -> jax.Array:
    """Joints-only ``get_hand_verts`` analogue (meters, any leading dims)."""
    lead = pose.shape[:-1]
    joints = mano_fk_joints(model, pose.reshape(-1, 48), shape.reshape(-1, 10))
    return joints.reshape(lead + (21, 3)) / 1000.0


def hand_verts_meters(model: MANOModel, pose: jax.Array, shape: jax.Array):
    """Reference ``HeadMano.get_hand_verts`` (head_mano.py:78-87): FK / 1000.

    Accepts arbitrary leading batch dims; flattens internally.
    """
    lead = pose.shape[:-1]
    verts, joints = mano_fk(model, pose.reshape(-1, 48), shape.reshape(-1, 10))
    verts = verts.reshape(lead + (NUM_VERTS, 3)) / 1000.0
    joints = joints.reshape(lead + (21, 3)) / 1000.0
    return verts, joints


def pca_to_axis_angle(model: MANOModel, pca: jax.Array, add_mean: bool = True) -> jax.Array:
    """DexYCB 45-dim PCA hand pose -> 45-dim axis-angle (dataset path).

    Mirrors reference dexycb6.py:292-302 (``hands_components`` matmul).
    """
    aa = pca @ model.hands_components
    if add_mean:
        aa = aa + model.hands_mean
    return aa
