"""Hand kinematics tables and joint helpers.

Static index tables driving cascade aggregation and the physics cue, pinned
to the reference (lib/utils/hand_fn.py):
  * ``MANO_PARAMS_LEVEL`` (hand_fn.py:240-247): which of the 48 pose params
    belong to kinematic level 0..3 (wrist / metacarpal / proximal / distal)
  * ``MANO_JOINT_LEVEL`` (hand_fn.py:250-263): which of the 21 joints sit at
    level 0..4 (21-joint manopth order: wrist, T*4, I*4, M*4, R*4, P*4)
  * ``SKELETON_LEVEL`` (hand_fn.py:269-274): bone (parent, child) pairs per
    level in the 21-joint order
  * ``FINGER_JOINT_IDX`` (hand_fn.py:222-229)

``build_vert2joint`` reproduces the reference's ``asset/ours/vert2joint.pkl``
regressor (see the generating snippet at lib/dataset/base.py:92-99) directly
from a MANO model, so no pickled asset is required.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

MANOLAYER_TO_MANOPTH = np.array(
    [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20], np.int32
)
MANOPTH_TO_MANOLAYER = np.argsort(MANOLAYER_TO_MANOPTH)

# pose-parameter indices (48-dim aa vector) per cascade level
MANO_PARAMS_LEVEL = {
    0: [0, 1, 2],
    1: [39, 40, 41] + [3, 4, 5] + [12, 13, 14] + [30, 31, 32] + [21, 22, 23],
    2: [42, 43, 44] + [6, 7, 8] + [15, 16, 17] + [33, 34, 35] + [24, 25, 26],
    3: [45, 46, 47] + [9, 10, 11] + [18, 19, 20] + [36, 37, 38] + [27, 28, 29],
}

# 21-joint (manopth order) indices per level
MANO_JOINT_LEVEL = {
    0: [0],
    1: [1, 5, 9, 13, 17],
    2: [2, 6, 10, 14, 18],
    3: [3, 7, 11, 15, 19],
    4: [4, 8, 12, 16, 20],
}

SKELETON_LEVEL = {
    0: np.array([[0, 1], [0, 5], [0, 9], [0, 13], [0, 17]]),
    1: np.array([[1, 2], [5, 6], [9, 10], [13, 14], [17, 18]]),
    2: np.array([[2, 3], [6, 7], [10, 11], [14, 15], [18, 19]]),
    3: np.array([[3, 4], [7, 8], [11, 12], [15, 16], [19, 20]]),
}
SKELETON = np.concatenate([SKELETON_LEVEL[i] for i in range(4)], axis=0)

FINGER_JOINT_IDX = {
    "pinky": [7, 8, 9, 20],
    "ring": [10, 11, 12, 19],
    "middle": [4, 5, 6, 18],
    "index": [1, 2, 3, 17],
    "thumb": [13, 14, 15, 16],
    "palm": [0, 13, 1, 4, 10, 7],
}

# tip vertex ids used when building vert2joint (base.py:95; note index tip 320)
V2J_TIP_IDS = (745, 320, 444, 556, 673)


def build_vert2joint(mano_model) -> jax.Array:
    """(21, 778) linear regressor verts -> 21 joints (manopth order).

    Reference builds this once into vert2joint.pkl: MANO J_regressor rows
    (16) + one-hot tip rows, then the manopth reorder.  Not precise enough
    for pose estimation (hand_fn.py:449) — used only for anchor frames.
    """
    J = np.asarray(mano_model.J_regressor)  # (16, 778)
    tips = np.zeros((5, J.shape[1]), J.dtype)
    tips[np.arange(5), list(V2J_TIP_IDS)] = 1.0
    v2j = np.concatenate([J, tips], axis=0)
    v2j = v2j[MANOLAYER_TO_MANOPTH]
    return jnp.asarray(v2j, jnp.float32)


def vert2joint_apply(v2j: jax.Array, verts: jax.Array) -> jax.Array:
    """verts (..., 778, 3) -> joints (..., 21, 3)."""
    return jnp.einsum("...vd,jv->...jd", verts, v2j,
                      precision=jax.lax.Precision.HIGHEST)


# HO3D tip alignment (hand_fn.py:453-461)
_HO3D_TIPS_ID = np.array([16, 17, 18, 19, 20])
_HO3D_TIPS_VERT_ID = np.array([728, 353, 442, 576, 694])


def joint_reorder(joint: jax.Array, dst_order: str) -> jax.Array:
    if dst_order == "manopth":
        return joint[..., MANOLAYER_TO_MANOPTH, :]
    if dst_order == "manolayer":
        return joint[..., MANOPTH_TO_MANOLAYER, :]
    raise ValueError(dst_order)


def get_joint_aligned_with_ho3d(vert: jax.Array, joint: jax.Array) -> jax.Array:
    """Reorder to manolayer convention and replace tips by mesh vertices."""
    j = joint_reorder(joint, "manolayer")
    new_tips = vert[..., _HO3D_TIPS_VERT_ID, :]
    return j.at[..., _HO3D_TIPS_ID, :].set(new_tips)
