"""CPF-derived 32-anchor force frames on the MANO mesh (pure JAX).

Port of ``ForceAnchor`` (lib/utils/physics_fn.py:121-258).  Each of the 32
contact anchors lives on a mesh triangle (barycentric combo of 3 vertices)
and carries a local (x, y, z) frame built from the triangle normal and the
downstream skeleton direction.  Everything is a fixed gather + cross-product
graph over (..., 778, 3) vertices — jit/vmap friendly and batched over all
candidate hypotheses at once.

Assets: loads the CPF anchor tables (face_vertex_idx.txt / anchor_weight.txt)
when present under ``asset/2021_CVPR_CPF/anchor``; otherwise synthesizes a
deterministic 32-anchor layout with the same structure for hermetic tests.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import transforms as T
from ..utils.hand import SKELETON_LEVEL, build_vert2joint, vert2joint_apply

# anchor-id groups per skeleton segment (physics_fn.py:127-154): the OrderedDict
# label_level flattened defines which skeleton bone orients each anchor
_LABEL_LEVEL = {
    "WIM": [5], "WMM": [12], "WRM": [19, 18], "WPM": [26, 25],
    "MTP": [6, 0], "MIP": [7], "MMP": [13], "MRP": [20], "MPP": [27],
    "PTD": [1], "PID": [8], "PMD": [14], "PRD": [21], "PPD": [28],
    "DTT": [2, 3, 4], "DIT": [9, 11, 10], "DMT": [15, 17, 16],
    "DRT": [22, 24, 23], "DPT": [29, 31, 30],
}

FINGER_ANCHORS = {
    "palm": _LABEL_LEVEL["WIM"] + _LABEL_LEVEL["WMM"] + _LABEL_LEVEL["WRM"] + _LABEL_LEVEL["WPM"],
    "thumb": _LABEL_LEVEL["MTP"] + _LABEL_LEVEL["PTD"] + _LABEL_LEVEL["DTT"],
    "index": _LABEL_LEVEL["MIP"] + _LABEL_LEVEL["PID"] + _LABEL_LEVEL["DIT"],
    "middle": _LABEL_LEVEL["MMP"] + _LABEL_LEVEL["PMD"] + _LABEL_LEVEL["DMT"],
    "ring": _LABEL_LEVEL["MRP"] + _LABEL_LEVEL["PRD"] + _LABEL_LEVEL["DRT"],
    "pinky": _LABEL_LEVEL["MPP"] + _LABEL_LEVEL["PPD"] + _LABEL_LEVEL["DPT"],
}


def _corresponding_skeleton() -> np.ndarray:
    """(32, 2) skeleton edge per anchor id (physics_fn.py:156-169)."""
    S = SKELETON_LEVEL
    rows = [
        S[0][1], S[0][2], S[0][3], S[0][3], S[0][4], S[0][4],
        S[0][0], S[0][0], S[1][1], S[1][2], S[1][3], S[1][4],
        S[2][0], S[2][1], S[2][2], S[2][3], S[2][4],
        S[3][0], S[3][0], S[3][0],
        S[3][1], S[3][1], S[3][1],
        S[3][2], S[3][2], S[3][2],
        S[3][3], S[3][3], S[3][3],
        S[3][4], S[3][4], S[3][4],
    ]
    labels = []
    for v in _LABEL_LEVEL.values():
        labels.extend(v)
    labels = np.array(labels)
    rows = np.stack(rows, axis=0)
    return rows[np.argsort(labels)]


class ForceAnchorTables(NamedTuple):
    face_vert_idx: jax.Array    # (32, 3) int vertex ids
    anchor_weight: jax.Array    # (32, 3) barycentric (ones column prepended)
    skeleton: jax.Array         # (32, 2) joint-id pairs for the y direction
    vert2joint: jax.Array       # (21, 778)


def load_anchor_tables(mano_model, asset_path: str = "asset/2021_CVPR_CPF") -> ForceAnchorTables:
    anchor_root = os.path.join(asset_path, "anchor")
    fvi_path = os.path.join(anchor_root, "face_vertex_idx.txt")
    aw_path = os.path.join(anchor_root, "anchor_weight.txt")
    if os.path.exists(fvi_path) and os.path.exists(aw_path):
        face_vert_idx = np.loadtxt(fvi_path, dtype=np.int32)
        anchor_weight = np.loadtxt(aw_path)
    else:
        # deterministic synthetic anchors: triangles drawn from palm/finger
        # vertex ranges so the frames are geometrically plausible
        rng = np.random.RandomState(7)
        face_vert_idx = rng.randint(0, 778, size=(32, 3)).astype(np.int32)
        w = rng.rand(32, 2) * 0.5
        anchor_weight = w
    anchor_weight = np.concatenate(
        [np.ones([anchor_weight.shape[0], 1]), anchor_weight], axis=1
    )  # (32, 3), physics_fn.py:124
    return ForceAnchorTables(
        face_vert_idx=jnp.asarray(face_vert_idx),
        anchor_weight=jnp.asarray(anchor_weight, jnp.float32),
        skeleton=jnp.asarray(_corresponding_skeleton()),
        vert2joint=build_vert2joint(mano_model),
    )


def _norm(v, eps=1e-8):
    # T.normalize is the safe_sqrt form: jnp.linalg.norm has a NaN gradient
    # at the zero vector (degenerate anchor triangle / zero bone), which
    # poisons co-computed gradients through shared layers even at 0 cotangent
    return T.normalize(v, eps=eps)


def anchor_points_and_frames(tables: ForceAnchorTables, verts: jax.Array):
    """verts: (..., 778, 3) -> anchors (..., 32, 3), frames (..., 32, 3, 3).

    frames[..., i] columns are the local (x, y, z) axes (physics_fn.py:224-257):
    z = triangle normal, y = downstream bone direction re-orthogonalized,
    x = y x z.
    """
    fvi = tables.face_vert_idx.reshape(-1)
    tri = verts[..., fvi, :].reshape(verts.shape[:-2] + (32, 3, 3))
    b1 = tri[..., 1, :] - tri[..., 0, :]
    b2 = tri[..., 2, :] - tri[..., 0, :]
    joints = vert2joint_apply(tables.vert2joint, verts)
    y_raw = joints[..., tables.skeleton[:, 1], :] - joints[..., tables.skeleton[:, 0], :]

    z = _norm(jnp.cross(b1, b2))
    y = _norm(y_raw)
    x = jnp.cross(y, z)
    y = _norm(jnp.cross(z, x))
    frames = jnp.stack([x, y, z], axis=-1)

    w = tables.anchor_weight
    anchors = w[:, 1:2] * b1 + w[:, 2:3] * b2 + tri[..., 0, :]
    return anchors, frames


def force_local_to_global(tables: ForceAnchorTables, force_local: jax.Array,
                          verts: jax.Array):
    """(physics.py:362-371) returns (force_point, force_global)."""
    point, frame = anchor_points_and_frames(tables, verts)
    force_global = jnp.einsum("...bi,...bji->...bj", force_local, frame,
                              precision=jax.lax.Precision.HIGHEST)
    return point, force_global


def force_global_to_local(tables: ForceAnchorTables, force_global: jax.Array,
                          verts: jax.Array):
    """(physics.py:374-378)."""
    _, frame = anchor_points_and_frames(tables, verts)
    frame_t = jnp.swapaxes(frame, -1, -2)
    return jnp.einsum("...bi,...bji->...bj", force_global, frame_t,
                      precision=jax.lax.Precision.HIGHEST)


def pool_contact_to_anchors(tables: ForceAnchorTables, hand_contact: jax.Array) -> jax.Array:
    """(..., >=778 verts contact) -> (..., 32) anchor contact
    (``get_force_contact``, physics_fn.py:201-208)."""
    fvi = tables.face_vert_idx.reshape(-1)
    fc = hand_contact[..., fvi].reshape(hand_contact.shape[:-1] + (32, 3))
    w = tables.anchor_weight / tables.anchor_weight.sum(axis=1, keepdims=True)
    return (fc * w).sum(-1)


_FINGER_GROUPS = tuple(FINGER_ANCHORS[k] for k in
                       ("palm", "thumb", "index", "middle", "ring", "pinky"))


def check_is_grasped(force_contact: jax.Array, thresh: float = 0.0) -> jax.Array:
    """(..., 32) anchor contact -> (...,) bool: >= 2 of 6 hand regions touch
    (physics_fn.py:210-221), vectorized over any batch shape."""
    counts = jnp.stack(
        [force_contact[..., jnp.asarray(g)].sum(-1) > thresh for g in _FINGER_GROUPS],
        axis=-1,
    )
    return counts.sum(-1) >= 2


def pool_contact_to_anchors_np(tables: ForceAnchorTables, hand_contact):
    """Numpy twin of ``pool_contact_to_anchors`` for host-side data workers
    (per-sample eager jnp dispatch is expensive on small hosts)."""
    import numpy as np

    fvi = np.asarray(tables.face_vert_idx).reshape(-1)
    w = np.asarray(tables.anchor_weight)
    fc = np.asarray(hand_contact)[..., fvi].reshape(
        np.shape(hand_contact)[:-1] + (32, 3))
    w = w / w.sum(axis=1, keepdims=True)
    return (fc * w).sum(-1)


def force_local_to_global_np(tables: ForceAnchorTables, force_local, verts):
    """Numpy twin of ``force_local_to_global`` for host-side consumers
    (viz writers / data workers — eager per-op jnp dispatch is expensive on
    small hosts and would initialize a device backend).  Single sample:
    force_local (32, 3), verts (778, 3).  Parity with the jax version is
    pinned by tests/test_anchor.py."""
    fvi = np.asarray(tables.face_vert_idx).reshape(-1)
    verts = np.asarray(verts, np.float64)
    tri = verts[fvi].reshape(32, 3, 3)
    b1 = tri[:, 1] - tri[:, 0]
    b2 = tri[:, 2] - tri[:, 0]
    v2j = np.asarray(tables.vert2joint)
    joints = np.einsum("vd,jv->jd", verts, v2j)
    skel = np.asarray(tables.skeleton)
    y_raw = joints[skel[:, 1]] - joints[skel[:, 0]]

    def nrm(v, eps=1e-8):
        n = np.sqrt((v * v).sum(-1, keepdims=True))
        return v / (n + eps)

    z = nrm(np.cross(b1, b2))
    y = nrm(y_raw)
    x = np.cross(y, z)
    y = nrm(np.cross(z, x))
    frame = np.stack([x, y, z], axis=-1)                     # (32, 3, 3)

    w = np.asarray(tables.anchor_weight)
    point = w[:, 1:2] * b1 + w[:, 2:3] * b2 + tri[:, 0]
    force_global = np.einsum("bi,bji->bj", np.asarray(force_local, np.float64), frame)
    return point.astype(np.float32), force_global.astype(np.float32)


def check_is_grasped_np(force_contact, thresh: float = 0.0) -> bool:
    """Numpy twin of ``check_is_grasped`` (single sample)."""
    import numpy as np

    fc = np.asarray(force_contact)
    count = sum(int(fc[list(g)].sum() > thresh) for g in _FINGER_GROUPS)
    return count >= 2
