"""YCB object mesh registry as stacked constant device arrays.

The reference loads all 21 YCB meshes at import time into a dict of numpy
arrays (lib/dataset/base.py:204-258) and HeadObject materializes them as
per-name torch buffers selected by a Python loop over ``getattr``
(head_object.py:42-55).  TPU-native redesign: every per-object tensor is one
stacked array indexed by integer object id with a single ``jnp.take`` — no
host loop, no string dispatch, fully jit/vmap/shard-able.

Real data path: builds from a DexYCB ``models/`` directory (trimesh +
farthest-point sampling) with an on-disk pkl cache.  Hermetic path: a
deterministic synthetic registry with identical shapes.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

YCB_CLASSES = {
    1: "002_master_chef_can", 2: "003_cracker_box", 3: "004_sugar_box",
    4: "005_tomato_soup_can", 5: "006_mustard_bottle", 6: "007_tuna_fish_can",
    7: "008_pudding_box", 8: "009_gelatin_box", 9: "010_potted_meat_can",
    10: "011_banana", 11: "019_pitcher_base", 12: "021_bleach_cleanser",
    13: "024_bowl", 14: "025_mug", 15: "035_power_drill", 16: "036_wood_block",
    17: "037_scissors", 18: "040_large_marker", 19: "051_large_clamp",
    20: "052_extra_large_clamp", 21: "061_foam_brick",
}
YCB_ID = {v: k for k, v in YCB_CLASSES.items()}
NUM_OBJECTS = 21
NUM_KPT = 27
NUM_VERTS_SAMPLED = 2048

# BOP-style symmetric classes used by the object metrics (test.py:103-150)
SYMMETRIC_CLASSES = ("024_bowl", "036_wood_block", "051_large_clamp",
                     "052_extra_large_clamp", "061_foam_brick")


class YCBRegistry(NamedTuple):
    """Stacked per-object constants; axis 0 is (object_id - 1)."""

    kpt3d: jax.Array          # (21, 27, 3) bbox lattice keypoints
    verts_sampled: jax.Array  # (21, 2048, 3) FPS-sampled surface points
    verts_full: jax.Array     # (21, Vmax, 3) padded full vertices
    verts_full_mask: jax.Array  # (21, Vmax) 1 where a real vertex
    com: jax.Array            # (21, 3) center of mass
    diameter: jax.Array       # (21,)
    shift: jax.Array          # (21, 3, 4) to-axial-symmetry frames
    is_symmetric: jax.Array   # (21,) bool (BOP symmetry handling)
    names: tuple


def bbox3d_from_verts(verts: np.ndarray) -> np.ndarray:
    return np.stack([verts.min(-2), verts.max(-2)], axis=-2)


def kpt27_from_bbox3d(bbox3d: np.ndarray) -> np.ndarray:
    """3x3x3 lattice over the box (reference misc_fn.py:42-67); index 13 is
    the center (used as the object "center" keypoint everywhere)."""
    mn, mx = bbox3d[..., 0, :], bbox3d[..., 1, :]
    kpts = []
    for i in range(3):
        for j in range(3):
            for k in range(3):
                w = np.array([i, j, k]) / 2.0
                kpts.append(mn + w * (mx - mn))
    return np.stack(kpts, axis=-2)


def get_diameter(verts: np.ndarray) -> float:
    """Bounding-box diagonal (HFL convention, base.py:191-201)."""
    ext = verts.max(0) - verts.min(0)
    return float(np.sqrt((ext**2).sum()))


def farthest_point_sampling(verts: np.ndarray, n: int, start_idx: int = 0) -> np.ndarray:
    """Plain numpy FPS (replaces the reference's ``fpsample`` C dependency,
    base.py:228).  Offline/cached only, so O(n*V) numpy is fine."""
    V = verts.shape[0]
    if V <= n:
        return np.arange(V)
    chosen = np.empty(n, dtype=np.int64)
    chosen[0] = start_idx
    d2 = ((verts - verts[start_idx]) ** 2).sum(-1)
    for i in range(1, n):
        idx = int(d2.argmax())
        chosen[i] = idx
        d2 = np.minimum(d2, ((verts - verts[idx]) ** 2).sum(-1))
    return chosen


def load_obj_vertices(path: str) -> np.ndarray:
    """Minimal OBJ vertex parser (replaces trimesh for YCB textured_simple)."""
    verts = []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
    return np.asarray(verts, np.float32)


def load_obj_faces(path: str) -> np.ndarray:
    """Triangle index parser for the same OBJ files (viz-only, host-side).

    Handles the ``f v/vt/vn`` face syntax (including spec-legal negative
    relative indices, resolved against the vertices seen so far); fans
    polygons into triangles.  Returns (F, 3) int32, 0-based.  Used by the
    mesh-force visualization (reference train_diff_hand_obj.py:781-782
    pulls ``faces`` from YCB_MESHES via trimesh)."""
    faces = []
    n_verts = 0
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                n_verts += 1
            elif line.startswith("f "):
                raw = [int(p.split("/")[0]) for p in line.split()[1:]]
                idx = [v - 1 if v > 0 else n_verts + v for v in raw]
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
    return np.asarray(faces, np.int32)


def _registry_from_dicts(per_obj: list[dict], names: list[str]) -> YCBRegistry:
    vmax = max(d["verts"].shape[0] for d in per_obj)
    verts_full = np.zeros((len(per_obj), vmax, 3), np.float32)
    mask = np.zeros((len(per_obj), vmax), np.float32)
    for i, d in enumerate(per_obj):
        v = d["verts"]
        verts_full[i, : v.shape[0]] = v
        # pad with the first vertex so distance metrics ignore padding
        verts_full[i, v.shape[0]:] = v[0]
        mask[i, : v.shape[0]] = 1.0
    return YCBRegistry(
        kpt3d=jnp.asarray(np.stack([d["kpt3d"] for d in per_obj]), jnp.float32),
        verts_sampled=jnp.asarray(np.stack([d["verts_sampled"] for d in per_obj]), jnp.float32),
        verts_full=jnp.asarray(verts_full),
        verts_full_mask=jnp.asarray(mask),
        com=jnp.asarray(np.stack([d["CoM"] for d in per_obj]), jnp.float32),
        diameter=jnp.asarray(np.array([d["diameter"] for d in per_obj]), jnp.float32),
        shift=jnp.asarray(np.stack([d["shift"] for d in per_obj]), jnp.float32),
        is_symmetric=jnp.asarray(np.array([n in SYMMETRIC_CLASSES for n in names])),
        names=tuple(names),
    )


def build_registry_from_models_dir(model_dir: str, cache_path: str | None = None) -> YCBRegistry:
    """Build from real DexYCB meshes (textured_simple.obj per class dir)."""
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            per_obj, names = pickle.load(f)
        return _registry_from_dicts(per_obj, names)

    names = [YCB_CLASSES[i] for i in sorted(YCB_CLASSES)]
    shift_path = os.path.join(os.path.dirname(model_dir), "object_shift_to_axial_symmetry.json")
    com_path = os.path.join(os.path.dirname(model_dir), "object_center_of_mass.json")
    shifts = json.load(open(shift_path)) if os.path.exists(shift_path) else {}
    coms = json.load(open(com_path)) if os.path.exists(com_path) else {}

    per_obj = []
    for name in names:
        verts = load_obj_vertices(os.path.join(model_dir, name, "textured_simple.obj"))
        shift = np.asarray(shifts.get(name, np.eye(3, 4)), np.float32)
        com = np.asarray(coms.get(name, verts.mean(0)), np.float32)
        fps_idx = farthest_point_sampling(verts, NUM_VERTS_SAMPLED)
        verts_sampled = verts[fps_idx]
        vs_axsym = verts_sampled @ shift[:3, :3].T + shift[:3, 3]
        bbox_axsym = bbox3d_from_verts(vs_axsym)
        kpt_axsym = kpt27_from_bbox3d(bbox_axsym)
        kpt3d = (kpt_axsym - shift[:3, 3]) @ shift[:3, :3]
        per_obj.append(dict(
            verts=verts, verts_sampled=verts_sampled, kpt3d=kpt3d.astype(np.float32),
            CoM=com, diameter=get_diameter(verts), shift=shift,
        ))
    if cache_path:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "wb") as f:
            pickle.dump((per_obj, names), f)
    return _registry_from_dicts(per_obj, names)


def synthetic_registry(seed: int = 0, verts_per_obj: int = 4000) -> YCBRegistry:
    """Deterministic synthetic registry with DexYCB-like object scales."""
    rng = np.random.RandomState(seed)
    names = [YCB_CLASSES[i] for i in sorted(YCB_CLASSES)]
    per_obj = []
    for i, name in enumerate(names):
        scale = 0.04 + 0.08 * rng.rand(3)  # 4-12 cm half extents
        verts = (rng.randn(verts_per_obj, 3) * scale).astype(np.float32)
        verts = verts / np.maximum(np.linalg.norm(verts / scale, axis=-1, keepdims=True), 1.0)
        fps_idx = farthest_point_sampling(verts, NUM_VERTS_SAMPLED)
        vs = verts[fps_idx]
        kpt3d = kpt27_from_bbox3d(bbox3d_from_verts(vs)).astype(np.float32)
        per_obj.append(dict(
            verts=verts, verts_sampled=vs, kpt3d=kpt3d,
            CoM=verts.mean(0), diameter=get_diameter(verts),
            shift=np.eye(3, 4, dtype=np.float32),
        ))
    return _registry_from_dicts(per_obj, names)


_CACHE_DEFAULT = "asset/ours/object_mesh_info_tpu.pkl"


def load_registry(model_dir: str | None = None) -> YCBRegistry:
    """Real registry when meshes are on disk, synthetic fixture otherwise."""
    if model_dir and os.path.isdir(model_dir):
        return build_registry_from_models_dir(model_dir, cache_path=_CACHE_DEFAULT)
    if os.path.exists(_CACHE_DEFAULT):
        with open(_CACHE_DEFAULT, "rb") as f:
            per_obj, names = pickle.load(f)
        return _registry_from_dicts(per_obj, names)
    return synthetic_registry()


def names_to_ids(names) -> np.ndarray:
    """Object name strings -> 0-based registry indices (host-side)."""
    return np.array([YCB_ID[n] - 1 for n in names], dtype=np.int32)
