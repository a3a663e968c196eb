"""Execution parity vs the REFERENCE'S OWN aggregation code.

``lib/model/aggregation.py`` is the component VERDICT r1 called the most
drift-prone to rebuild ("mutation-heavy aggregation code ... easy to
introduce silent semantic drift").  These tests import the reference's
actual torch implementation (cascade, object rankers, fuse, per-finger
physics re-rank, and the full 5-stage HOI orchestration) and run it against
our functional JAX pipeline on identical inputs.

What is genuinely the reference's code here: all candidate bookkeeping
(in-place mutations, fuse/observe index levels, top-k, weight formation),
``F.grid_sample`` bicubic heat scoring, ``average_quaternion`` /
``average_rot6d`` fusion, the physics rankers, and the HOI orchestration.
What is injected (the same seam the reference itself uses — its
``HandAggregator(mano_fn)`` / ``ObjectAggregator(obj_fn)`` constructors):
MANO FK, the YCB mesh layer, and the CPF anchor-frame function, each
bridged to our (separately parity-pinned) implementations so both sides
share identical primitives and any mismatch is attributable to the
aggregation logic itself.

pytorch3d is absent on this host; its 6 rotation conversions used by the
reference are re-derived in torch below and pinned against our JAX
transforms (TestShims) before being trusted inside the reference module.
"""
import importlib
import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vpho_tpu.models import aggregation as agg  # noqa: E402
from vpho_tpu.models import anchor as anchor_lib  # noqa: E402
from vpho_tpu.models import heads  # noqa: E402
from vpho_tpu.models.mano import hand_verts_meters, synthetic_mano  # noqa: E402
from vpho_tpu.models.ycb import synthetic_registry  # noqa: E402
from vpho_tpu.utils import transforms as T  # noqa: E402

if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")


# ---------------------------------------------------------------------------
# torch shims for the pytorch3d rotation conversions the reference imports
# (conventions: quaternions (w, x, y, z); rot6d = first two ROWS of R)
# ---------------------------------------------------------------------------


def sh_axis_angle_to_quaternion(aa):
    angle = torch.norm(aa, dim=-1, keepdim=True)
    half = 0.5 * angle
    small = angle.abs() < 1e-6
    k = torch.where(
        small,
        0.5 - angle * angle / 48.0,
        torch.sin(half) / torch.where(small, torch.ones_like(angle), angle),
    )
    return torch.cat([torch.cos(half), aa * k], dim=-1)


def sh_quaternion_to_axis_angle(q):
    norm = torch.norm(q[..., 1:], dim=-1, keepdim=True)
    half = torch.atan2(norm, q[..., :1])
    angle = 2.0 * half
    small = angle.abs() < 1e-6
    k = torch.where(
        small,
        0.5 - angle * angle / 48.0,
        torch.sin(half) / torch.where(small, torch.ones_like(angle), angle),
    )
    return q[..., 1:] / k


def sh_quaternion_to_matrix(q):
    w, x, y, z = q.unbind(-1)
    m = torch.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        dim=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def sh_matrix_to_quaternion(m):
    # via our (convention-pinned) JAX implementation; per-quaternion sign is
    # irrelevant downstream (average_quaternion re-orients every input)
    q = np.asarray(T.matrix_to_quaternion(jnp.asarray(m.detach().numpy())))
    return torch.from_numpy(q)


def sh_rotation_6d_to_matrix(d6):
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = F.normalize(a1, dim=-1)
    b2 = F.normalize(a2 - (b1 * a2).sum(-1, keepdim=True) * b1, dim=-1)
    b3 = torch.cross(b1, b2, dim=-1)
    return torch.stack((b1, b2, b3), dim=-2)


def sh_matrix_to_rotation_6d(m):
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def sh_axis_angle_to_matrix(aa):
    return sh_quaternion_to_matrix(sh_axis_angle_to_quaternion(aa))


def sh_matrix_to_axis_angle(m):
    return sh_quaternion_to_axis_angle(sh_matrix_to_quaternion(m))


_SHIMS = {
    "axis_angle_to_matrix": sh_axis_angle_to_matrix,
    "matrix_to_axis_angle": sh_matrix_to_axis_angle,
    "quaternion_to_matrix": sh_quaternion_to_matrix,
    "matrix_to_quaternion": sh_matrix_to_quaternion,
    "axis_angle_to_quaternion": sh_axis_angle_to_quaternion,
    "quaternion_to_axis_angle": sh_quaternion_to_axis_angle,
    "rotation_6d_to_matrix": sh_rotation_6d_to_matrix,
    "matrix_to_rotation_6d": sh_matrix_to_rotation_6d,
}


class TestShims:
    """The shims must agree with our JAX transforms before we trust them
    inside the reference module."""

    def test_rotation_conversions_match_ours(self):
        rs = np.random.RandomState(0)
        aa = (rs.randn(200, 3) * 1.2).astype(np.float32)
        t_aa = torch.from_numpy(aa)

        q_t = sh_axis_angle_to_quaternion(t_aa).numpy()
        q_j = np.asarray(T.axis_angle_to_quaternion(jnp.asarray(aa)))
        np.testing.assert_allclose(q_t, q_j, atol=1e-5)

        m_t = sh_quaternion_to_matrix(torch.from_numpy(q_j.copy())).numpy()
        m_j = np.asarray(T.quaternion_to_matrix(jnp.asarray(q_j)))
        np.testing.assert_allclose(m_t, m_j, atol=5e-5)

        aa_t = sh_quaternion_to_axis_angle(torch.from_numpy(q_j.copy())).numpy()
        aa_j = np.asarray(T.quaternion_to_axis_angle(jnp.asarray(q_j)))
        np.testing.assert_allclose(aa_t, aa_j, atol=5e-5)

        d6 = (rs.randn(200, 6)).astype(np.float32)
        r_t = sh_rotation_6d_to_matrix(torch.from_numpy(d6)).numpy()
        r_j = np.asarray(T.rotation_6d_to_matrix(jnp.asarray(d6)))
        np.testing.assert_allclose(r_t, r_j, atol=5e-5)

        b_t = sh_matrix_to_rotation_6d(torch.from_numpy(r_j.copy())).numpy()
        b_j = np.asarray(T.matrix_to_rotation_6d(jnp.asarray(r_j)))
        np.testing.assert_allclose(b_t, b_j, atol=1e-6)


# ---------------------------------------------------------------------------
# reference module loader
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_agg(tmp_path_factory):
    """Import /root/reference/lib/model/aggregation.py with stubs.

    Stubbed: pytorch3d (rotation shims above; knn_points is imported by the
    reference but never called), and the three modules whose import-time
    side effects need absent assets — head_object/head_mano/physics are only
    referenced as type annotations or injected instances (aggregation.py:
    60, 629, 1161), so bare placeholder classes suffice.
    lib/utils/hand_fn.py builds VERT2JOINT from ``asset/ours/vert2joint.pkl``
    at import (hand_fn.py:450); a placeholder pkl + chdir satisfies it (the
    matrix is unused by aggregation).
    """
    root = tmp_path_factory.mktemp("ref_assets")
    (root / "asset" / "ours").mkdir(parents=True)
    with open(root / "asset" / "ours" / "vert2joint.pkl", "wb") as f:
        pickle.dump({"vert2joint": np.zeros((21, 778), np.float32)}, f)

    p3d = types.ModuleType("pytorch3d")
    p3d_t = types.ModuleType("pytorch3d.transforms")
    p3d_rc = types.ModuleType("pytorch3d.transforms.rotation_conversions")
    for name, fn in _SHIMS.items():
        setattr(p3d_rc, name, fn)
        setattr(p3d_t, name, fn)
    p3d_ops = types.ModuleType("pytorch3d.ops")
    p3d_knn = types.ModuleType("pytorch3d.ops.knn")
    p3d_knn.knn_points = None  # imported, never called (aggregation.py:15)
    p3d_ops.knn = p3d_knn
    p3d.transforms = p3d_t
    p3d.ops = p3d_ops

    ho = types.ModuleType("lib.model.head_object")
    ho.HeadObject = type("HeadObject", (), {})
    hm = types.ModuleType("lib.model.head_mano")
    hm.HeadMano = type("HeadMano", (), {"get_hand_verts": object()})
    ph = types.ModuleType("lib.model.physics")
    ph.from_local_to_global = None

    stubs = {
        "pytorch3d": p3d,
        "pytorch3d.transforms": p3d_t,
        "pytorch3d.transforms.rotation_conversions": p3d_rc,
        "pytorch3d.ops": p3d_ops,
        "pytorch3d.ops.knn": p3d_knn,
        "lib.model.head_object": ho,
        "lib.model.head_mano": hm,
        "lib.model.physics": ph,
    }
    reload_keys = ("lib.model.aggregation", "lib.utils.hand_fn",
                   "lib.utils.transform_fn")
    saved = {k: sys.modules.get(k) for k in (*stubs, *reload_keys)}
    cwd, argv = os.getcwd(), sys.argv
    sys.modules.update(stubs)
    for k in reload_keys:
        sys.modules.pop(k, None)
    os.chdir(root)
    sys.argv = [argv[0]]  # lib.configs.args parses argv at import
    try:
        mod = importlib.import_module("lib.model.aggregation")
        yield mod
    finally:
        os.chdir(cwd)
        sys.argv = argv
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# ---------------------------------------------------------------------------
# shared primitive bridges (identical math on both sides)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mano():
    return synthetic_mano()


@pytest.fixture(scope="module")
def registry():
    return synthetic_registry()


@pytest.fixture(scope="module")
def tables(mano):
    return anchor_lib.load_anchor_tables(mano)


@pytest.fixture(scope="module")
def mano_fn(mano):
    """Torch-callable FK bridging to our MANO (HeadMano.get_hand_verts
    contract: flat (N, 48)/(N, 10) -> verts/joints in meters)."""

    def fn(pose, shape):
        v, j = hand_verts_meters(
            mano, jnp.asarray(pose.detach().numpy()),
            jnp.asarray(shape.detach().numpy()))
        return torch.from_numpy(np.asarray(v)), torch.from_numpy(np.asarray(j))

    return fn


class _ObjLayer:
    """Torch mesh layer over the same stacked registry constants ours uses
    (HeadObject.forward/flip_pt3d, head_object.py:36-67)."""

    def __init__(self, registry):
        self.kpt = torch.from_numpy(np.asarray(registry.kpt3d))
        self.verts = torch.from_numpy(np.asarray(registry.verts_sampled))
        self.com = torch.from_numpy(np.asarray(registry.com))[:, None]

    def __call__(self, pose, name, data_name="keypoint"):
        pts = {"keypoint": self.kpt, "verts": self.verts, "CoM": self.com}[
            data_name][name]                                     # (B, V, 3)
        rotmat = sh_rotation_6d_to_matrix(pose[..., :6])
        new = torch.einsum("bvi,b...ji->b...vj", pts.double(), rotmat.double())
        return (new + pose[..., 6:].unsqueeze(-2).double()).float()

    def flip_pt3d(self, pt3d, is_right):
        pt3d = pt3d.clone()
        idx = torch.arange(pt3d.shape[0])[~is_right]
        pt3d[idx, ..., 0] = pt3d[idx, ..., 0] * -1
        return pt3d


class _PhysicsFn:
    """physics.from_local_to_global bridged to our anchor tables."""

    def __init__(self, tables):
        self.tables = tables

    def from_local_to_global(self, force_local, hand_vert):
        fp, fg = anchor_lib.force_local_to_global(
            self.tables,
            jnp.asarray(force_local.detach().numpy()),
            jnp.asarray(hand_vert.detach().numpy()),
        )
        return (torch.from_numpy(np.asarray(fp)),
                torch.from_numpy(np.asarray(fg)))


@pytest.fixture(scope="module")
def obj_layer(registry):
    return _ObjLayer(registry)


@pytest.fixture(scope="module")
def physics_fn(tables):
    return _PhysicsFn(tables)


# ---------------------------------------------------------------------------
# fixtures: one grasped right hand + one ungrasped left hand
# ---------------------------------------------------------------------------

B, S, HAND_K, OBJ_K = 2, 6, 4, 3


def _inputs(seed=0):
    rs = np.random.RandomState(seed)
    d = {
        "hand_pose": (rs.randn(B, S, 48) * 0.35).astype(np.float32),
        "hand_pose_reg": (rs.randn(B, 48) * 0.35).astype(np.float32),
        "hand_shape": (rs.randn(B, S, 10) * 0.1).astype(np.float32),
        "root_joint": np.array([[0.02, -0.01, 0.55], [-0.03, 0.02, 0.6]],
                               np.float32),
        "root_joint_flip": np.array([[0.02, -0.01, 0.55], [0.03, 0.02, 0.6]],
                                    np.float32),
        "cam": np.tile(np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]],
                                np.float32), (B, 1, 1)),
        "hand_heatmap": rs.rand(B, 21, 64, 64).astype(np.float32),
        "obj_heatmap": rs.rand(B, 27, 64, 64).astype(np.float32),
        "hand_bbox": np.array([[5.0, 8.0, 120.0, 118.0],
                               [10.0, 4.0, 125.0, 122.0]], np.float32),
        "obj_bbox": np.array([[2.0, 6.0, 122.0, 120.0],
                              [7.0, 3.0, 126.0, 124.0]], np.float32),
        "is_right": np.array([True, False]),
        "is_grasped": np.array([True, False]),
        "obj_ids": np.array([3, 7], np.int64),
        "force_local": (rs.randn(B, 32, 3) * 0.4 + 0.2).astype(np.float32),
    }
    rot = np.asarray(T.matrix_to_rotation_6d(T.axis_angle_to_matrix(
        jnp.asarray(rs.randn(B, S, 3).astype(np.float32)))))
    trans = (rs.randn(B, S, 3) * 0.03).astype(np.float32)
    d["obj_pose6d"] = np.concatenate([rot, trans], -1).astype(np.float32)
    return d


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


class TestHandCascadeParity:
    def test_cascade(self, ref_agg, mano, mano_fn):
        d = _inputs()
        ha = ref_agg.HandAggregator(mano_fn)
        out_t = ha(
            mode="heatmap_cascade",
            pose=_t(d["hand_pose"]), pose_regression=_t(d["hand_pose_reg"]),
            shape=_t(d["hand_shape"]), root_joint=_t(d["root_joint_flip"]),
            cam_intrinsic=_t(d["cam"]), heatmap=_t(d["hand_heatmap"]),
            bbox=_t(d["hand_bbox"]), k=HAND_K, is_weight=True,
            use_regression_as_candidate=True,
        )
        out_j = agg.hand_heatmap_cascade(
            mano, jnp.asarray(d["hand_pose"]), jnp.asarray(d["hand_pose_reg"]),
            jnp.asarray(d["hand_shape"]), jnp.asarray(d["root_joint_flip"]),
            jnp.asarray(d["cam"]), jnp.asarray(d["hand_heatmap"]),
            jnp.asarray(d["hand_bbox"]), HAND_K, is_weight=True,
            use_regression_as_candidate=True,
        )
        # per-level selections must be identical
        for lvl in range(4):
            np.testing.assert_array_equal(
                out_t["middle_data"][lvl]["topk"].numpy(),
                np.asarray(out_j["middle_data"][lvl].topk),
                err_msg=f"level {lvl} topk")
            np.testing.assert_allclose(
                out_t["middle_data"][lvl]["val"].numpy(),
                np.asarray(out_j["middle_data"][lvl].val),
                atol=5e-4, err_msg=f"level {lvl} val")
        np.testing.assert_allclose(out_t["agg_vert"].numpy(),
                                   np.asarray(out_j["agg_vert"]), atol=2e-4)
        np.testing.assert_allclose(out_t["agg_joint"].numpy(),
                                   np.asarray(out_j["agg_joint"]), atol=2e-4)
        # fused MANO params as rotations (eigenvector sign is arbitrary)
        rm_t = sh_axis_angle_to_matrix(
            out_t["agg_hand_mano"][:, :48].reshape(B, 16, 3)).numpy()
        rm_j = np.asarray(T.axis_angle_to_matrix(
            out_j["agg_hand_mano"][:, :48].reshape(B, 16, 3)))
        np.testing.assert_allclose(rm_t, rm_j, atol=2e-4)

    def test_cascade_no_regression_no_weight(self, ref_agg, mano, mano_fn):
        d = _inputs(seed=3)
        ha = ref_agg.HandAggregator(mano_fn)
        out_t = ha(
            mode="heatmap_cascade",
            pose=_t(d["hand_pose"]), pose_regression=_t(d["hand_pose_reg"]),
            shape=_t(d["hand_shape"]), root_joint=_t(d["root_joint_flip"]),
            cam_intrinsic=_t(d["cam"]), heatmap=_t(d["hand_heatmap"]),
            bbox=_t(d["hand_bbox"]), k=HAND_K, is_weight=False,
            use_regression_as_candidate=False,
        )
        out_j = agg.hand_heatmap_cascade(
            mano, jnp.asarray(d["hand_pose"]), jnp.asarray(d["hand_pose_reg"]),
            jnp.asarray(d["hand_shape"]), jnp.asarray(d["root_joint_flip"]),
            jnp.asarray(d["cam"]), jnp.asarray(d["hand_heatmap"]),
            jnp.asarray(d["hand_bbox"]), HAND_K, is_weight=False,
            use_regression_as_candidate=False,
        )
        np.testing.assert_array_equal(
            out_t["middle_data"][0]["topk"].numpy(),
            np.asarray(out_j["middle_data"][0].topk))
        np.testing.assert_allclose(out_t["agg_vert"].numpy(),
                                   np.asarray(out_j["agg_vert"]), atol=2e-4)


class TestObjectParity:
    def test_heatmap_topk_and_fuse(self, ref_agg, registry, obj_layer):
        d = _inputs(seed=1)
        oa = ref_agg.ObjectAggregator(obj_layer)
        topk_t, w_t = oa.select_topk_object_by_heatmap(
            pose6d=_t(d["obj_pose6d"]), root_joint=_t(d["root_joint"]),
            obj_name=_t(d["obj_ids"]), is_right=_t(d["is_right"]),
            cam_intrinsic=_t(d["cam"]), heatmap=_t(d["obj_heatmap"]),
            bbox=_t(d["obj_bbox"]), k=OBJ_K)
        fused_t = oa.fuse_topk(topk=topk_t, weight=w_t,
                               pose6d=_t(d["obj_pose6d"]))

        topk_j, w_j = agg.obj_topk_by_heatmap(
            registry, jnp.asarray(d["obj_pose6d"]),
            jnp.asarray(d["root_joint"]), jnp.asarray(d["obj_ids"]),
            jnp.asarray(d["is_right"]), jnp.asarray(d["cam"]),
            jnp.asarray(d["obj_heatmap"]), jnp.asarray(d["obj_bbox"]), OBJ_K)
        fused_j = agg.obj_fuse_topk(jnp.asarray(d["obj_pose6d"]), topk_j, w_j)

        np.testing.assert_array_equal(topk_t.numpy(), np.asarray(topk_j))
        np.testing.assert_allclose(w_t.numpy(), np.asarray(w_j), atol=1e-5)
        np.testing.assert_allclose(fused_t[..., 6:].numpy(),
                                   np.asarray(fused_j[..., 6:]), atol=1e-5)
        rm_t = sh_rotation_6d_to_matrix(fused_t[..., :6]).numpy()
        rm_j = np.asarray(T.rotation_6d_to_matrix(fused_j[..., :6]))
        np.testing.assert_allclose(rm_t, rm_j, atol=2e-4)

    def test_physics3(self, ref_agg, registry, tables, obj_layer):
        d = _inputs(seed=2)
        # global forces from an arbitrary hand (shared across both sides)
        rs = np.random.RandomState(9)
        force_point = (d["root_joint"][:, None] +
                       rs.randn(B, 32, 3).astype(np.float32) * 0.05)
        force_global = (rs.randn(B, 32, 3).astype(np.float32) * 0.5 + 0.1)

        oa = ref_agg.ObjectAggregator(obj_layer)
        topk_t, w_t = oa.select_topk_object_by_physics3(
            pose6d=_t(d["obj_pose6d"]), root_joint=_t(d["root_joint"]),
            obj_name=_t(d["obj_ids"]), is_right=_t(d["is_right"]),
            force_point=_t(force_point), force_global=_t(force_global),
            k=OBJ_K)

        topk_j, w_j = agg.obj_topk_by_physics3(
            registry, jnp.asarray(d["obj_pose6d"]),
            jnp.asarray(d["root_joint"]), jnp.asarray(d["obj_ids"]),
            jnp.asarray(d["is_right"]), jnp.asarray(force_point),
            jnp.asarray(force_global), OBJ_K)

        np.testing.assert_array_equal(topk_t.numpy(), np.asarray(topk_j))
        np.testing.assert_allclose(w_t.numpy(), np.asarray(w_j), atol=1e-6)


class TestHandPhysicsParity:
    def test_select_by_physics(self, ref_agg, mano, tables, mano_fn,
                               physics_fn):
        d = _inputs(seed=4)
        rs = np.random.RandomState(5)
        C = HAND_K + 1
        pose58 = np.concatenate(
            [(rs.randn(B, C, 48) * 0.35).astype(np.float32),
             (rs.randn(B, C, 10) * 0.1).astype(np.float32)], -1)
        obj_vert = (d["root_joint"][:, None] +
                    rs.randn(B, 300, 3).astype(np.float32) * 0.04)
        obj_com = obj_vert.mean(1, keepdims=True)

        ha = ref_agg.HandAggregator(mano_fn)
        out_t = ha(
            mode="physics", pose=_t(pose58),
            root_joint_flip=_t(d["root_joint_flip"]),
            obj_vert=_t(obj_vert), obj_com=_t(obj_com), K=3,
            physics_fn=physics_fn, force_local=_t(d["force_local"]),
            is_right=_t(d["is_right"]))

        out_j = agg.hand_physics_rerank(
            mano, tables, jnp.asarray(pose58),
            jnp.asarray(d["root_joint_flip"]), jnp.asarray(obj_vert),
            jnp.asarray(obj_com), jnp.asarray(d["force_local"]), 3)

        np.testing.assert_allclose(out_t["agg_vert"].numpy(),
                                   np.asarray(out_j["agg_vert"]), atol=2e-4)
        np.testing.assert_allclose(out_t["agg_joint"].numpy(),
                                   np.asarray(out_j["agg_joint"]), atol=2e-4)


class TestHOIParity:
    def test_full_orchestration(self, ref_agg, mano, registry, tables,
                                mano_fn, obj_layer, physics_fn):
        d = _inputs(seed=6)
        hoi = ref_agg.HOI_Aggregator(mano_fn, obj_layer, physics_fn)
        out_t = hoi(
            hand_pose_diff=_t(d["hand_pose"]),
            hand_pose_regression=_t(d["hand_pose_reg"]),
            hand_shape=_t(d["hand_shape"]),
            root_joint_flip=_t(d["root_joint_flip"]),
            root_joint=_t(d["root_joint"]),
            cam_intrinsic=_t(d["cam"]),
            hand_heatmap=_t(d["hand_heatmap"]), hand_bbox=_t(d["hand_bbox"]),
            hand_topk=HAND_K,
            obj_pose6d=_t(d["obj_pose6d"]), obj_heatmap=_t(d["obj_heatmap"]),
            obj_bbox=_t(d["obj_bbox"]), obj_topk=OBJ_K,
            obj_name=_t(d["obj_ids"]), is_right=_t(d["is_right"]),
            is_grasped=_t(d["is_grasped"]),
            force_local=_t(d["force_local"]),
        )
        out_j = agg.hoi_aggregate(
            mano, registry, tables,
            cam_intrinsic=jnp.asarray(d["cam"]),
            root_joint_flip=jnp.asarray(d["root_joint_flip"]),
            root_joint=jnp.asarray(d["root_joint"]),
            is_right=jnp.asarray(d["is_right"]),
            force_local=jnp.asarray(d["force_local"]),
            is_grasped=jnp.asarray(d["is_grasped"]),
            hand_pose_diff=jnp.asarray(d["hand_pose"]),
            hand_pose_regression=jnp.asarray(d["hand_pose_reg"]),
            hand_shape=jnp.asarray(d["hand_shape"]),
            hand_heatmap=jnp.asarray(d["hand_heatmap"]),
            hand_bbox=jnp.asarray(d["hand_bbox"]),
            hand_topk=HAND_K,
            obj_pose6d=jnp.asarray(d["obj_pose6d"]),
            obj_heatmap=jnp.asarray(d["obj_heatmap"]),
            obj_bbox=jnp.asarray(d["obj_bbox"]),
            obj_topk=OBJ_K,
            obj_ids=jnp.asarray(d["obj_ids"]),
        )
        np.testing.assert_allclose(
            out_t["obj_agg_6d"][..., 6:].numpy(),
            np.asarray(out_j["obj_agg_6d"][..., 6:]), atol=5e-4)
        rm_t = sh_rotation_6d_to_matrix(out_t["obj_agg_6d"][..., :6]).numpy()
        rm_j = np.asarray(T.rotation_6d_to_matrix(out_j["obj_agg_6d"][..., :6]))
        np.testing.assert_allclose(rm_t, rm_j, atol=1e-3)
        np.testing.assert_allclose(out_t["agg_obj_vert"].numpy(),
                                   np.asarray(out_j["agg_obj_vert"]),
                                   atol=1e-3)
        np.testing.assert_allclose(out_t["hand_agg_vert"].numpy(),
                                   np.asarray(out_j["hand_agg_vert"]),
                                   atol=5e-4)
        np.testing.assert_allclose(out_t["hand_agg_joint"].numpy(),
                                   np.asarray(out_j["hand_agg_joint"]),
                                   atol=5e-4)
