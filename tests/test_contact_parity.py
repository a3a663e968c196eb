"""Golden parity vs the reference's own contact/anchor code (physics_fn.py).

The reference's live contact labeling is ``get_hand_contact``
(base.py:841-911, called at dexycb6.py:320): NN against the full object
mesh, signed normal distance + vertical-distance threshold, double-sigmoid
band (``detect_hand_and_object_contact``, physics_fn.py:47-117).  Its anchor
machinery (``ForceAnchor``, physics_fn.py:121-257) pools vertex contact to
32 anchors and rebuilds per-anchor frames.

``lib.utils.physics_fn`` is pure numpy/torch/sklearn — importable here.  The
only obstacle is import-time asset loading (vert2joint.pkl + CPF anchor
tables), which we fabricate with compatible shapes; both sides then consume
the SAME fabricated tables, so any disagreement is a formula bug, not an
asset difference.
"""
import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_physics_fn(tmp_path_factory):
    if not os.path.isdir(_REF):
        pytest.skip("reference tree unavailable")
    root = tmp_path_factory.mktemp("ref_assets")
    rng = np.random.RandomState(0)

    ours = root / "asset" / "ours"
    ours.mkdir(parents=True)
    vert2joint = rng.rand(21, 778).astype(np.float64)
    vert2joint /= vert2joint.sum(axis=1, keepdims=True)
    with open(ours / "vert2joint.pkl", "wb") as f:
        pickle.dump({"vert2joint": vert2joint}, f)

    anchor = root / "asset" / "2021_CVPR_CPF" / "anchor"
    anchor.mkdir(parents=True)
    face_vert_idx = rng.randint(0, 778, size=(32, 3)).astype(np.int32)
    anchor_weight = rng.rand(32, 2) * 0.5
    np.savetxt(anchor / "face_vertex_idx.txt", face_vert_idx, fmt="%d")
    np.savetxt(anchor / "anchor_weight.txt", anchor_weight)
    np.savetxt(anchor / "merged_vertex_assignment.txt",
               rng.randint(0, 32, size=778), fmt="%d")
    with open(anchor / "anchor_mapping_path.pkl", "wb") as f:
        pickle.dump({}, f)

    _ipdb = types.ModuleType("ipdb")
    _ipdb.set_trace = lambda *a, **k: None
    sys.modules.setdefault("ipdb", _ipdb)
    if _REF not in sys.path:
        sys.path.append(_REF)

    cwd = os.getcwd()
    argv = sys.argv
    os.chdir(root)
    sys.argv = [sys.argv[0]]
    try:
        import lib.utils.physics_fn as pf
    finally:
        os.chdir(cwd)
        sys.argv = argv
    return pf, {
        "vert2joint": vert2joint,
        "face_vert_idx": face_vert_idx,
        "anchor_weight": anchor_weight,
        "asset_path": str(root / "asset" / "2021_CVPR_CPF"),
    }


def _grid_hand_mesh(n=28, jitter_seed=1):
    """A deterministic bumpy surface with n*n (=784 >= 778) vertices."""
    rng = np.random.RandomState(jitter_seed)
    xs = np.linspace(0.0, 0.09, n)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    zz = 0.004 * np.sin(60.0 * xx) * np.cos(45.0 * yy)
    verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    verts += rng.randn(*verts.shape) * 2e-4
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts.astype(np.float64), np.asarray(faces, np.int64)


def test_contact_weights_match_reference(ref_physics_fn):
    """signed_contact_weights == detect_hand_and_object_contact's hand map
    (the part the live path consumes) at the reference's cfg thresholds."""
    pf, _ = ref_physics_fn
    from vpho_tpu.data.dexycb import signed_contact_weights, vertex_normals

    hand_verts, faces = _grid_hand_mesh()
    rng = np.random.RandomState(2)
    # object point cloud straddling the surface so the band is exercised:
    # points above, inside (+-1 cm) and far away
    obj_verts = np.concatenate([
        rng.rand(600, 3) * [0.09, 0.09, 0.02] - [0, 0, 0.01],
        rng.rand(200, 3) * 0.09 + [0.0, 0.0, 0.05],
    ])
    obj_normals = rng.randn(*obj_verts.shape)
    obj_normals /= np.linalg.norm(obj_normals, axis=-1, keepdims=True)

    normals = vertex_normals(hand_verts, faces).astype(np.float64)
    ref_contact, _, _ = pf.detect_hand_and_object_contact(
        hand_verts, normals, obj_verts, obj_normals,
        normal_distance_thresh=[-0.01, 0.01], vertical_distance_thresh=0.005)
    ref_contact = np.clip(ref_contact, 0, 1)  # dexycb6.py:330

    ours = signed_contact_weights(
        hand_verts.astype(np.float32), faces, obj_verts.astype(np.float32),
        lo=-0.01, hi=0.01, tangential_thresh=0.005)

    assert ref_contact.max() > 0.5, "fixture must actually produce contact"
    assert (ref_contact > 0).sum() > 20
    np.testing.assert_allclose(ours, ref_contact, atol=2e-4)


def _our_tables(fx):
    import jax.numpy as jnp
    from vpho_tpu.models.anchor import ForceAnchorTables, _corresponding_skeleton

    aw = np.concatenate([np.ones([32, 1]), fx["anchor_weight"]], axis=1)
    return ForceAnchorTables(
        face_vert_idx=jnp.asarray(fx["face_vert_idx"]),
        anchor_weight=jnp.asarray(aw, jnp.float32),
        skeleton=jnp.asarray(_corresponding_skeleton()),
        vert2joint=jnp.asarray(fx["vert2joint"], jnp.float32),
    )


def test_anchor_pooling_and_grasp_match_reference(ref_physics_fn):
    pf, fx = ref_physics_fn
    from vpho_tpu.models.anchor import check_is_grasped_np, pool_contact_to_anchors_np

    ref_anchor = pf.ForceAnchor(assert_path=fx["asset_path"])
    tables = _our_tables(fx)
    rng = np.random.RandomState(3)

    for trial in range(4):
        contact = (rng.rand(778) < 0.1 * trial) * rng.rand(778)
        ref_fc = ref_anchor.get_force_contact(contact)
        our_fc = pool_contact_to_anchors_np(tables, contact)
        np.testing.assert_allclose(our_fc, ref_fc, atol=1e-5)
        assert check_is_grasped_np(our_fc) == ref_anchor.check_is_grasped(ref_fc)


def test_anchor_points_and_frames_match_reference(ref_physics_fn):
    """Anchor rebuild + local frames (physics_fn.py:222-256) with the same
    fabricated tables and the same vert2joint regressor on both sides."""
    pf, fx = ref_physics_fn
    from vpho_tpu.models.anchor import anchor_points_and_frames

    ref_anchor = pf.ForceAnchor(assert_path=fx["asset_path"])
    # the reference's __call__ reads the module-global VERT2JOINT built from
    # the fabricated pkl — identical to our injected vert2joint
    tables = _our_tables(fx)

    rng = np.random.RandomState(4)
    verts = rng.randn(2, 778, 3).astype(np.float64) * 0.05
    ref_pts, ref_frames = ref_anchor(verts)
    our_pts, our_frames = anchor_points_and_frames(tables, verts.astype(np.float32))

    np.testing.assert_allclose(np.asarray(our_pts), ref_pts, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_frames), ref_frames, atol=1e-4)


def test_skeleton_table_matches_reference(ref_physics_fn):
    """Our _corresponding_skeleton() re-derivation == the reference's
    label-sorted coresponding_skeleton (physics_fn.py:156-170)."""
    pf, fx = ref_physics_fn
    from vpho_tpu.models.anchor import FINGER_ANCHORS, _corresponding_skeleton

    ref_anchor = pf.ForceAnchor(assert_path=fx["asset_path"])
    np.testing.assert_array_equal(_corresponding_skeleton(),
                                  np.asarray(ref_anchor.coresponding_skeleton))
    for k, v in ref_anchor.finger_label.items():
        assert sorted(FINGER_ANCHORS[k]) == sorted(v), k
