"""Behavioral tests for the functional aggregation pipeline.

Semantics pinned with constructed candidate sets where the correct selection
is known: the cascade must pick the candidate whose projected joints land on
the heatmap peaks; physics re-ranking must prefer candidates whose contact
anchors touch the object surface.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.models import aggregation as agg
from vpho_tpu.models import anchor as anchor_lib
from vpho_tpu.models import heads
from vpho_tpu.models.mano import hand_verts_meters, synthetic_mano
from vpho_tpu.models.ycb import synthetic_registry
from vpho_tpu.ops.heatmap import adaptive_bbox_heatmap
from vpho_tpu.utils import transforms as T


@pytest.fixture(scope="module")
def mano():
    return synthetic_mano()


@pytest.fixture(scope="module")
def registry():
    return synthetic_registry()


@pytest.fixture(scope="module")
def tables(mano):
    return anchor_lib.load_anchor_tables(mano)


def _camera(B):
    return jnp.tile(jnp.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]]), (B, 1, 1))


class TestHelpers:
    def test_batched_min_dist_matches_bruteforce(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 3))
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 50, 3))
        got = np.asarray(agg.batched_min_dist(x, y))
        ref = np.linalg.norm(
            np.asarray(x)[..., :, None, :] - np.asarray(y)[..., None, :, :], axis=-1
        ).min(-1)
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_nearest_points(self):
        x = jnp.zeros((1, 2, 3))
        y = jnp.array([[[1.0, 0, 0], [0.1, 0, 0], [5, 5, 5]]])
        out = np.asarray(agg.nearest_points(x, y))
        np.testing.assert_allclose(out[0, 0], [0.1, 0, 0], atol=1e-6)

    def test_take_candidates(self):
        x = jnp.arange(2 * 5 * 3).reshape(2, 5, 3).astype(jnp.float32)
        idx = jnp.array([[4, 0], [1, 2]])
        out = np.asarray(agg.take_candidates(x, idx))
        np.testing.assert_allclose(out[0, 0], np.asarray(x[0, 4]))
        np.testing.assert_allclose(out[1, 1], np.asarray(x[1, 2]))

    def test_normalize_pt2d(self):
        bbox = jnp.array([[10.0, 20.0, 110.0, 120.0]])
        pts = jnp.array([[[[60.0, 70.0]]]])  # center of the box
        out = np.asarray(agg.normalize_pt2d_to_bbox(pts, bbox))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)


class TestHandCascade:
    def _build(self, mano, B=2, S=6, k=3):
        key = jax.random.PRNGKey(0)
        gt_pose = jax.random.normal(key, (B, 48)) * 0.3
        shape = jnp.zeros((B, 10))
        root = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1))
        K = _camera(B)
        # GT heatmap from GT joints
        _, joint = hand_verts_meters(mano, gt_pose, shape)
        jt2d = T.project_points_batched(joint + root[:, None], K)
        bbox = jnp.concatenate([jt2d.min(1) - 5, jt2d.max(1) + 5], axis=-1)
        hm = adaptive_bbox_heatmap(jt2d, bbox, 64, 2.0)
        # candidates: GT + noisy others
        noise = jax.random.normal(jax.random.PRNGKey(1), (B, S - 1, 48)) * 0.6
        pose = jnp.concatenate([gt_pose[:, None], gt_pose[:, None] + noise], axis=1)
        shapes = jnp.zeros((B, S, 10))
        return gt_pose, pose, shapes, root, K, hm, bbox

    def test_level0_selects_gt_candidate(self, mano):
        gt_pose, pose, shapes, root, K, hm, bbox = self._build(mano)
        fn = jax.jit(lambda *a: agg.select_topk_hand_level(
            mano, *a, k=1, fuse_index=list(range(48)),
            observe_index=list(range(21)), is_independent=False, is_weight=False))
        data = fn(pose, shapes, root, K, hm, bbox)
        # top-1 must be candidate 0 (the GT) for every batch element
        np.testing.assert_array_equal(np.asarray(data.topk)[:, 0], 0)

    def test_cascade_improves_over_random_candidate(self, mano):
        gt_pose, pose, shapes, root, K, hm, bbox = self._build(mano, S=8)
        fn = jax.jit(lambda *a: agg.hand_heatmap_cascade(mano, *a, k=3))
        out = fn(pose, pose[:, 3], shapes, root, K, hm, bbox)
        _, gt_joint = hand_verts_meters(mano, gt_pose, shapes[:, 0])
        _, rnd_joint = hand_verts_meters(mano, pose[:, 4], shapes[:, 0])
        agg_err = float(jnp.linalg.norm(out["agg_joint"] - gt_joint, axis=-1).mean())
        rnd_err = float(jnp.linalg.norm(rnd_joint - gt_joint, axis=-1).mean())
        assert agg_err < rnd_err
        assert out["agg_hand_mano"].shape == (2, 58)
        assert len(out["middle_data"]) == 4

    def test_average_all(self, mano):
        pose = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 48)) * 0.1
        shape = jnp.zeros((2, 5, 10))
        out = jax.jit(lambda p, s: agg.hand_average_all(mano, p, s))(pose, shape)
        assert out["agg_vert"].shape == (2, 778, 3)


class TestObjectAggregation:
    def _build(self, registry, B=2, S=6):
        key = jax.random.PRNGKey(3)
        ids = jnp.array([1, 5])[:B]
        root = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1))
        gt_rot = T.matrix_to_rotation_6d(T.axis_angle_to_matrix(
            jax.random.normal(key, (B, 3)) * 0.5))
        gt = jnp.concatenate([gt_rot, jax.random.normal(key, (B, 3)) * 0.02], -1)
        K = _camera(B)
        kpt = heads.object_transform(registry, gt.at[..., 6:].add(root), ids)
        kpt2d = T.project_points_batched(kpt, K)
        bbox = jnp.concatenate([kpt2d.min(1) - 5, kpt2d.max(1) + 5], axis=-1)
        from vpho_tpu.ops.heatmap import square_bbox_heatmap

        hm = square_bbox_heatmap(kpt2d, bbox, 64, 2.0)
        noise = jax.random.normal(jax.random.PRNGKey(4), (B, S - 1, 9))
        noise = noise * jnp.array([1.0] * 6 + [0.05] * 3)
        cand = jnp.concatenate([gt[:, None], gt[:, None] + noise], axis=1)
        return ids, root, gt, cand, K, hm, bbox

    def test_heatmap_topk_selects_gt(self, registry):
        ids, root, gt, cand, K, hm, bbox = self._build(registry)
        is_right = jnp.ones((2,), bool)
        fn = jax.jit(lambda *a: agg.obj_topk_by_heatmap(registry, *a, k=1))
        topk, weight = fn(cand, root, ids, is_right, K, hm, bbox)
        np.testing.assert_array_equal(np.asarray(topk)[:, 0], 0)
        np.testing.assert_allclose(np.asarray(weight).sum(1), 1.0, atol=1e-5)

    def test_fuse_topk_identity(self, registry):
        ids, root, gt, cand, K, hm, bbox = self._build(registry)
        topk = jnp.zeros((2, 1), jnp.int32)
        fused = agg.obj_fuse_topk(cand, topk)
        # fusing a single candidate returns (a rot-normalized copy of) it
        gt_m = T.rotation_6d_to_matrix(gt[..., :6])
        fu_m = T.rotation_6d_to_matrix(fused[..., :6])
        np.testing.assert_allclose(np.asarray(gt_m), np.asarray(fu_m), atol=1e-4)
        np.testing.assert_allclose(np.asarray(fused[..., 6:]), np.asarray(gt[..., 6:]),
                                   atol=1e-6)

    def test_physics3_prefers_contact(self, registry, mano, tables):
        """Candidate whose surface touches the anchor points must rank first."""
        B = 1
        ids = jnp.array([0])
        root = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1))
        pose = jnp.zeros((B, 48))
        vert, _ = hand_verts_meters(mano, pose, jnp.zeros((B, 10)))
        vert_cam = vert + root[:, None]
        fl = jnp.ones((B, 32, 3)) * 0.05
        fp, fg = anchor_lib.force_local_to_global(tables, fl, vert_cam)
        # candidate 0: object centered at the mean anchor point (contact);
        # candidate 1: object 0.5m away
        rot = T.matrix_to_rotation_6d(jnp.eye(3))[None]
        near_t = fp.mean(1) - root
        far_t = near_t + jnp.array([0.5, 0.0, 0.0])
        cand = jnp.stack([
            jnp.concatenate([rot[0], near_t[0]]),
            jnp.concatenate([rot[0], far_t[0]]),
        ])[None]
        fn = jax.jit(lambda *a: agg.obj_topk_by_physics3(registry, *a, k=1))
        topk, _ = fn(cand, root, ids, jnp.ones((B,), bool), fp, fg)
        assert int(topk[0, 0]) == 0


class TestHOIAggregate:
    def test_full_pipeline_shapes(self, mano, registry, tables):
        B, S = 2, 5
        key = jax.random.PRNGKey(7)
        pose = jax.random.normal(key, (B, S, 48)) * 0.2
        shape = jnp.zeros((B, S, 10))
        root = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1))
        K = _camera(B)
        run = jax.jit(lambda kw: agg.hoi_aggregate(
            mano, registry, tables, hand_topk=3, obj_topk=2, **kw))
        out = run(dict(
            cam_intrinsic=K, root_joint_flip=root, root_joint=root,
            is_right=jnp.ones((B,), bool),
            force_local=jnp.ones((B, 32, 3)) * 0.02,
            is_grasped=jnp.array([1.0, 0.0]),
            hand_pose_diff=pose, hand_pose_regression=pose[:, 0],
            hand_shape=shape,
            hand_heatmap=jnp.ones((B, 21, 64, 64)) * 0.1,
            hand_bbox=jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1)),
            obj_pose6d=jax.random.normal(jax.random.PRNGKey(8), (B, S, 9)) * 0.1,
            obj_heatmap=jnp.ones((B, 27, 64, 64)) * 0.1,
            obj_bbox=jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1)),
            obj_ids=jnp.array([0, 3]),
        ))
        assert out["obj_agg_6d"].shape == (B, 9)
        assert out["hand_agg_mano"].shape == (B, 58)
        assert out["hand_agg_vert"].shape == (B, 778, 3)
        assert out["hand_agg_joint"].shape == (B, 21, 3)
        assert out["agg_obj_vert"].shape == (B, 2048, 3)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_jit_compiles(self, mano, registry, tables):
        B, S = 1, 3

        def run(key):
            pose = jax.random.normal(key, (B, S, 48)) * 0.2
            root = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1))
            return agg.hoi_aggregate(
                mano, registry, tables,
                cam_intrinsic=_camera(B), root_joint_flip=root, root_joint=root,
                is_right=jnp.ones((B,), bool),
                force_local=jnp.ones((B, 32, 3)) * 0.02,
                is_grasped=jnp.ones((B,)),
                hand_pose_diff=pose, hand_pose_regression=pose[:, 0],
                hand_shape=jnp.zeros((B, S, 10)),
                hand_heatmap=jnp.ones((B, 21, 64, 64)),
                hand_bbox=jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1)),
                hand_topk=2,
                obj_pose6d=jax.random.normal(key, (B, S, 9)) * 0.1,
                obj_heatmap=jnp.ones((B, 27, 64, 64)),
                obj_bbox=jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1)),
                obj_topk=2,
                obj_ids=jnp.array([0]),
            )["hand_agg_vert"]

        out = jax.jit(run)(jax.random.PRNGKey(0))
        assert out.shape == (B, 778, 3)
