"""Tests for auxiliary subsystems: EMA, profiling, viz dumps, extra agg modes."""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.engine import profiling
from vpho_tpu.engine.viz import save_viz_force, save_viz_hand, save_viz_obj
from vpho_tpu.models import aggregation as agg
from vpho_tpu.models.ema import ema_init, ema_update
from vpho_tpu.models.heads import HeadObjectRegress, object_regress_losses
from vpho_tpu.models.mano import hand_verts_meters, synthetic_mano
from vpho_tpu.models.ycb import synthetic_registry
from vpho_tpu.ops.heatmap import adaptive_bbox_heatmap
from vpho_tpu.utils import transforms as T


class TestEMA:
    def test_warmup_and_convergence(self):
        params = {"w": jnp.zeros(3)}
        state = ema_init(params)
        target = {"w": jnp.ones(3)}
        for _ in range(200):
            state = ema_update(state, target, decay=0.9)
        np.testing.assert_allclose(np.asarray(state.params["w"]), 1.0, atol=1e-3)
        assert int(state.num_updates) == 200

    def test_early_updates_track_fast(self):
        state = ema_init({"w": jnp.zeros(())})
        state = ema_update(state, {"w": jnp.ones(())}, decay=0.999)
        # warmup decay is (1+1)/(10+1) ~ 0.18, so the first update moves a lot
        assert float(state.params["w"]) > 0.5

    def test_swap_returns_shadow_and_backup(self):
        """ema_swap = the reference EMA's store+copy_to pair (ema.py):
        evaluate with the shadow weights, keep the live ones to restore."""
        from vpho_tpu.models.ema import ema_swap

        live = {"w": jnp.zeros(2)}
        state = ema_update(ema_init(live), {"w": jnp.ones(2)}, decay=0.5)
        shadow, backup = ema_swap(state, live)
        assert shadow is state.params
        assert backup is live


class TestProfiling:
    def test_flops_of_matmul(self):
        def f(a, b):
            return a @ b

        cost = profiling.flops_of(f, jnp.ones((64, 64)), jnp.ones((64, 64)))
        # 2*M*N*K = 524288 flops
        assert cost["flops"] >= 2 * 64**3 * 0.5

    def test_param_count(self):
        assert profiling.param_count({"a": jnp.ones((3, 4)), "b": jnp.ones(5)}) == 17

    def test_device_timer(self):
        res = {}
        with profiling.device_timer("x", res) as h:
            h["outputs"] = jnp.ones((8, 8)) * 2
        assert res["x"] >= 0


class TestVizDumps:
    def test_hand_and_force_dumps(self, tmp_path):
        d = str(tmp_path)
        p = save_viz_hand(
            d, 0, gt_vert=np.zeros((778, 3)), gt_obj_vert=np.zeros((100, 3)),
            pd_vert_reg=np.zeros((778, 3)), pd_vert_diff=np.zeros((5, 778, 3)),
            pd_vert_agg=np.zeros((778, 3)), rgb_path="x.jpg")
        with open(p, "rb") as f:
            dt = pickle.load(f)
        assert "gt_hand_#000000" in dt
        assert any(k.startswith("hand_diff_vert_0_#") for k in dt)

        p2 = save_viz_force(
            d, 1, vert=np.zeros((778, 3)), force_point=np.zeros((32, 3)),
            force_global=np.ones((32, 3)), gravity=np.zeros((1, 3)),
            com=np.zeros((1, 3)), obj_mesh=np.zeros((100, 3)))
        with open(p2, "rb") as f:
            dt2 = pickle.load(f)
        assert dt2["force_#FF0000"].shape == (32, 2, 3)

    def test_obj_dump(self, tmp_path):
        reg = synthetic_registry()
        p = save_viz_obj(
            str(tmp_path), 2, reg, 0,
            gt_rt=np.eye(3, 4), pd_rt_cands=np.tile(np.eye(3, 4), (3, 1, 1)),
            pd_rt_agg=np.eye(3, 4), gt_hand=np.zeros((778, 3)))
        with open(p, "rb") as f:
            dt = pickle.load(f)
        assert dt["obj_name"] == reg.names[0]

    def test_segmentation_dump(self, tmp_path):
        """Reference layout (train_diff_hand_obj.py:701-718): one JPG of
        [rgb obj crop | gt segm | pd segm] at the segm map's resolution.
        Reachable only when a model emits obj_segm (same gate as :310-314)."""
        from vpho_tpu.engine.viz import save_viz_segmentation

        rng = np.random.RandomState(3)
        p = save_viz_segmentation(
            str(tmp_path), 4,
            rgb_norm=rng.randn(64, 64, 3).astype(np.float32),
            bbox_obj=np.array([8, 8, 40, 40], np.float32),
            pd_obj_segm=rng.rand(32, 32).astype(np.float32),
            gt_obj_segm=(rng.rand(32, 32) > 0.5).astype(np.float32))
        import cv2

        img = cv2.imread(p)
        assert img is not None and img.shape == (32, 3 * 32, 3)
        # degenerate bbox -> no file, no crash
        assert save_viz_segmentation(
            str(tmp_path), 5, rgb_norm=np.zeros((64, 64, 3)),
            bbox_obj=np.array([50, 50, 50, 50]),
            pd_obj_segm=np.zeros((8, 8)), gt_obj_segm=np.zeros((8, 8))) is None

    def test_mesh_force_dump(self, tmp_path):
        """Schema parity with the reference's save_viz_mesh_force
        (train_diff_hand_obj.py:842-852): mesh dicts carry vertex+face,
        lines are (N, 2, 3) segments, K rides along; left-hand x-flip and
        flipped-root re-add match :802-850; forces are derived from the
        POST-flip verts (:811-812), so the arrows stay on the meshes."""
        from vpho_tpu.engine.viz import save_viz_mesh_force
        from vpho_tpu.models import anchor as anchor_lib
        from vpho_tpu.models.mano import synthetic_mano

        tables = anchor_lib.load_anchor_tables(synthetic_mano())
        rng = np.random.RandomState(0)
        obj_v = rng.randn(50, 3).astype(np.float32)
        faces = rng.randint(0, 50, (96, 3))
        root = np.array([0.1, -0.2, 0.6], np.float32)
        rootf = np.array([-0.1, -0.2, 0.6], np.float32)
        pd_hand = rng.randn(778, 3).astype(np.float32)
        p = save_viz_mesh_force(
            str(tmp_path), 3, obj_verts=obj_v, obj_faces=faces,
            gt_rt=np.eye(3, 4), pd_rt=np.eye(3, 4),
            root_joint=root, root_joint_flip=rootf,
            gt_hand_vert=rng.randn(778, 3), pd_hand_vert=pd_hand,
            hand_faces=rng.randint(0, 778, (1538, 3)),
            gt_force_local=rng.randn(32, 3).astype(np.float32),
            pd_force_local=rng.randn(32, 3).astype(np.float32),
            anchor_tables=tables,
            gravity=np.array([[0, 9.8, 0.0]]), com=np.zeros(3),
            K=np.eye(3), is_right=False)
        with open(p, "rb") as f:
            dt = pickle.load(f)
        assert set(dt) == {"gt_mesh", "pd_mesh", "gt_force_line_#00FF00",
                           "pd_force_line_#FF0000", "gt_hand_mesh",
                           "pd_hand_mesh", "gt_gravity_line_#00FF00",
                           "pd_gravity_line_#FF0000", "K"}
        assert dt["gt_mesh"]["face"].shape == (96, 3)
        assert dt["pd_force_line_#FF0000"].shape == (32, 2, 3)
        # left hand: obj x is mirrored BEFORE the flipped root is re-added
        np.testing.assert_allclose(
            dt["gt_mesh"]["vertex"],
            (obj_v - root) * np.array([-1.0, 1, 1]) + rootf, atol=1e-6)
        # force arrows are anchored ON the dumped pd hand mesh: every pd
        # force start point is a barycentric combo of post-flip pd verts,
        # so it must lie inside the mesh's bounding box
        pd_mesh_v = dt["pd_hand_mesh"]["vertex"]
        starts = dt["pd_force_line_#FF0000"][:, 0]
        assert (starts >= pd_mesh_v.min(0) - 1e-4).all()
        assert (starts <= pd_mesh_v.max(0) + 1e-4).all()

    def test_force_local_to_global_np_matches_jax(self):
        from vpho_tpu.models import anchor as anchor_lib
        from vpho_tpu.models.mano import synthetic_mano

        import jax
        import jax.numpy as jnp

        tables = anchor_lib.load_anchor_tables(synthetic_mano())
        rng = np.random.RandomState(3)
        verts = rng.randn(778, 3).astype(np.float32) * 0.1
        fl = rng.randn(32, 3).astype(np.float32)
        p_np, g_np = anchor_lib.force_local_to_global_np(tables, fl, verts)
        p_j, g_j = anchor_lib.force_local_to_global(
            tables, jnp.asarray(fl), jnp.asarray(verts))
        np.testing.assert_allclose(p_np, np.asarray(p_j), atol=1e-5)
        np.testing.assert_allclose(g_np, np.asarray(g_j), atol=1e-5)

    def test_force_global_to_local_round_trip(self):
        """force_global_to_local (reference physics.py:374-378) vs the
        forward map.  The anchor frame is orthogonal but its x axis is NOT
        unit (reference physics_fn.py:240-242: x = y_unit x z_unit, norm
        sin(theta), never renormalized), so local -> global -> local scales
        the x component by |x_axis|^2 while y/z round-trip exactly — pin
        that reference behavior, not an idealized orthonormal inverse."""
        from vpho_tpu.models import anchor as anchor_lib

        tables = anchor_lib.load_anchor_tables(synthetic_mano())
        rng = np.random.RandomState(5)
        verts = jnp.asarray(rng.randn(778, 3).astype(np.float32) * 0.1)
        fl = jnp.asarray(rng.randn(32, 3).astype(np.float32))
        _, fg = anchor_lib.force_local_to_global(tables, fl, verts)
        back = np.asarray(anchor_lib.force_global_to_local(tables, fg, verts))
        _, frame = anchor_lib.anchor_points_and_frames(tables, verts)
        x_sq = np.sum(np.asarray(frame)[..., :, 0] ** 2, axis=-1)  # (32,)
        np.testing.assert_allclose(back[:, 0], np.asarray(fl)[:, 0] * x_sq,
                                   atol=1e-5)
        np.testing.assert_allclose(back[:, 1:], np.asarray(fl)[:, 1:],
                                   atol=1e-5)

    def test_load_obj_faces_triangulates(self, tmp_path):
        from vpho_tpu.models.ycb import load_obj_faces

        obj = tmp_path / "m.obj"
        obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                       "f 1/1/1 2/2/2 3/3/3 4/4/4\nf 1 2 3\n"
                       "f -4 -3 -2\n")  # spec-legal relative indices
        f = load_obj_faces(str(obj))
        np.testing.assert_array_equal(
            f, [[0, 1, 2], [0, 2, 3], [0, 1, 2], [0, 1, 2]])


class TestHeadObjectRegress:
    def test_forward_and_losses(self):
        m = HeadObjectRegress()
        v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 1024)))
        out = m.apply(v, jnp.ones((2, 1024)))
        assert out.shape == (2, 9)
        losses = object_regress_losses(
            out, jnp.zeros((2, 2048, 3)), jnp.zeros((2, 27, 3)),
            jnp.zeros((2, 9)), jnp.zeros((2, 2048, 3)), jnp.zeros((2, 27, 3)))
        assert set(losses) == {"obj_reg_vert_loss", "obj_reg_kpt_loss",
                               "obj_reg_rot6d_loss", "obj_reg_trans_loss"}


@pytest.fixture(scope="module")
def mano():
    return synthetic_mano()


@pytest.fixture(scope="module")
def registry():
    return synthetic_registry()


class TestExtraAggModes:
    def _hand_inputs(self, mano, B=2, S=4):
        key = jax.random.PRNGKey(0)
        pose = jax.random.normal(key, (B, S, 48)) * 0.2
        shape = jnp.zeros((B, S, 10))
        root = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1))
        K = jnp.tile(jnp.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]]), (B, 1, 1))
        _, joint = hand_verts_meters(mano, pose[:, 0], shape[:, 0])
        jt2d = T.project_points_batched(joint + root[:, None], K)
        bbox = jnp.concatenate([jt2d.min(1) - 5, jt2d.max(1) + 5], axis=-1)
        hm = adaptive_bbox_heatmap(jt2d, bbox, 64, 2.0)
        return dict(pose=pose, shape=shape, root_joint=root, cam_intrinsic=K,
                    heatmap=hm, bbox=bbox, pose_regression=pose[:, 0])

    @pytest.mark.parametrize("mode", ["heatmap", "2D_pt_pose", "2D_pt_joint",
                                      "average_all", "random"])
    def test_hand_modes_run(self, mano, mode):
        kw = self._hand_inputs(mano)
        # k is a static (top_k size); keep it out of the traced pytree
        out = jax.jit(lambda kw: agg.aggregate_hand(mode, mano, k=2, **kw))(kw)
        assert out["agg_joint"].shape == (2, 21, 3)
        assert np.isfinite(np.asarray(out["agg_joint"])).all()

    @pytest.mark.parametrize("mode", ["heatmap", "2D_pt_pose", "average_all", "random"])
    def test_obj_modes_run(self, registry, mode):
        B, S = 2, 4
        key = jax.random.PRNGKey(1)
        kw = dict(
            pose6d=jax.random.normal(key, (B, S, 9)) * 0.1,
            root_joint=jnp.tile(jnp.array([0.0, 0, 0.5]), (B, 1)),
            obj_ids=jnp.array([0, 5]),
            is_right=jnp.ones((B,), bool),
            cam_intrinsic=jnp.tile(jnp.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]]), (B, 1, 1)),
            heatmap=jnp.ones((B, 27, 64, 64)),
            bbox=jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1)),
        )
        out = jax.jit(lambda kw: agg.aggregate_obj(mode, registry, k=2, **kw))(kw)
        assert out["agg_6d"].shape == (B, 9)
        assert out["agg_obj_vert"].shape == (B, 2048, 3)
