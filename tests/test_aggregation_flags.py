"""Live CLI semantics of the aggregation/eval flags.

One test per flag flipping observable behavior (--do_weighted_average,
--do_physics_selection, --use_regression_as_candidate,
--aggregation_mode_hand/obj; reference args.py:233-246 — the reference parses
them but its live path hardcodes the defaults; here they are wired through
ModelConfig into forward_predict/hoi_aggregate).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.models import aggregation as agg
from vpho_tpu.models import anchor as anchor_lib
from vpho_tpu.models import vpho as V
from vpho_tpu.models.mano import synthetic_mano
from vpho_tpu.models.vpho import ModelConfig, VPHONet, forward_predict
from vpho_tpu.models.ycb import synthetic_registry
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


def _hoi_kwargs(mano, key, B=2, S=5):
    """Non-degenerate inputs: random candidates + a peaked random heatmap so
    weighted and unweighted fusions genuinely differ."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pose = jax.random.normal(k1, (B, S, 48)) * 0.2
    root = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1))
    return dict(
        cam_intrinsic=_camera(B), root_joint_flip=root, root_joint=root,
        is_right=jnp.ones((B,), bool),
        force_local=jax.random.normal(k2, (B, 32, 3)) * 0.02,
        is_grasped=jnp.ones((B,)),
        hand_pose_diff=pose,
        hand_pose_regression=jax.random.normal(k3, (B, 48)) * 0.2,
        hand_shape=jnp.zeros((B, S, 10)),
        hand_heatmap=jax.random.uniform(k4, (B, 21, 64, 64)),
        hand_bbox=jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1)),
        hand_topk=3,
        obj_pose6d=jax.random.normal(k2, (B, S, 9)) * 0.1,
        obj_heatmap=jax.random.uniform(k3, (B, 27, 64, 64)),
        obj_bbox=jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1)),
        obj_topk=2,
        obj_ids=jnp.array([0, 3])[:B],
    )


def _run_hoi(mano, registry, tables, kw, **flags):
    return agg.hoi_aggregate(mano, registry, tables, **kw, **flags)


class TestHOIFlags:
    def test_do_weighted_average_flips_output(self, mano, registry, tables):
        kw = _hoi_kwargs(mano, jax.random.PRNGKey(0))
        on = _run_hoi(mano, registry, tables, kw, is_weight=True)
        off = _run_hoi(mano, registry, tables, kw, is_weight=False)
        assert not np.allclose(np.asarray(on["obj_agg_6d"]),
                               np.asarray(off["obj_agg_6d"]))
        assert not np.allclose(np.asarray(on["hand_agg_mano"]),
                               np.asarray(off["hand_agg_mano"]))

    def test_do_physics_selection_off_returns_cascade_hand(
            self, mano, registry, tables):
        kw = _hoi_kwargs(mano, jax.random.PRNGKey(1))
        off = _run_hoi(mano, registry, tables, kw, do_physics_selection=False)
        cascade = agg.hand_heatmap_cascade(
            mano, kw["hand_pose_diff"], kw["hand_pose_regression"],
            kw["hand_shape"], kw["root_joint_flip"], kw["cam_intrinsic"],
            kw["hand_heatmap"], kw["hand_bbox"], kw["hand_topk"])
        np.testing.assert_allclose(np.asarray(off["hand_agg_mano"]),
                                   np.asarray(cascade["agg_hand_mano"]),
                                   atol=1e-6)
        on = _run_hoi(mano, registry, tables, kw, do_physics_selection=True)
        assert not np.allclose(np.asarray(on["hand_agg_mano"]),
                               np.asarray(off["hand_agg_mano"]))

    def test_use_regression_as_candidate_flips_output(
            self, mano, registry, tables):
        kw = _hoi_kwargs(mano, jax.random.PRNGKey(2))
        on = _run_hoi(mano, registry, tables, kw,
                      use_regression_as_candidate=True)
        off = _run_hoi(mano, registry, tables, kw,
                       use_regression_as_candidate=False)
        assert not np.allclose(np.asarray(on["hand_agg_mano"]),
                               np.asarray(off["hand_agg_mano"]))


class TestObjCascadeStandalone:
    def test_shapes_and_force_switch(self, mano, registry, tables):
        B, N = 2, 6
        key = jax.random.PRNGKey(3)
        pose6d = jax.random.normal(key, (B, N, 9)) * 0.1
        root = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1))
        ids = jnp.array([0, 3])
        hm = jax.random.uniform(jax.random.fold_in(key, 1), (B, 27, 64, 64))
        bbox = jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1))
        fp = jax.random.normal(jax.random.fold_in(key, 2), (B, 32, 3)) * 0.05 + root[:, None]
        fg = jax.random.normal(jax.random.fold_in(key, 3), (B, 32, 3)) * 0.02

        plain = agg.obj_heatmap_cascade(
            registry, pose6d, root, ids, jnp.ones((B,), bool), _camera(B),
            hm, bbox, k=2, force_selection=False)
        assert plain["agg_6d"].shape == (B, 9)
        assert np.isfinite(np.asarray(plain["agg_obj_vert"])).all()

        # phy_topk < k*k so the re-rank genuinely selects a subset (at
        # phy_topk >= k*k every combination is kept and the unweighted fuse
        # degenerates to the plain trans2+rot2 mean)
        forced = agg.obj_heatmap_cascade(
            registry, pose6d, root, ids, jnp.ones((B,), bool), _camera(B),
            hm, bbox, k=2, force_selection=True, force_point=fp,
            force_global=fg, is_grasped=jnp.array([1.0, 1.0]), phy_topk=2)
        assert forced["agg_6d"].shape == (B, 9)
        assert not np.allclose(np.asarray(plain["agg_6d"]),
                               np.asarray(forced["agg_6d"]))

        # ungrasped samples fall back to the heatmap rank inside the
        # force-selection branch — flipping is_grasped changes the result
        ungrasped = agg.obj_heatmap_cascade(
            registry, pose6d, root, ids, jnp.ones((B,), bool), _camera(B),
            hm, bbox, k=2, force_selection=True, force_point=fp,
            force_global=fg, is_grasped=jnp.array([0.0, 0.0]), phy_topk=2)
        assert not np.allclose(np.asarray(forced["agg_6d"]),
                               np.asarray(ungrasped["agg_6d"]))

    def test_dispatch_has_cascade(self, mano, registry, tables):
        B, N = 1, 4
        key = jax.random.PRNGKey(4)
        out = agg.aggregate_obj(
            "heatmap_cascade", registry,
            pose6d=jax.random.normal(key, (B, N, 9)) * 0.1,
            root_joint=jnp.tile(jnp.array([0.0, 0.0, 0.5]), (B, 1)),
            obj_ids=jnp.array([0]), is_right=jnp.ones((B,), bool),
            cam_intrinsic=_camera(B),
            heatmap=jax.random.uniform(key, (B, 27, 64, 64)),
            bbox=jnp.tile(jnp.array([10.0, 10, 110, 110]), (B, 1)), k=2)
        assert out["agg_6d"].shape == (B, 9)


class TestForwardPredictDispatch:
    """--aggregation_mode_hand/obj reach forward_predict as static config."""

    def test_nondefault_modes_run_and_differ(self):
        cfg = ModelConfig(sample_num=3, sampling_steps=3, topk_hand=2,
                          topk_obj=2, patch_size=64)
        ctx = V.make_context(cfg)
        model = VPHONet()
        batch = make_batch(ctx, jax.random.PRNGKey(0), batch_size=1, patch_size=64)
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            batch, False)
        rng = jax.random.PRNGKey(3)

        default = forward_predict(model, variables, ctx, batch, rng)

        alt_cfg = dataclasses.replace(
            cfg, aggregation_mode_hand="average_all",
            aggregation_mode_obj="heatmap")
        alt_ctx = ctx._replace(cfg=alt_cfg)
        alt = forward_predict(model, variables, alt_ctx, batch, rng)

        for k in ("agg_obj_6d", "agg_hand_mano", "agg_hand_vert",
                  "agg_hand_joint"):
            assert alt[k].shape == default[k].shape
            assert np.isfinite(np.asarray(alt[k])).all()
        assert not np.allclose(np.asarray(alt["agg_hand_mano"]),
                               np.asarray(default["agg_hand_mano"]))


class TestCascadeNLevel:
    def test_truncated_cascade_differs_and_matches_prefix(self, mano):
        """heatmap_cascade_n_level == the full cascade truncated
        (select_by_heatmap_cascade_n_level, aggregation.py:470-535)."""
        kw = _hoi_kwargs(mano, jax.random.PRNGKey(5))
        args = dict(pose=kw["hand_pose_diff"],
                    pose_regression=kw["hand_pose_regression"],
                    shape=kw["hand_shape"], root_joint=kw["root_joint_flip"],
                    cam_intrinsic=kw["cam_intrinsic"],
                    heatmap=kw["hand_heatmap"], bbox=kw["hand_bbox"], k=3)
        full = agg.aggregate_hand("heatmap_cascade", mano, **args)
        n2 = agg.aggregate_hand("heatmap_cascade_n_level", mano, n_level=2, **args)
        n4 = agg.aggregate_hand("heatmap_cascade_n_level", mano, n_level=4, **args)
        assert not np.allclose(np.asarray(full["agg_hand_mano"]),
                               np.asarray(n2["agg_hand_mano"]))
        np.testing.assert_allclose(np.asarray(full["agg_hand_mano"]),
                                   np.asarray(n4["agg_hand_mano"]), atol=1e-6)
        # level-0 (wrist) params agree: the prefix of the cascade is shared
        np.testing.assert_allclose(
            np.asarray(full["agg_hand_mano"][:, :3]),
            np.asarray(n2["agg_hand_mano"][:, :3]), atol=1e-6)
