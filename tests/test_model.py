"""End-to-end smoke tests: init, trunk, train forward (grads), predict path.

Tiny shapes throughout (B=2, 64px crops, S=4 hypotheses, 5 ODE steps) so the
whole model graph compiles and runs on the CPU test mesh in reasonable time.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.data.fixtures import make_batch
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import ModelConfig, VPHONet, forward_predict, forward_train


@pytest.fixture(scope="module")
def ctx():
    cfg = ModelConfig(sample_num=4, sampling_steps=5, topk_hand=3, topk_obj=2,
                      repeat_num=2, patch_size=64)
    return V.make_context(cfg)


@pytest.fixture(scope="module")
def model_and_vars(ctx):
    model = VPHONet()
    batch = make_batch(ctx, jax.random.PRNGKey(0), batch_size=2, patch_size=64)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch, False,
    )
    return model, variables


class TestInit:
    def test_param_collections(self, model_and_vars):
        _, variables = model_and_vars
        assert "params" in variables and "batch_stats" in variables
        assert "buffers" in variables  # frozen fourier features
        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        # dual-stream resnet50 FPN dominates; sanity range ~40M-120M
        assert 30e6 < n_params < 150e6, n_params

    def test_zero_init_denoiser_final(self, model_and_vars):
        _, variables = model_and_vars
        p = variables["params"]["denoiser_hand"]["bank"]
        assert float(jnp.abs(p["kernel2"]).max()) == 0.0


class TestTrunk:
    def test_shapes(self, ctx, model_and_vars):
        model, variables = model_and_vars
        batch = make_batch(ctx, jax.random.PRNGKey(3), 2, 64)
        trunk = jax.jit(lambda v, b: model.apply(v, b, False, method=VPHONet.trunk))
        out = trunk(variables, batch)
        assert out["encoding_hand"].shape == (2, 1024)
        assert out["encoding_obj"].shape == (2, 1024)
        assert out["pd_hm_hand"].shape == (2, 21, 64, 64)
        assert out["pd_hm_obj"].shape == (2, 27, 64, 64)
        assert out["pd_mano_pose"].shape == (2, 48)
        assert out["pd_mano_shape"].shape == (2, 10)
        assert out["pd_phy"]["force_local"].shape == (2, 32, 3)
        assert out["pd_phy"]["CoM"].shape == (2, 32, 3)
        assert all(np.isfinite(np.asarray(v)).all()
                   for v in jax.tree.leaves(out))

    def test_bf16_policy_accuracy_band(self, ctx, model_and_vars):
        """The --compute_dtype bfloat16 policy runs the conv trunk AND the
        roi_align feature contraction in bf16 (params stay f32).  Pin a
        measured accuracy band vs the f32 trunk on the same weights so a
        precision regression on this path (e.g. an op silently moving to a
        wider accumulation-free form) fails loudly.  Measured 2026-08-20
        (random init, eval BN, B=2/64px): encoding rel-err ~2e-2, heatmap
        abs-err ~2e-2 on O(1) activations — bf16 rounding scale, far below
        the trunk's own signal."""
        model_f32, variables = model_and_vars
        model_bf16 = VPHONet(compute_dtype=jnp.bfloat16)
        batch = make_batch(ctx, jax.random.PRNGKey(9), 2, 64)
        out32 = jax.jit(lambda v, b: model_f32.apply(
            v, b, False, method=VPHONet.trunk))(variables, batch)
        out16 = jax.jit(lambda v, b: model_bf16.apply(
            v, b, False, method=VPHONet.trunk))(variables, batch)
        for key in ("encoding_hand", "encoding_obj"):
            a, b = np.asarray(out32[key]), np.asarray(out16[key])
            scale = np.abs(a).max()
            assert scale > 0.0
            rel = np.abs(a - b).max() / scale
            assert rel < 0.08, (key, rel)
        for key in ("pd_hm_hand", "pd_hm_obj"):
            a, b = np.asarray(out32[key]), np.asarray(out16[key])
            scale = max(np.abs(a).max(), 1e-3)
            rel = np.abs(a - b).max() / scale
            assert rel < 0.08, (key, rel)
        # regression outputs (mano pose/shape) ride the same features
        for key in ("pd_mano_pose", "pd_mano_shape"):
            a, b = np.asarray(out32[key]), np.asarray(out16[key])
            scale = max(np.abs(a).max(), 1e-3)
            rel = np.abs(a - b).max() / scale
            assert rel < 0.08, (key, rel)


class TestTrain:
    def test_loss_and_grads(self, ctx, model_and_vars):
        model, variables = model_and_vars
        batch = make_batch(ctx, jax.random.PRNGKey(4), 2, 64)

        def loss_fn(params):
            vs = dict(variables, params=params)
            total, loss_dt, _ = forward_train(model, vs, ctx, batch, jax.random.PRNGKey(5))
            return total, loss_dt

        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        (total, loss_dt), grads = grad_fn(variables["params"])
        assert np.isfinite(float(total))
        expected_keys = {
            "diff_hand_loss", "diff_obj_loss", "hm_hand_loss", "hm_obj_loss",
            "vert_loss", "joint_loss", "mano_pose_loss", "mano_shape_loss",
            "force_loss", "gravity_loss", "torque_loss", "supervised_loss",
            "CoM_loss", "total_loss",
        }
        assert expected_keys <= set(loss_dt.keys())
        for k, v in loss_dt.items():
            assert np.isfinite(float(v)), k
        gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
        assert np.isfinite(gmax) and gmax > 0

    def test_batch_stats_updated(self, ctx, model_and_vars):
        model, variables = model_and_vars
        batch = make_batch(ctx, jax.random.PRNGKey(6), 2, 64)
        step = jax.jit(lambda v, b, r: forward_train(model, v, ctx, b, r))
        _, _, mutated = step(variables, batch, jax.random.PRNGKey(7))
        old = jax.tree.leaves(variables["batch_stats"])
        new = jax.tree.leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )
        assert changed


class TestPredict:
    def test_full_predict_pipeline(self, ctx, model_and_vars):
        model, variables = model_and_vars
        batch = make_batch(ctx, jax.random.PRNGKey(8), 2, 64)
        predict = jax.jit(lambda v, b, r: forward_predict(model, v, ctx, b, r))
        pd = predict(variables, batch, jax.random.PRNGKey(9))
        S = ctx.cfg.sample_num
        assert pd["reg_hand_vert"].shape == (2, 778, 3)
        assert pd["reg_hand_joint"].shape == (2, 21, 3)
        assert pd["diff_final_hand_mano"].shape == (2, S, 58)
        assert pd["diff_final_hand_vert"].shape == (2, S, 778, 3)
        assert pd["diff_final_obj_6d"].shape == (2, S, 9)
        assert pd["agg_obj_6d"].shape == (2, 9)
        assert pd["agg_hand_mano"].shape == (2, 58)
        assert pd["agg_hand_vert"].shape == (2, 778, 3)
        assert pd["agg_hand_joint"].shape == (2, 21, 3)
        for k, v in pd.items():
            assert np.isfinite(np.asarray(v)).all(), k

    def test_predict_jittable(self, ctx, model_and_vars):
        model, variables = model_and_vars
        batch = make_batch(ctx, jax.random.PRNGKey(10), 2, 64)
        fn = jax.jit(lambda v, b, r: forward_predict(model, v, ctx, b, r)["agg_hand_vert"])
        out = fn(variables, batch, jax.random.PRNGKey(11))
        assert out.shape == (2, 778, 3)
