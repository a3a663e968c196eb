"""Structural/behavioral tests for the pure-JAX MANO layer (synthetic fixture)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.models import mano as M
from vpho_tpu.utils import transforms as T


@pytest.fixture(scope="module")
def model():
    return M.synthetic_mano(seed=0)


class TestManoFK:
    def test_shapes(self, model):
        pose = jnp.zeros((4, 48))
        shape = jnp.zeros((4, 10))
        verts, joints = M.mano_fk(model, pose, shape)
        assert verts.shape == (4, 778, 3)
        assert joints.shape == (4, 21, 3)

    def test_wrist_centered(self, model):
        pose = jax.random.normal(jax.random.PRNGKey(0), (4, 48)) * 0.3
        shape = jax.random.normal(jax.random.PRNGKey(1), (4, 10)) * 0.5
        _, joints = M.mano_fk(model, pose, shape)
        np.testing.assert_allclose(np.asarray(joints[:, 0]), np.zeros((4, 3)), atol=1e-4)

    def test_zero_pose_matches_rest(self, model):
        """Zero pose, zero shape => verts equal shifted template (no pose blend)."""
        verts, _ = M.mano_fk(model, jnp.zeros((1, 48)), jnp.zeros((1, 10)))
        j0 = np.asarray(model.J_regressor @ model.v_template)[0]
        expected = (np.asarray(model.v_template) - j0) * 1000.0
        np.testing.assert_allclose(np.asarray(verts[0]), expected, atol=5e-3)  # mm

    def test_global_rotation_equivariance(self, model):
        """Rotating the root rotates the (wrist-centered) output rigidly."""
        pose = jax.random.normal(jax.random.PRNGKey(2), (1, 48)) * 0.2
        rot = jnp.array([[0.4, -0.2, 0.7]])
        pose_rotated = pose.at[:, :3].set(
            T.matrix_to_axis_angle(
                T.axis_angle_to_matrix(rot) @ T.axis_angle_to_matrix(pose[:, :3])
            )
        )
        shape = jnp.zeros((1, 10))
        v1, j1 = M.mano_fk(model, pose, shape)
        v2, j2 = M.mano_fk(model, pose_rotated, shape)
        R = np.asarray(T.axis_angle_to_matrix(rot))[0]
        np.testing.assert_allclose(np.asarray(v2[0]), np.asarray(v1[0]) @ R.T, atol=1e-2)
        np.testing.assert_allclose(np.asarray(j2[0]), np.asarray(j1[0]) @ R.T, atol=1e-2)

    def test_shape_blend_changes_geometry(self, model):
        v1, _ = M.mano_fk(model, jnp.zeros((1, 48)), jnp.zeros((1, 10)))
        v2, _ = M.mano_fk(model, jnp.zeros((1, 48)), jnp.ones((1, 10)))
        assert float(jnp.abs(v1 - v2).max()) > 0.1  # mm

    def test_finger_pose_localized(self, model):
        """Posing one finger joint must not move the wrist-side palm verts much."""
        pose = jnp.zeros((1, 48))
        # bend the index proximal joint (MANO joint 1 => params 3:6)
        pose_bent = pose.at[0, 3:6].set(jnp.array([0.0, 0.0, 1.2]))
        shape = jnp.zeros((1, 10))
        v1, _ = M.mano_fk(model, pose, shape)
        v2, _ = M.mano_fk(model, pose_bent, shape)
        diff = np.linalg.norm(np.asarray(v2 - v1), axis=-1)[0]
        w = np.asarray(model.weights)
        palm_dominated = w[:, 0] > 0.95
        assert diff[palm_dominated].mean() < diff.mean()

    def test_meters_wrapper_and_leading_dims(self, model):
        pose = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 48)) * 0.2
        shape = jnp.zeros((2, 5, 10))
        v, j = M.hand_verts_meters(model, pose, shape)
        assert v.shape == (2, 5, 778, 3)
        assert j.shape == (2, 5, 21, 3)
        v_flat, _ = M.mano_fk(model, pose.reshape(-1, 48), shape.reshape(-1, 10))
        np.testing.assert_allclose(
            np.asarray(v.reshape(-1, 778, 3)), np.asarray(v_flat) / 1000.0, atol=1e-6
        )

    def test_jit_and_vmap(self, model):
        fk = jax.jit(lambda p, s: M.mano_fk(model, p, s))
        pose = jax.random.normal(jax.random.PRNGKey(4), (3, 48)) * 0.1
        shape = jnp.zeros((3, 10))
        v1, j1 = fk(pose, shape)
        v2, j2 = M.mano_fk(model, pose, shape)
        # jit fusion reorders f32 reductions; synthetic verts are O(100), so
        # tolerate relative rounding (observed max rel diff ~3e-7)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=2e-6, atol=1e-5)

    def test_grad_flows(self, model):
        def loss(pose):
            v, j = M.mano_fk(model, pose, jnp.zeros((1, 10)))
            return jnp.sum(v**2)

        g = jax.grad(loss)(jnp.ones((1, 48)) * 0.1)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestPCA:
    def test_pca_to_aa_shape(self, model):
        pca = jax.random.normal(jax.random.PRNGKey(5), (4, 45))
        aa = M.pca_to_axis_angle(model, pca)
        assert aa.shape == (4, 45)

    def test_loader_fallback(self):
        m = M.load_mano(mano_root="/nonexistent", side="right")
        assert m.v_template.shape == (778, 3)


class TestJointsOnlyFK:
    def test_matches_full_fk(self):
        from vpho_tpu.models.mano import (hand_joints_meters, hand_verts_meters,
                                          mano_fk, mano_fk_joints, synthetic_mano)
        import jax, jax.numpy as jnp, numpy as np

        model = synthetic_mano()
        pose = jax.random.normal(jax.random.PRNGKey(11), (6, 48)) * 0.4
        shape = jax.random.normal(jax.random.PRNGKey(12), (6, 10)) * 0.5
        _, j_full = mano_fk(model, pose, shape)
        j_fast = mano_fk_joints(model, pose, shape)
        np.testing.assert_allclose(np.asarray(j_full), np.asarray(j_fast), atol=1e-3)

        _, jm = hand_verts_meters(model, pose, shape)
        jm2 = hand_joints_meters(model, pose, shape)
        np.testing.assert_allclose(np.asarray(jm), np.asarray(jm2), atol=1e-5)
