"""Golden-value + property tests for the geometry core."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.utils import transforms as T


def rand(*shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape)


class TestRotations:
    def test_axis_angle_matrix_roundtrip(self):
        aa = rand(64, 3, seed=1) * 1.5
        m = T.axis_angle_to_matrix(aa)
        aa2 = T.matrix_to_axis_angle(m)
        m2 = T.axis_angle_to_matrix(aa2)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)

    def test_matrix_orthonormal(self):
        aa = rand(32, 3, seed=2)
        m = T.axis_angle_to_matrix(aa)
        eye = jnp.einsum("bij,bkj->bik", m, m)
        np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(m)), np.ones(32), atol=1e-5)

    def test_known_rotation_90z(self):
        aa = jnp.array([[0.0, 0.0, np.pi / 2]])
        m = np.asarray(T.axis_angle_to_matrix(aa))[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(m, expected, atol=1e-6)

    def test_small_angle_stable(self):
        aa = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
        m = np.asarray(T.axis_angle_to_matrix(aa))
        np.testing.assert_allclose(m, np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)
        g = jax.grad(lambda a: jnp.sum(T.axis_angle_to_matrix(a)))(jnp.zeros((1, 3)))
        assert np.isfinite(np.asarray(g)).all()

    def test_quaternion_roundtrip(self):
        aa = rand(50, 3, seed=3) * 2.0
        q = T.axis_angle_to_quaternion(aa)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), np.ones(50), atol=1e-5)
        aa2 = T.quaternion_to_axis_angle(q)
        # angles may exceed 2*pi and wrap; compare as rotations
        m1 = T.axis_angle_to_matrix(aa)
        m2 = T.axis_angle_to_matrix(aa2)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)

    def test_matrix_quaternion_roundtrip(self):
        aa = rand(50, 3, seed=4) * 2.0
        m = T.axis_angle_to_matrix(aa)
        q = T.matrix_to_quaternion(m)
        m2 = T.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)

    def test_rot6d_roundtrip(self):
        aa = rand(50, 3, seed=5)
        m = T.axis_angle_to_matrix(aa)
        d6 = T.matrix_to_rotation_6d(m)
        assert d6.shape == (50, 6)
        m2 = T.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)

    def test_rot6d_gram_schmidt_robust(self):
        d6 = rand(20, 6, seed=6) * 3.0
        m = T.rotation_6d_to_matrix(d6)
        eye = jnp.einsum("bij,bkj->bik", m, m)
        np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (20, 1, 1)), atol=1e-5)


class TestAverageQuaternion:
    def test_identity_average(self):
        q = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 5, 1))
        avg = T.average_quaternion(q)
        np.testing.assert_allclose(np.asarray(avg), np.tile([1, 0, 0, 0], (2, 1)), atol=1e-5)

    def test_sign_invariance(self):
        aa = rand(1, 3, seed=7)
        q = T.axis_angle_to_quaternion(aa)
        qs = jnp.concatenate([q, -q, q], axis=0)[None]  # (1, 3, 4)
        avg = T.average_quaternion(qs)[0]
        dot = jnp.abs(jnp.sum(avg * q[0]))
        assert float(dot) > 1 - 1e-5

    def test_weighted_average_small_perturbation(self):
        # average of two rotations about z by ±theta with equal weight == identity-ish
        aa = jnp.array([[0, 0, 0.2], [0, 0, -0.2]])
        q = T.axis_angle_to_quaternion(aa)[None]
        avg = T.average_quaternion(q, jnp.ones((1, 2)))
        aa_avg = T.quaternion_to_axis_angle(avg)
        np.testing.assert_allclose(np.asarray(aa_avg), np.zeros((1, 3)), atol=1e-5)

    def test_weights_bias_average(self):
        aa = jnp.array([[0, 0, 0.4], [0, 0, -0.4]])
        q = T.axis_angle_to_quaternion(aa)[None]
        avg = T.average_quaternion(q, jnp.array([[0.9, 0.1]]))
        ang = float(T.quaternion_to_axis_angle(avg)[0, 2])
        assert ang > 0.2

    def test_power_impl_matches_eigh(self):
        """--quat_mean_impl power: matrix-squaring subspace iteration must
        agree with eigh on realistic coherent candidate clusters (the only
        regime where a quaternion average is meaningful)."""
        rng = np.random.RandomState(3)
        base = rng.randn(200, 4)
        base /= np.linalg.norm(base, axis=-1, keepdims=True)
        qs = base[:, None] + 0.15 * rng.randn(200, 30, 4)
        qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
        Q = jnp.asarray(qs, jnp.float32)
        W = jnp.asarray(rng.rand(200, 30).astype(np.float32) + 0.1)
        for weights in (None, W):
            a_e = np.asarray(T.average_quaternion(Q, weights, impl="eigh"))
            a_p = np.asarray(T.average_quaternion(Q, weights, impl="power"))
            # compare as rotations (sign already canonicalized by the api)
            dots = np.abs((a_e * a_p).sum(-1))
            assert dots.min() > 1 - 1e-5, dots.min()

    def test_power_impl_degenerate_spread(self):
        """Antipodal/orthogonal candidates (no spectral gap to speak of):
        the power impl must still return a unit quaternion, not NaN."""
        q = jnp.asarray(np.stack([np.eye(4)[i] for i in range(4)])[None],
                        jnp.float32)  # (1, 4, 4) orthonormal spread
        avg = np.asarray(T.average_quaternion(q, impl="power"))
        assert np.isfinite(avg).all()
        np.testing.assert_allclose(np.linalg.norm(avg, axis=-1), 1.0, atol=1e-4)


class TestProjection:
    def test_project_simple_pinhole(self):
        K = jnp.array([[[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]]])
        pt = jnp.array([[[0.1, 0.2, 1.0]]])
        uv = np.asarray(T.project_pt3d_to_pt2d(pt, K))
        np.testing.assert_allclose(uv[0, 0], [60.0, 60.0], atol=1e-5)

    def test_batched_projection_matches(self):
        K = jnp.tile(jnp.array([[120.0, 0, 64], [0, 110.0, 60], [0, 0, 1]]), (4, 1, 1))
        pt = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 21, 3)) * 0.1
        pt = pt.at[..., 2].add(1.0)
        a = T.project_points_batched(pt, K)
        # matmul broadcast: K gets ONE extra batch dim to align with (B, 7)
        b = T.project_pt3d_to_pt2d(pt, K[:, None])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_inverse_project_roundtrip(self):
        K = jnp.array([[150.0, 0, 64], [0, 150.0, 64], [0, 0, 1]])
        xyz = jnp.array([[0.05, -0.03, 0.6], [0.2, 0.1, 1.1]])
        uv = T.project_pt3d_to_pt2d(xyz, K)
        uvd = jnp.concatenate([uv, xyz[:, 2:]], axis=-1)
        xyz2 = T.inverse_project_uvd_to_xyz(uvd, K)
        np.testing.assert_allclose(np.asarray(xyz), np.asarray(xyz2), atol=1e-5)


class TestRigidAlign:
    def test_recovers_similarity_transform(self):
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (30, 3))
        R = T.axis_angle_to_matrix(jnp.array([0.3, -0.5, 0.9]))
        B = 1.7 * (A @ R.T) + jnp.array([0.1, -2.0, 0.5])
        A2 = T.rigid_align(A, B)
        np.testing.assert_allclose(np.asarray(A2), np.asarray(B), atol=1e-4)

    def test_reflection_guard(self):
        key = jax.random.PRNGKey(1)
        A = jax.random.normal(key, (25, 3))
        B = A * jnp.array([-1.0, 1.0, 1.0])  # mirrored target
        A2 = T.rigid_align(A, B)
        # result must be a proper rotation fit (residual nonzero but finite)
        assert np.isfinite(np.asarray(A2)).all()


class TestManoPack:
    def test_aa_6d_roundtrip(self):
        params = rand(8, 58, seed=9)
        d6 = T.mano_aa_to_6d(params)
        assert d6.shape == (8, 106)
        back = T.mano_6d_to_aa(d6)
        # shape passthrough exact; pose via rotation roundtrip
        np.testing.assert_allclose(np.asarray(params[..., 48:]), np.asarray(back[..., 48:]), atol=1e-6)
        m1 = T.axis_angle_to_matrix(params[..., :48].reshape(8, 16, 3))
        m2 = T.axis_angle_to_matrix(back[..., :48].reshape(8, 16, 3))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-4)


class TestFlip:
    def test_flip_point3d(self):
        pt = rand(4, 5, 3, seed=10)
        is_flip = jnp.array([True, False, True, False])
        out = T.flip_point3d(pt, is_flip)
        np.testing.assert_allclose(np.asarray(out[0, :, 0]), -np.asarray(pt[0, :, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(pt[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[..., 1:]), np.asarray(pt[..., 1:]), atol=1e-6)


class TestRTCompose:
    def test_matmul_for_rt(self):
        aa1, aa2 = rand(5, 3, seed=11), rand(5, 3, seed=12)
        t1, t2 = rand(5, 3, seed=13), rand(5, 3, seed=14)
        R1, R2 = T.axis_angle_to_matrix(aa1), T.axis_angle_to_matrix(aa2)
        T1 = jnp.concatenate([R1, t1[..., None]], axis=-1)
        T2 = jnp.concatenate([R2, t2[..., None]], axis=-1)
        out = T.matmul_for_rt(T1, T2)
        # verify by applying to points
        pts = rand(5, 10, 3, seed=15)
        direct = jnp.einsum("bij,bnj->bni", out[..., :3, :3], pts) + out[..., None, :3, 3]
        two_step = jnp.einsum("bij,bnj->bni", R2, pts) + t2[:, None]
        two_step = jnp.einsum("bij,bnj->bni", R1, two_step) + t1[:, None]
        np.testing.assert_allclose(np.asarray(direct), np.asarray(two_step), atol=1e-5)

    def test_obj_9d_mat_roundtrip(self):
        pose = rand(6, 9, seed=16)
        rt = T.obj_9d_to_mat(pose)
        back = T.obj_mat_to_9d(rt)
        rt2 = T.obj_9d_to_mat(back)
        np.testing.assert_allclose(np.asarray(rt), np.asarray(rt2), atol=1e-5)


class TestSingularGradients:
    """NaN-safe gradients at rotation-conversion singularities.

    Found during r3 convergence training: near-identity f32 rotation
    matrices cancel exactly in (m21-m12, ...), giving an exactly-zero
    quaternion imaginary part whose norm has a NaN gradient; reverse-mode
    0-cotangent x inf-local-grad then poisons EVERY co-computed loss
    through the shared trunk (train diverged to NaN at step ~8).
    """

    def test_matrix_to_axis_angle_grad_finite_at_identity(self):
        def f(m):
            return jnp.sum(T.matrix_to_axis_angle(m) ** 2)

        g = jax.grad(f)(jnp.eye(3))
        assert np.all(np.isfinite(np.asarray(g)))

        # near-identity with exactly symmetric off-diagonals (the observed
        # failure shape) and an exact 180-degree rotation
        m = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
        g = jax.grad(f)(m)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_6d_to_aa_pipeline_grad_finite(self):
        ident6d = jnp.array([1.0, 0, 0, 0, 1.0, 0])

        def f(d6):
            return jnp.sum(T.matrix_to_axis_angle(T.rotation_6d_to_matrix(d6)))

        g = jax.grad(f)(ident6d)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_normalize_grad_finite_at_zero(self):
        g = jax.grad(lambda v: jnp.sum(T.normalize(v) ** 2))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_safe_sqrt_values_and_grads(self):
        x = jnp.array([-1.0, 0.0, 1e-12, 4.0])
        np.testing.assert_allclose(np.asarray(T.safe_sqrt(x)),
                                   np.sqrt(np.maximum(np.asarray(x), 0)))
        g = jax.vmap(jax.grad(T.safe_sqrt))(x)
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(float(g[3]), 0.25)

    def test_physics_losses_grad_finite_at_balance(self):
        """Zero resultant force / zero net torque is the OPTIMUM of the
        balance losses — its gradient must be 0, not NaN."""
        from vpho_tpu.models.heads import physics_losses

        B = 2
        gt_fp = jnp.zeros((B, 32, 3))
        gt_com = jnp.zeros((B, 1, 3))
        gravity = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (B, 1, 1))

        def f(pf):
            # forces exactly cancel gravity -> resultant exactly 0
            losses = physics_losses(gt_fp, pf, gt_com, jnp.zeros((B, 32, 3)),
                                    jnp.zeros((B, 32, 3)), pf[..., :3] * 0,
                                    gravity, jnp.ones((B,)))
            return losses["force_loss"] + losses["torque_loss"]

        pf = jnp.zeros((B, 32, 3)).at[:, 0, 1].set(-1.0)
        g = jax.grad(f)(pf)
        assert np.all(np.isfinite(np.asarray(g)))
