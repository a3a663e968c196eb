"""Golden tests for the metric criteria against hand-computed references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.engine import metrics as M
from vpho_tpu.engine.tester import TesterHand, TesterObject
from vpho_tpu.models.ycb import synthetic_registry
from vpho_tpu.utils import transforms as T


@pytest.fixture(scope="module")
def registry():
    return synthetic_registry()


def _rt(aa, t):
    R = T.axis_angle_to_matrix(jnp.asarray(aa, jnp.float32))
    return jnp.concatenate([R, jnp.asarray(t, jnp.float32)[..., None]], axis=-1)


class TestHandMetrics:
    def test_identical_zero(self):
        j = jax.random.normal(jax.random.PRNGKey(0), (3, 21, 3)) * 0.1
        v = jax.random.normal(jax.random.PRNGKey(1), (3, 778, 3)) * 0.1
        out = M.hand_metrics(j, j, v, v)
        for k in ("MJE", "PA_MJE", "MVE", "PAMVE"):
            np.testing.assert_allclose(np.asarray(out[k]), 0.0, atol=1e-5)

    def test_translation_offset(self):
        j = jax.random.normal(jax.random.PRNGKey(0), (2, 21, 3)) * 0.1
        v = jax.random.normal(jax.random.PRNGKey(1), (2, 778, 3)) * 0.1
        off = jnp.array([0.01, 0.0, 0.0])
        out = M.hand_metrics(j, j + off, v, v + off)
        np.testing.assert_allclose(np.asarray(out["MJE"]), 0.01, atol=1e-5)
        # PA-MJE removes the rigid offset
        np.testing.assert_allclose(np.asarray(out["PA_MJE"]), 0.0, atol=1e-4)

    def test_per_joint(self):
        j = jnp.zeros((1, 21, 3))
        pd = j.at[0, 5, 0].set(0.02)
        out = M.hand_metrics(j, pd, jnp.zeros((1, 778, 3)), jnp.zeros((1, 778, 3)))
        je = np.asarray(out["JE"])[0]
        assert abs(je[5] - 0.02) < 1e-6 and je[0] == 0


class TestObjectMetrics:
    def test_identity_zero(self, registry):
        ids = jnp.array([0, 4, 10])
        rt = jnp.tile(jnp.eye(3, 4), (3, 1, 1)).at[:, 2, 3].add(0.6)
        K = jnp.tile(jnp.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]]), (3, 1, 1))
        out = M.object_metrics(registry, rt, rt, ids, K)
        for k in ("MCE", "MCE2", "OCE", "ADD", "ADDS", "REP", "CD"):
            np.testing.assert_allclose(np.asarray(out[k]), 0.0, atol=1e-4)
        for k in ("ADD01d", "ADDS01d", "REP5"):
            np.testing.assert_allclose(np.asarray(out[k]), 1.0)
        for k in M.FSCORE_KEYS:
            np.testing.assert_allclose(np.asarray(out[k]), 1.0, atol=1e-5)

    def test_translation_add(self, registry):
        ids = jnp.array([2])
        gt = jnp.tile(jnp.eye(3, 4), (1, 1, 1)).at[:, 2, 3].add(0.6)
        pd = gt.at[:, 0, 3].add(0.005)
        K = jnp.tile(jnp.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]]), (1, 1, 1))
        out = M.object_metrics(registry, pd, gt, ids, K)
        np.testing.assert_allclose(np.asarray(out["ADD"]), 0.005, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["OCE"]), 0.005, atol=1e-5)
        assert float(out["ADDS"][0]) <= 0.005 + 1e-6  # symmetric distance <= ADD

    def test_adds_rotation_symmetric_smaller_than_add(self, registry):
        """A rotated symmetric-ish cloud: ADD-S must be < ADD."""
        ids = jnp.array([0])
        gt = jnp.tile(jnp.eye(3, 4), (1, 1, 1)).at[:, 2, 3].add(0.6)
        pd_rot = _rt(jnp.array([[0, 0, 0.5]]), jnp.array([[0, 0, 0.6]]))
        K = jnp.tile(jnp.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]]), (1, 1, 1))
        out = M.object_metrics(registry, pd_rot, gt, ids, K)
        assert float(out["ADDS"][0]) < float(out["ADD"][0])

    def test_matches_numpy_reference_add(self, registry):
        """ADD/MCE vs direct numpy recomputation of the reference formulas."""
        ids = jnp.array([7])
        rng = np.random.RandomState(0)
        aa = rng.randn(3) * 0.2
        gt = _rt(jnp.asarray(aa[None]), jnp.array([[0.01, -0.02, 0.65]]))
        pd = _rt(jnp.asarray((aa + 0.05)[None]), jnp.array([[0.013, -0.021, 0.655]]))
        K = jnp.tile(jnp.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]]), (1, 1, 1))
        out = M.object_metrics(registry, pd, gt, ids, K)

        verts = np.asarray(registry.verts_sampled[7])
        pdn, gtn = np.asarray(pd[0]), np.asarray(gt[0])
        pv = verts @ pdn[:, :3].T + pdn[:, 3]
        gv = verts @ gtn[:, :3].T + gtn[:, 3]
        add_np = np.linalg.norm(pv - gv, axis=-1).mean()
        np.testing.assert_allclose(float(out["ADD"][0]), add_np, rtol=1e-4)

        bbox8 = np.asarray(registry.kpt3d[7])[np.asarray(M.BBOX8_IN_KPT27)]
        mce_np = np.linalg.norm(
            (bbox8 @ pdn[:, :3].T + pdn[:, 3]) - (bbox8 @ gtn[:, :3].T + gtn[:, 3]),
            axis=-1).mean()
        np.testing.assert_allclose(float(out["MCE"][0]), mce_np, rtol=1e-4)


class TestTesters:
    def test_tester_hand_splits(self):
        t = TesterHand()
        j = np.zeros((4, 21, 3), np.float32)
        v = np.zeros((4, 778, 3), np.float32)
        pd_j = j + np.array([0.01, 0, 0], np.float32)
        t.add_batch(j, pd_j, v, v, np.array([True, True, False, False]))
        res = t.result()
        assert abs(res["MJE"]["both"] - 0.01) < 1e-6
        assert abs(res["MJE"]["right"] - 0.01) < 1e-6
        assert "MJE_20" in res
        rep = t.report_mm()
        assert rep["MJE"]["both"] == "10.00"

    def test_tester_object_class_breakdown(self, registry):
        t = TesterObject(registry)
        ids = np.array([0, 1, 18])  # 18 == 051_large_clamp (excluded)
        rt = np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1))
        rt[:, 2, 3] += 0.6
        K = np.tile(np.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]],
                             np.float32), (3, 1, 1))
        t.add_batch(rt, rt, ids, K)
        res = t.result()
        assert "051_large_clamp" not in res["ADD"]
        assert "002_master_chef_can" in res["ADD"]
        assert res["ADD"]["average_instance"] == 0.0
        rep = t.report()
        assert rep["ADD"]["average_instance"] == 0.0

    def test_tester_valid_mask(self, registry):
        t = TesterHand()
        j = np.zeros((4, 21, 3), np.float32)
        v = np.zeros((4, 778, 3), np.float32)
        pd = j.copy()
        pd[2:] += 1.0  # padded garbage
        valid = np.array([True, True, False, False])
        t.add_batch(j, pd, v, v, np.ones(4, bool), valid=valid)
        assert abs(t.result()["MJE"]["both"]) < 1e-6


class TestSMCE:
    def test_identity_fallback_equals_mce(self, registry):
        """Without the BOP asset, SMCE reduces to MCE exactly."""
        from vpho_tpu.engine.metrics import load_bop_symmetries, smce

        R, t = load_bop_symmetries(path="/nonexistent.json")
        assert R.shape == (21, 1, 3, 3)
        ids = jnp.array([0, 3])
        gt = jnp.tile(jnp.eye(3, 4), (2, 1, 1)).at[:, 2, 3].add(0.6)
        pd = gt.at[:, 0, 3].add(0.01)
        K = jnp.tile(jnp.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]]), (2, 1, 1))
        out = M.object_metrics(registry, pd, gt, ids, K)
        s = smce(registry, R, t, pd, gt, ids)
        np.testing.assert_allclose(np.asarray(s), np.asarray(out["MCE"]), atol=1e-6)

    def test_symmetry_reduces_error(self, registry):
        """With a 180-deg z symmetry in the bank, a 180-deg-rotated prediction
        scores (near) zero SMCE while MCE is large."""
        from vpho_tpu.engine.metrics import smce
        from vpho_tpu.utils import transforms as T

        ids = jnp.array([0])
        gt = jnp.tile(jnp.eye(3, 4), (1, 1, 1)).at[:, 2, 3].add(0.6)
        Rz = np.array([[-1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])
        pd = jnp.asarray(np.concatenate([Rz, [[0], [0], [0.6]]], axis=1))[None]
        sym_R = np.tile(np.eye(3), (21, 2, 1, 1))
        sym_R[:, 1] = Rz
        sym_t = np.zeros((21, 2, 3))
        s = smce(registry, sym_R, sym_t, pd, gt, ids)
        K = jnp.tile(jnp.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]]), (1, 1, 1))
        out = M.object_metrics(registry, pd, gt, ids, K)
        assert float(s[0]) < 1e-5
        assert float(out["MCE"][0]) > 0.01
