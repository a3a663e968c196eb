"""Tests for the jitted pseudo-force inner optimization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.engine.force_optim import optimize_forces, ForceOptimizer, _losses
from vpho_tpu.models import anchor as anchor_lib
from vpho_tpu.models.mano import hand_verts_meters, synthetic_mano


@pytest.fixture(scope="module")
def setup():
    mano = synthetic_mano()
    tables = anchor_lib.load_anchor_tables(mano)
    B = 2
    pose = jax.random.normal(jax.random.PRNGKey(0), (B, 48)) * 0.2
    vert, _ = hand_verts_meters(mano, pose, jnp.zeros((B, 10)))
    contact = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (B, 32))) * 0.5
    gravity = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (B, 1))[:, None]
    com = vert.mean(1, keepdims=True) + jnp.array([0.0, 0.0, 0.02])
    return tables, vert, contact, gravity, com


class TestOptimizeForcesSmall:
    def test_improves_force_balance(self, setup):
        tables, vert, contact, gravity, com = setup
        # short run: 10 phase-1 + 40 phase-2 iterations
        out = optimize_forces(contact, vert, gravity, com, tables,
                              iters_phase1=10, iters_total=50)
        assert out["force_local"].shape == (2, 32, 3)
        for v in out["losses"].values():
            assert np.isfinite(float(v))

        # initial losses (scale 0.05, weight 0) for comparison
        mask = (contact > 0.1).astype(jnp.float32)
        f0, g0, m0, d0, _ = _losses(
            jnp.full((2, 32), 0.05), jnp.zeros((2, 32, 8)), mask,
            contact, vert, gravity, com, tables)
        assert float(out["losses"]["force"]) < float(f0)

    def test_longer_run_improves_more(self, setup):
        tables, vert, contact, gravity, com = setup
        short = optimize_forces(contact, vert, gravity, com, tables, 5, 20)
        longer = optimize_forces(contact, vert, gravity, com, tables, 20, 120)
        assert float(longer["losses"]["force"]) <= float(short["losses"]["force"]) * 1.5

    def test_contact_mask_zeroes_forces(self, setup):
        tables, vert, _, gravity, com = setup
        contact = jnp.zeros((2, 32))  # no contact anywhere
        out = optimize_forces(contact, vert, gravity, com, tables, 5, 15)
        np.testing.assert_allclose(np.asarray(out["force_local"]), 0.0, atol=1e-7)


class TestForceOptimizerRunner:
    def test_run_batch_flip_and_ungrasped_zeroing(self, setup):
        tables, vert, contact, gravity, com = setup
        opt = ForceOptimizer.__new__(ForceOptimizer)
        opt.tables = tables
        opt.cfg = None
        opt.registry = None
        batch = {
            "force_contact": np.asarray(contact),
            "gt_hand_vert_flip": np.asarray(vert),
            "gravity": np.asarray(gravity),
            "obj_CoM": np.asarray(com),
            "is_right": np.array([True, False]),
            "is_grasped": np.array([1.0, 0.0]),
        }
        # monkeypatch iteration counts for speed
        import vpho_tpu.engine.force_optim as FO

        orig = FO.optimize_forces
        FO.optimize_forces = lambda *a, **k: orig(*a, iters_phase1=3, iters_total=10)
        try:
            out = opt.run_batch(batch)
        finally:
            FO.optimize_forces = orig
        assert out["force_local"].shape == (2, 32, 3)
        # ungrasped sample zeroed (force_optimization.py:189-192)
        np.testing.assert_allclose(out["force_local"][1], 0.0, atol=1e-7)
        assert np.abs(out["force_local"][0]).max() > 0

    def test_save_force_paths(self, tmp_path, setup):
        res = {"force_local": np.zeros((1, 32, 3)), "force_global": np.zeros((1, 32, 3))}
        p = str(tmp_path / "DexYCB" / "seq" / "cam" / "color_000001.jpg")
        ForceOptimizer.save_force(res, [p], "dexycb")
        expect = str(tmp_path / "DexYCB" / "cache" / "hand_force" / "seq" / "cam"
                     / "hand_force_000001.pkl")
        import os
        assert os.path.exists(expect)
