"""Native C++ host kernels vs their numpy references."""
import numpy as np
import pytest

from vpho_tpu import native


@pytest.fixture(scope="module", autouse=True)
def ensure_loaded():
    native._load()


class TestFPS:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        verts = rng.randn(500, 3).astype(np.float32)
        k = 64
        got = native.farthest_point_sampling(verts, k)
        # numpy reference
        chosen = np.empty(k, np.int64)
        chosen[0] = 0
        d2 = ((verts - verts[0]) ** 2).sum(-1)
        for i in range(1, k):
            idx = int(d2.argmax())
            chosen[i] = idx
            d2 = np.minimum(d2, ((verts - verts[idx]) ** 2).sum(-1))
        np.testing.assert_array_equal(got, chosen)

    def test_small_cloud_identity(self):
        verts = np.random.RandomState(1).randn(10, 3).astype(np.float32)
        got = native.farthest_point_sampling(verts, 20)
        np.testing.assert_array_equal(got, np.arange(10))

    def test_spread(self):
        """FPS picks well-spread points: min pairwise distance of the sample
        should far exceed that of a random subset."""
        rng = np.random.RandomState(2)
        verts = rng.rand(2000, 3).astype(np.float32)
        idx = native.farthest_point_sampling(verts, 32)
        sel = verts[idx]
        d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
        d[np.eye(32, dtype=bool)] = np.inf
        rand = verts[rng.choice(2000, 32, replace=False)]
        dr = np.linalg.norm(rand[:, None] - rand[None], axis=-1)
        dr[np.eye(32, dtype=bool)] = np.inf
        assert d.min() > dr.min()


class TestMinDist:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(3)
        a = rng.randn(100, 3).astype(np.float32)
        b = rng.randn(300, 3).astype(np.float32)
        dist, idx = native.min_dist(a, b)
        d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(dist, np.sqrt(d2.min(-1)), atol=1e-5)
        np.testing.assert_array_equal(idx, d2.argmin(-1))


class TestStamp:
    def test_matches_jax_generator(self):
        import jax.numpy as jnp

        from vpho_tpu.ops.heatmap import gaussian_heatmap

        pts = np.array([[10.3, 20.7], [0.0, 0.0], [63.0, 63.0], [-5.0, 10.0]],
                       np.float32)
        got = native.stamp_heatmaps(pts, 64, 2.0)
        ref = np.asarray(gaussian_heatmap(jnp.asarray(pts), 64, 2.0))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestContactWeight:
    def test_band_shape(self):
        d = np.linspace(-0.03, 0.03, 101).astype(np.float32)
        w = native.contact_weight(d)
        assert abs(w[50] - 1.0) < 1e-3      # at zero distance: full weight
        assert w[0] < 1e-3 and w[-1] < 1e-3  # far outside the band: zero
        assert (w >= 0).all() and (w <= 1.0 + 1e-5).all()
