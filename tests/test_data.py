"""Tests for the data layer: bbox helpers, augmentation geometry, config CLI."""
import numpy as np
import pytest

from vpho_tpu.configs.config import Config, get_config
from vpho_tpu.data.augment import AugmentConfig, ImageAugmentor, normalize_rgb
from vpho_tpu.data import dexycb as D


class TestBBoxHelpers:
    def test_pt2d_to_bbox(self):
        pts = np.array([[1.0, 2.0], [5.0, 7.0], [3.0, 4.0]])
        np.testing.assert_allclose(D.pt2d_to_bbox(pts), [1, 2, 5, 7])

    def test_expand_bbox(self):
        bbox = np.array([0.0, 0.0, 10.0, 10.0])
        out = D.expand_bbox(bbox, 1.5)
        np.testing.assert_allclose(out, [-2.5, -2.5, 12.5, 12.5])

    def test_rectangularize(self):
        bbox = np.array([0.0, 0.0, 10.0, 20.0])
        out = D.rectangularize(bbox)
        np.testing.assert_allclose(out, [-5, 0, 15, 20])

    def test_bbox_in_image(self):
        assert D.bbox_in_image(np.array([0.0, 0, 10, 10]), 64)
        assert not D.bbox_in_image(np.array([-1.0, 0, 10, 10]), 64)
        assert not D.bbox_in_image(np.array([0.0, 0, 70, 10]), 64)


class TestRotationHelpers:
    def test_aa_mat_roundtrip(self):
        aa = np.array([0.3, -0.5, 0.8])
        R = D._aa_to_mat(aa)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(D._mat_to_aa(R), aa, atol=1e-8)

    def test_zero_rotation(self):
        np.testing.assert_allclose(D._aa_to_mat(np.zeros(3)), np.eye(3))
        np.testing.assert_allclose(D._mat_to_aa(np.eye(3)), np.zeros(3))


class TestAugmentationGeometry:
    """Pin the 2D-affine == 3D-optical-axis-rotation equivalence
    (base.py:567: 3D rot about the camera axis == 2D rot about the principal
    point, with the crop intrinsics adjusted to match)."""

    def _make_ds(self):
        cfg = Config(patch_size=128, bbox_scale_factor=1.2)

        class Stub:
            pass

        ds = Stub()
        ds.cfg = cfg
        ds._augmentation_rotmat = D.DexYCBForceDataset._augmentation_rotmat.__get__(ds)
        return ds

    def test_projection_consistency(self):
        """project(R3 @ X, K_crop) == affine(project(X, K)) for any rotation."""
        ds = self._make_ds()
        rng = np.random.RandomState(0)
        X = rng.randn(30, 3) * 0.1 + np.array([0, 0, 0.6])
        K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        pts2d = (X @ K.T)
        pts2d = pts2d[:, :2] / pts2d[:, 2:]
        jt2d, kpt2d = pts2d[:21], pts2d[21:][:9]

        for rot in (0.0, 0.3, -0.5):
            R3, A2, K_crop = ds._augmentation_rotmat(
                np.zeros(2), 1.0, rot, jt2d, kpt2d, K)
            X_rot = X @ R3.T
            proj_rot = X_rot @ K_crop.T
            proj_rot = proj_rot[:, :2] / proj_rot[:, 2:]
            affine = pts2d @ A2[:2, :2].T + A2[:2, 2]
            np.testing.assert_allclose(proj_rot, affine, atol=1e-6)

    def test_rotmat_3d_is_rotation(self):
        ds = self._make_ds()
        R3, A2, K_crop = ds._augmentation_rotmat(
            np.zeros(2), 1.0, 0.4,
            np.random.RandomState(1).rand(21, 2) * 100 + 200,
            np.random.RandomState(2).rand(27, 2) * 100 + 200,
            np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]))
        np.testing.assert_allclose(R3 @ R3.T, np.eye(3), atol=1e-10)


class TestColorAugment:
    def test_deterministic_per_seed(self):
        aug = ImageAugmentor(AugmentConfig())
        img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
        a = aug.run_color(img.copy(), np.random.RandomState(5))
        b = aug.run_color(img.copy(), np.random.RandomState(5))
        np.testing.assert_array_equal(a, b)
        c = aug.run_color(img.copy(), np.random.RandomState(6))
        assert not np.array_equal(a, c)

    def test_output_valid(self):
        aug = ImageAugmentor(AugmentConfig())
        img = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
        out = aug.run_color(img, np.random.RandomState(0))
        assert out.dtype == np.uint8 and out.shape == img.shape

    def test_random_erasing(self):
        aug = ImageAugmentor(AugmentConfig(random_erasing_prob=1.0))
        img = normalize_rgb((np.ones((64, 64, 3)) * 128).astype(np.uint8))
        out = aug.run_random_erasing(img, np.random.RandomState(0))
        assert not np.allclose(out, img)  # something was erased

    def test_normalize_rgb(self):
        img = (np.ones((4, 4, 3)) * 255).astype(np.uint8)
        out = normalize_rgb(img)
        expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(out[0, 0], expected, atol=1e-5)


class TestFilters:
    def test_hfl_filter(self):
        pts = [[300 + 3 * i, 200 + 2 * i] for i in range(21)]
        ok = {"joint_2d": [pts]}
        assert D.filter_hfl(ok)
        # degenerate zero-area bbox fails (all joints identical)
        edge = {"joint_2d": [[[-500, 200]] * 21]}
        assert not D.filter_hfl(edge)


class TestConfigCLI:
    def test_defaults_match_reference(self):
        cfg = get_config([])
        assert cfg.base_learning_rate == 2e-4
        assert cfg.gamma == 0.96
        assert cfg.sample_T0 == 0.65
        assert cfg.topk_hand == 15
        assert cfg.weight_hm_hand_loss == 1e3
        assert cfg.weight_torque_loss == 30.0
        assert cfg.do_weighted_average is True
        assert cfg.use_regression_as_candidate is True

    def test_store_false_semantics(self):
        cfg = get_config(["--do_physics_selection", "--use_regression_as_candidate"])
        assert cfg.do_physics_selection is False
        assert cfg.use_regression_as_candidate is False

    def test_flag_parsing(self):
        cfg = get_config(["--mode", "eval", "--sample_num", "100",
                          "--topk_hand", "30", "--batch_size", "64"])
        assert cfg.mode == "eval" and cfg.sample_num == 100
        assert cfg.topk_hand == 30 and cfg.batch_size == 64

    def test_to_model_config(self):
        cfg = get_config(["--sampling_steps", "50"])
        mc = cfg.to_model_config()
        assert mc.sampling_steps == 50
        assert mc.weight_hm_hand_loss == 1e3


class TestSignedContact:
    """Signed banded contact labeling (physics_fn.py:47-112 semantics),
    hand-computed cases with penetrating + separated vertices."""

    def _grid_mesh(self):
        # 3x3 flat grid in the z=0 plane; outward normal = +z
        import numpy as np
        xs, ys = np.meshgrid(np.arange(3) * 0.01, np.arange(3) * 0.01)
        v = np.stack([xs.ravel(), ys.ravel(), np.zeros(9)], -1).astype(np.float32)
        f = []
        for r in range(2):
            for c in range(2):
                a = r * 3 + c
                f += [[a, a + 1, a + 3], [a + 1, a + 4, a + 3]]
        return v, np.asarray(f, np.int64)

    def test_penetrating_and_separated(self):
        import numpy as np

        from vpho_tpu.data.dexycb import signed_contact_weights, vertex_normals

        v, f = self._grid_mesh()
        n = vertex_normals(v, f)
        np.testing.assert_allclose(n[:, 2], 1.0, atol=1e-6)  # all +z

        center = v[4]
        # object point 2mm ABOVE the center vertex -> that vertex sits 2mm
        # BELOW the surface along its normal: nd = -0.002 (penetrating, in band)
        obj = np.array([center + [0, 0, 0.002]], np.float32)
        w = signed_contact_weights(v, f, obj)
        assert w[4] > 0.5, w
        # nd at the far corner is dominated by tangential offset -> masked out
        assert w[0] == 0.0

        # object point 5 cm above: outside the band entirely
        far = np.array([center + [0, 0, 0.05]], np.float32)
        assert signed_contact_weights(v, f, far).max() == 0.0

        # object point 5 cm BELOW (hand floats above object): nd = +0.05, out
        below = np.array([center - [0, 0, 0.05]], np.float32)
        assert signed_contact_weights(v, f, below).max() == 0.0

        # just-touching from below: nd = +0.004 (inside decay band edge)
        touch = np.array([center - [0, 0, 0.004]], np.float32)
        wt = signed_contact_weights(v, f, touch)
        assert 0.0 < wt[4] <= 1.0

        # deep penetration beyond lo: nd = -0.02 -> masked
        deep = np.array([center + [0, 0, 0.02]], np.float32)
        assert signed_contact_weights(v, f, deep).max() == 0.0

    def test_band_weight_peaks_at_zero(self):
        import numpy as np

        from vpho_tpu.native import contact_weight

        x = np.linspace(-0.02, 0.02, 801).astype(np.float32)
        w = contact_weight(x)
        assert abs(w[400] - 1.0) < 1e-3            # peak-normalized at nd=0
        assert w[0] < 1e-3 and w[-1] < 1e-3        # decays outside the band
        mid = contact_weight(np.array([-0.0075, 0.0075], np.float32))
        np.testing.assert_allclose(mid, [0.5, 0.5], atol=0.01)  # half-power at mids


class TestRandomErasingModes:
    def test_modes_fill_differently(self):
        import numpy as np

        from vpho_tpu.data.augment import AugmentConfig, ImageAugmentor

        img = np.ones((32, 32, 3), np.float32)

        def erased_region(mode, seed=3):
            aug = ImageAugmentor(AugmentConfig(
                random_erasing_prob=1.0, random_erasing_mode=mode,
                random_erasing_max_count=1))
            out = aug.run_random_erasing(img, np.random.RandomState(seed))
            mask = np.any(out != 1.0, axis=-1)
            assert mask.any(), mode
            return out, mask

        const, m = erased_region("const")
        assert np.all(const[m] == 0.0)
        rand, m = erased_region("rand")
        region = rand[m]
        # one color per region: zero variance within the region per channel
        assert np.allclose(region.std(axis=0), 0.0, atol=1e-6)
        pixel, m = erased_region("pixel")
        assert pixel[m].std() > 0.1

    def test_timm_count_semantics(self):
        """One probability gate, then EXACTLY max_count regions (D15).

        The reference wires timm RandomErasing with min_count=2 (base.py:
        386-392 passes its max_count cfg value as min_count, and timm
        defaults max_count:=min_count) — a triggered image always erases
        2 regions, each targeting area/2.
        """
        import numpy as np

        from vpho_tpu.data.augment import AugmentConfig, ImageAugmentor

        img = np.ones((64, 64, 3), np.float32)
        aug = ImageAugmentor(AugmentConfig(
            random_erasing_prob=1.0, random_erasing_mode="const",
            random_erasing_max_count=2))
        from scipy import ndimage

        n_multi = 0
        for seed in range(20):
            out = aug.run_random_erasing(img, np.random.RandomState(seed))
            mask = np.any(out != 1.0, axis=-1)
            _, n = ndimage.label(mask)
            assert 1 <= n <= 2, n  # 2 regions unless they overlap/merge
            n_multi += n == 2
        assert n_multi >= 10  # distinct rectangles dominate at these areas

        # prob gate: rand() >= prob -> untouched (single gate, not per-region)
        aug0 = ImageAugmentor(AugmentConfig(
            random_erasing_prob=0.0, random_erasing_max_count=2))
        out = aug0.run_random_erasing(img, np.random.RandomState(0))
        assert np.all(out == 1.0)
