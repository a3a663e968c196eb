"""Golden tests for image ops — grid_sample validated against torch CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vpho_tpu.ops.image import (grid_sample, resample_rectilinear, roi_align,
                                sample_points, resize_bilinear)
from vpho_tpu.ops.heatmap import gaussian_heatmap, adaptive_bbox_heatmap, square_bbox_heatmap


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "bicubic", "nearest"])
    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_torch(self, mode, align_corners):
        img = _rand(2, 3, 16, 20, seed=1)
        grid = (_rand(2, 7, 5, 2, seed=2) * 0.8).clip(-1.5, 1.5)
        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), mode, align_corners))
        theirs = F.grid_sample(
            torch.from_numpy(img), torch.from_numpy(grid), mode=mode,
            align_corners=align_corners, padding_mode="zeros",
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_out_of_bounds_zero(self):
        img = jnp.ones((1, 1, 8, 8))
        grid = jnp.full((1, 1, 1, 2), -3.0)
        out = grid_sample(img, grid, "bilinear", False)
        assert float(out[0, 0, 0, 0]) == 0.0

    def test_sample_points_matches_looped(self):
        """sample_points == the reference's per-joint grid_sample loop."""
        hm = _rand(2, 4, 64, 64, seed=3)
        pts = (_rand(2, 9, 4, 2, seed=4) * 0.7).astype(np.float32)
        ours = np.asarray(sample_points(jnp.asarray(hm), jnp.asarray(pts), mode="bicubic"))
        # torch loop (reference aggregation.py:206-213)
        vals = []
        for j in range(4):
            g = torch.from_numpy(pts[:, :, [j]])          # (B, N, 1, 2)
            h = torch.from_numpy(hm[:, [j]])              # (B, 1, H, W)
            v = F.grid_sample(h, g, align_corners=False, mode="bicubic").squeeze(1)
            vals.append(v)
        theirs = torch.cat(vals, dim=-1).numpy()          # (B, N, J)
        np.testing.assert_allclose(ours, theirs, atol=2e-5)


class TestResampleRectilinear:
    def test_matches_grid_sample(self):
        """Dense separable resample == gather grid_sample on the same
        rectilinear grid (incl. out-of-range rows -> zero padding)."""
        img = _rand(3, 5, 16, 20, seed=11)
        rng = np.random.RandomState(12)
        xs_n = (rng.rand(3, 9).astype(np.float32) * 2.4 - 1.2)  # normalized
        ys_n = (rng.rand(3, 7).astype(np.float32) * 2.4 - 1.2)
        grid = np.stack(np.broadcast_arrays(
            xs_n[:, None, :], ys_n[:, :, None]), axis=-1).astype(np.float32)
        ref = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                     "bilinear", False))
        xs = ((xs_n + 1.0) * 20 - 1.0) / 2.0
        ys = ((ys_n + 1.0) * 16 - 1.0) / 2.0
        ours = np.asarray(resample_rectilinear(
            jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestRoiAlign:
    def test_matches_looped_bilinear(self):
        """Dense roi_align == per-sample-point bilinear loop (numpy)."""
        H = W = 16
        C, os_, sr, scale = 3, 4, 2, 0.25
        img = _rand(2, H, W, C, seed=13)
        boxes = np.array([[8.0, 6.0, 40.0, 52.0], [0.0, 0.0, 64.0, 64.0]],
                         np.float32)
        out = np.asarray(roi_align(jnp.asarray(img), jnp.asarray(boxes),
                                   output_size=os_, spatial_scale=scale,
                                   sampling_ratio=sr))

        def bil(im, x, y):  # zero padding
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            acc = np.zeros(C, np.float32)
            for (xi, yi, w) in [(x0, y0, (1 - (x - x0)) * (1 - (y - y0))),
                                (x0 + 1, y0, (x - x0) * (1 - (y - y0))),
                                (x0, y0 + 1, (1 - (x - x0)) * (y - y0)),
                                (x0 + 1, y0 + 1, (x - x0) * (y - y0))]:
                if 0 <= xi < W and 0 <= yi < H:
                    acc += w * im[yi, xi]
            return acc

        for b in range(2):
            x1, y1, x2, y2 = boxes[b] * scale
            rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
            for ty in range(os_):
                for tx in range(os_):
                    acc = np.zeros(C, np.float32)
                    for iy in range(sr):
                        for ix in range(sr):
                            sy = y1 + (ty + (iy + 0.5) / sr) * rh / os_
                            sx = x1 + (tx + (ix + 0.5) / sr) * rw / os_
                            acc += bil(img[b], sx, sy)
                    np.testing.assert_allclose(
                        out[b, ty, tx], acc / (sr * sr), atol=2e-5)


    def test_constant_image(self):
        img = jnp.full((1, 32, 32, 2), 5.0)
        boxes = jnp.array([[8.0, 8.0, 88.0, 88.0]])  # scaled by 1/4 -> [2,22]
        out = roi_align(img, boxes, output_size=8, spatial_scale=0.25)
        np.testing.assert_allclose(np.asarray(out), np.full((1, 8, 8, 2), 5.0), atol=1e-5)

    def test_linear_ramp(self):
        """ROI over x-ramp: bin means must be linear in x at bin centers."""
        W = 64
        ramp = jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, None, :, None], (1, W, 1, 1))
        boxes = jnp.array([[0.0, 0.0, 4.0 * W, 4.0 * W]])
        out = np.asarray(roi_align(ramp, boxes, output_size=8, spatial_scale=0.25))
        # torchvision aligned=False convention: pixel i sits at coordinate i,
        # so sampling the ramp at coordinate c returns c (bin centers here)
        bin_w = W / 8
        expected = (np.arange(8) + 0.5) * bin_w
        np.testing.assert_allclose(out[0, 4, :, 0], expected, atol=0.1)

    def test_shapes(self):
        img = jnp.zeros((3, 64, 64, 256))
        boxes = jnp.tile(jnp.array([[10.0, 20.0, 120.0, 150.0]]), (3, 1))
        out = roi_align(img, boxes, output_size=32, spatial_scale=0.25)
        assert out.shape == (3, 32, 32, 256)


class TestHeatmap:
    def test_gaussian_matches_reference_stamping(self):
        """Vectorized gaussian == the HigherHRNet patch-stamping algorithm."""
        res, sigma = 64, 2.0
        pts = np.array([[10.3, 20.7], [0.0, 0.0], [63.0, 63.0], [-5.0, 10.0], [70.0, 2.0]])
        ours = np.asarray(gaussian_heatmap(jnp.asarray(pts, jnp.float32), res, sigma))

        # reference implementation (misc_fn.py:285-322)
        size = int(6 * sigma + 3)
        x = np.arange(0, size, 1, float)
        y = x[:, np.newaxis]
        x0 = y0 = 3 * sigma + 1
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
        hms = np.zeros((len(pts), res, res), dtype=np.float32)
        for idx, pt in enumerate(pts):
            xi, yi = int(pt[0]), int(pt[1])
            if xi < 0 or yi < 0 or xi >= res or yi >= res:
                continue
            ul = int(np.round(xi - 3 * sigma - 1)), int(np.round(yi - 3 * sigma - 1))
            br = int(np.round(xi + 3 * sigma + 2)), int(np.round(yi + 3 * sigma + 2))
            c, d = max(0, -ul[0]), min(br[0], res) - ul[0]
            a, b = max(0, -ul[1]), min(br[1], res) - ul[1]
            cc, dd = max(0, ul[0]), min(br[0], res)
            aa, bb = max(0, ul[1]), min(br[1], res)
            hms[idx, aa:bb, cc:dd] = np.maximum(hms[idx, aa:bb, cc:dd], g[a:b, c:d])
        np.testing.assert_allclose(ours, hms, atol=1e-5)

    def test_square_bbox_mapping(self):
        pt2d = jnp.array([[[100.0, 100.0], [150.0, 120.0]]])
        bbox = jnp.array([[80.0, 80.0, 208.0, 208.0]])
        hm = square_bbox_heatmap(pt2d, bbox, 64, 2.0)
        assert hm.shape == (1, 2, 64, 64)
        # joint 0 at (100-80)/128*63 = 9.84 -> peak at int pixel (9, 9)
        peak = np.unravel_index(np.asarray(hm[0, 0]).argmax(), (64, 64))
        assert peak == (9, 9)

    def test_adaptive_bbox_aspect(self):
        pt2d = jnp.array([[[100.0, 100.0]]])
        bbox = jnp.array([[80.0, 90.0, 208.0, 154.0]])  # w=128, h=64
        hm = adaptive_bbox_heatmap(pt2d, bbox, 64, 2.0)
        assert hm.shape == (1, 1, 64, 64)
        assert float(hm.max()) > 0.9
        # the y-axis is stretched 2x so the blob must be taller than wide
        m = np.asarray(hm[0, 0])
        ys, xs = np.where(m > 0.5)
        assert (ys.max() - ys.min()) > (xs.max() - xs.min())

    def test_batch_shapes(self):
        pts = jnp.zeros((4, 21, 2)) + 30.0
        hm = gaussian_heatmap(pts, 64, 2.0)
        assert hm.shape == (4, 21, 64, 64)


class TestResize:
    def test_matches_torch_bilinear(self):
        img = _rand(2, 3, 32, 32, seed=5)
        ours = np.asarray(resize_bilinear(jnp.asarray(img), (64, 64)))
        theirs = F.interpolate(torch.from_numpy(img), size=(64, 64), mode="bilinear",
                               align_corners=False).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


class TestHostHeatmapTwins:
    def test_square_np_matches_jax(self):
        from vpho_tpu.ops.heatmap import square_bbox_heatmap_np

        pt2d = np.array([[100.0, 100.0], [150.0, 120.0]], np.float32)
        bbox = np.array([80.0, 80.0, 208.0, 208.0], np.float32)
        got = square_bbox_heatmap_np(pt2d, bbox, 64, 2.0)
        ref = np.asarray(square_bbox_heatmap(
            jnp.asarray(pt2d)[None], jnp.asarray(bbox)[None], 64, 2.0))[0]
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_adaptive_np_close_to_jax(self):
        """np twin runs the exact stamp+cv2-resize reference pipeline; the
        jax version is its analytic limit — peaks must coincide and values
        agree to resize-interpolation tolerance."""
        from vpho_tpu.ops.heatmap import adaptive_bbox_heatmap_np

        pt2d = np.array([[100.0, 100.0], [130.0, 110.0]], np.float32)
        bbox = np.array([80.0, 90.0, 208.0, 154.0], np.float32)  # w=128 h=64
        got = adaptive_bbox_heatmap_np(pt2d, bbox, 64, 2.0)
        ref = np.asarray(adaptive_bbox_heatmap(
            jnp.asarray(pt2d)[None], jnp.asarray(bbox)[None], 64, 2.0))[0]
        assert got.shape == ref.shape == (2, 64, 64)
        for j in range(2):
            pg = np.unravel_index(got[j].argmax(), got[j].shape)
            pr = np.unravel_index(ref[j].argmax(), ref[j].shape)
            assert abs(pg[0] - pr[0]) <= 1 and abs(pg[1] - pr[1]) <= 1
        np.testing.assert_allclose(got, ref, atol=0.25)


class TestAnchorNumpyTwins:
    def test_pool_and_grasp_match(self):
        import jax

        from vpho_tpu.models import anchor as A
        from vpho_tpu.models.mano import synthetic_mano

        tables = A.load_anchor_tables(synthetic_mano())
        contact = np.abs(np.random.RandomState(0).randn(778)).astype(np.float32)
        got = A.pool_contact_to_anchors_np(tables, contact)
        ref = np.asarray(A.pool_contact_to_anchors(tables, jnp.asarray(contact)))
        np.testing.assert_allclose(got, ref, atol=1e-5)
        assert A.check_is_grasped_np(got) == bool(
            A.check_is_grasped(jnp.asarray(ref)))
