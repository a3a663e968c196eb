"""Parity: on-device (XLA) input pipeline vs the host cv2 pipeline.

The host and device modes draw from THE SAME per-index RNG stream (the
device-mode parameter sampler mirrors run_color's gate order), so for a
given dataset index both modes see identical affines, jitter factors, blur
kernels and erase rects — differences are purely numerical (cv2 fixed-point
interpolation, uint8 round-trips, HSV quantization).  Tolerances here pin
those gaps.

Reference being replaced: the host-side pixel stages of dexycb6.py:276-509.
"""
import os

import cv2
import numpy as np
import pytest

import jax

from vpho_tpu.configs.config import Config
from vpho_tpu.data import dexycb as D
from vpho_tpu.data.device_pipeline import make_device_preprocess
from vpho_tpu.data.fixtures_disk import build_mini_dexycb


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("DexYCB_dev")
    return build_mini_dexycb(str(root), n=4, seed=3,
                             sides=["right", "left", "right", "right"])


def _batches(root, is_train, device, **over):
    cfg = Config(data_dir=root, patch_size=128, num_workers=0,
                 device_preprocess=device, **over)
    ds = D.DexYCBForceDataset(cfg, root, is_train=is_train)
    batch = next(D.make_loader(ds, batch_size=4, num_workers=0))
    return cfg, batch


class TestWarpVsCv2:
    def _run(self, rot_deg, natural=False):
        from vpho_tpu.ops.image import affine_warp

        rng = np.random.RandomState(0)
        if natural:
            yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
            img = np.stack([127 + 80 * np.sin(xx / 17) + 10 * rng.randn(120, 160),
                            127 + 80 * np.cos(yy / 23) + 10 * rng.randn(120, 160),
                            127 + 60 * np.sin((xx + yy) / 31) + 10 * rng.randn(120, 160)],
                           -1)
            img = np.clip(img, 0, 255).astype(np.uint8)[None]
        else:
            img = rng.randint(0, 256, (1, 120, 160, 3)).astype(np.uint8)
        th = np.deg2rad(rot_deg)
        s = 0.9
        A = np.array([[s * np.cos(th), -s * np.sin(th), 20.0],
                      [s * np.sin(th), s * np.cos(th), -8.0],
                      [0, 0, 1.0]])
        ref = cv2.warpAffine(img[0], A[:2].astype(np.float32), (64, 64),
                             flags=cv2.INTER_CUBIC)
        minv = np.linalg.inv(A)[:2].astype(np.float32)[None]
        ours = np.asarray(affine_warp(
            img.astype(np.float32), minv, 64, rectilinear=(rot_deg == 0)))
        ours = np.clip(ours, 0, 255)[0]
        # exclude the 2px frame: cv2 treats out-of-image taps slightly
        # differently from pure zero-padding at the crop boundary
        diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2].astype(np.float32))
        return diff

    def test_rectilinear_matches_inter_cubic(self):
        diff = self._run(0)
        assert diff.mean() < 0.5 and diff.max() < 4.0, (diff.mean(), diff.max())

    def test_rotated_matches_inter_cubic(self):
        # the rotated path uses the LU two-pass (sheared cubic tensor
        # product) — same interpolation ORDER but not bit-matched to cv2's
        # axis-aligned product kernel; on image-like content (what the
        # loader actually feeds) the gap is ~1/255 mean
        diff = self._run(17, natural=True)
        assert diff.mean() < 1.6, diff.mean()
        assert np.percentile(diff, 99) < 7.0, np.percentile(diff, 99)
        assert diff.max() < 16.0, diff.max()
        # worst-case white noise stays bounded too (kernel difference, not
        # a geometry error)
        noise = self._run(17)
        assert noise.mean() < 9.0 and noise.max() < 60.0, (
            noise.mean(), noise.max())


class TestColorOpsVsHost:
    def test_jitter_matches_cv2_path(self):
        from vpho_tpu.data.augment import AugmentConfig, ImageAugmentor
        from vpho_tpu.ops.color import color_jitter

        rng = np.random.RandomState(1)
        img = rng.randint(0, 256, (96, 96, 3)).astype(np.uint8)
        aug = ImageAugmentor(AugmentConfig())
        r2 = np.random.RandomState(7)
        host = aug._color_jitter(img, r2)
        r3 = np.random.RandomState(7)
        bcsh = np.array([[r3.uniform(0.6, 1.3), r3.uniform(0.6, 1.3),
                          r3.uniform(0.6, 1.3), r3.uniform(-0.15, 0.15)]],
                        np.float32)
        ours = np.asarray(color_jitter(
            img[None].astype(np.float32), bcsh))[0]
        diff = np.abs(ours - host.astype(np.float32))
        # uint8 + integer-HSV quantization on the cv2 side
        assert diff.mean() < 2.0 and np.percentile(diff, 99) < 12.0, (
            diff.mean(), np.percentile(diff, 99), diff.max())

    def test_combined_blur_matches_sequential(self):
        from vpho_tpu.data.augment import gaussian_kernel2d, motion_blur_kernel
        from vpho_tpu.ops.color import depthwise_blur

        rng = np.random.RandomState(2)
        img = rng.rand(80, 80, 3).astype(np.float32)
        kg = gaussian_kernel2d(5, 1.1)
        km = motion_blur_kernel(7, 0.7)
        host = cv2.filter2D(cv2.filter2D(img, -1, kg), -1, km)
        from scipy.signal import convolve2d

        comb = convolve2d(kg, km, mode="full").astype(np.float32)
        pad = np.zeros((13, 13), np.float32)
        pad[1:12, 1:12] = comb
        ours = np.asarray(depthwise_blur(img[None], pad[None]))[0]
        # interior exact; border rows differ (one combined reflect pad vs
        # two sequential ones)
        np.testing.assert_allclose(ours[8:-8, 8:-8], host[8:-8, 8:-8],
                                   atol=1e-5)


class TestPipelineParity:
    def test_eval_batch_parity(self, mini_root):
        _, host = _batches(mini_root, is_train=False, device=False)
        cfg, raw = _batches(mini_root, is_train=False, device=True)
        dev = make_device_preprocess(cfg, is_train=False)(raw)
        assert "rgb_full" not in dev
        d_rgb = np.abs(np.asarray(dev["rgb"]) - host["rgb"])
        # normalized units (std ~0.22): 4/255 of intensity ~ 0.07
        assert d_rgb.mean() < 0.01 and d_rgb.max() < 0.12, (
            d_rgb.mean(), d_rgb.max())
        d_hm = np.abs(np.asarray(dev["hm_hand"]) - host["hm_hand"])
        assert d_hm.max() < 0.25 and d_hm.mean() < 0.01
        d_ho = np.abs(np.asarray(dev["hm_obj"]) - host["hm_obj"])
        assert d_ho.max() < 0.05, d_ho.max()  # square twin is near-exact
        for k in ("gt_obj", "gt_mano", "root_joint", "bbox_hand",
                  "force_contact", "cam_intr_crop_flip"):
            np.testing.assert_allclose(np.asarray(dev[k]), host[k], atol=1e-6)

    def test_train_batch_parity_const_erase(self, mini_root):
        # clahe off: the device mode applies CLAHE to the FULL frame
        # pre-warp instead of the crop (documented distribution-level
        # deviation, DEVIATIONS.md D15) — not a numerical-parity target
        over = {"random_erasing_mode": "const", "clahe_prob": 0.0}
        _, host = _batches(mini_root, is_train=True, device=False, **over)
        cfg, raw = _batches(mini_root, is_train=True, device=True, **over)
        dev = make_device_preprocess(cfg, is_train=True)(
            raw, jax.random.PRNGKey(5))
        d_rgb = np.abs(np.asarray(dev["rgb"]) - host["rgb"])
        # stochastic stages share the SAME drawn parameters (aligned RNG
        # stream); the residual is quantization + HSV float-vs-uint8
        assert d_rgb.mean() < 0.05, d_rgb.mean()
        assert np.percentile(d_rgb, 99) < 0.35, np.percentile(d_rgb, 99)
        d_hm = np.abs(np.asarray(dev["hm_hand"]) - host["hm_hand"])
        assert d_hm.max() < 0.25 and d_hm.mean() < 0.01
        # erase GEOMETRY parity: const mode fills exactly 0.0 on both
        # sides — the all-channels-exactly-zero masks must coincide (a
        # desynchronized rect draw would shift them)
        mask_h = (host["rgb"] == 0.0).all(-1)
        mask_d = (np.asarray(dev["rgb"]) == 0.0).all(-1)
        assert mask_h.sum() > 0  # the fixture config triggers erasing
        assert (mask_h == mask_d).mean() > 0.999, (
            mask_h.sum(), mask_d.sum(), (mask_h != mask_d).sum())

    def test_train_erase_rects_in_bounds(self, mini_root):
        """device-mode erase rects stay inside the patch."""
        _, raw = _batches(mini_root, is_train=True, device=True)
        rects = np.asarray(raw["erase_rects"])       # (B, R, 4)
        assert rects.shape[1:] == (2, 4)
        for b in range(rects.shape[0]):
            for r in range(rects.shape[1]):
                y, x, h, w = rects[b, r]
                if h > 0:
                    assert 0 <= y and y + h < 128 and 0 <= x and x + w < 128

    def test_model_consumes_device_batch(self, mini_root):
        """The preprocessed batch feeds the train forward unchanged."""
        cfg, raw = _batches(mini_root, is_train=True, device=True)
        dev = make_device_preprocess(cfg, is_train=True)(
            raw, jax.random.PRNGKey(0))
        from vpho_tpu.models import vpho as V
        from vpho_tpu.models.vpho import VPHONet, forward_train

        mcfg = Config(data_dir=mini_root, patch_size=128, sample_num=2,
                      sampling_steps=2, repeat_num=2).to_model_config()
        ctx = V.make_context(mcfg)
        model = VPHONet()
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            dev, True)
        _, loss_dict, _ = forward_train(model, variables, ctx, dev,
                                        jax.random.PRNGKey(3))
        assert np.isfinite(float(loss_dict["total_loss"]))
