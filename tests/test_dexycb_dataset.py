"""End-to-end DexYCB loader test against a synthesized on-disk mini-dataset.

Builds a 3-sample fake DexYCB tree (jpgs + s0 json + calibration) with
geometrically consistent annotations (projected MANO joints, object pose),
then drives the full per-item pipeline: filters, crop/aug, FK translation
correction, left-hand flip protocol, heatmaps, wrist-relative object pose.
"""
import os

import numpy as np
import pytest

from vpho_tpu.configs.config import Config
from vpho_tpu.data import dexycb as D


@pytest.fixture(scope="module")
def mini_dexycb(tmp_path_factory):
    from vpho_tpu.data.fixtures_disk import build_mini_dexycb

    root = tmp_path_factory.mktemp("DexYCB")
    return build_mini_dexycb(str(root), n=3, seed=0,
                             sides=["right", "right", "left"])


@pytest.fixture(scope="module")
def dataset(mini_dexycb):
    cfg = Config(data_dir=mini_dexycb, patch_size=128, num_workers=0)
    return D.DexYCBForceDataset(cfg, mini_dexycb, is_train=False)


class TestMiniDexYCB:
    def test_index_built(self, dataset):
        assert len(dataset) == 3

    def test_item_contract(self, dataset):
        item = dataset[0]
        assert item["rgb"].shape == (128, 128, 3)
        assert item["hm_hand"].shape == (21, 64, 64)
        assert item["hm_obj"].shape == (27, 64, 64)
        assert item["gt_mano"].shape == (58,)
        assert item["gt_obj"].shape == (9,)
        assert item["gt_obj_rt"].shape == (3, 4)
        assert item["gt_hand_vert_flip"].shape == (778, 3)
        assert item["force_local"].shape == (32, 3)
        assert item["gravity"].shape == (1, 3)
        for k, v in item.items():
            if isinstance(v, np.ndarray):
                assert np.isfinite(v).all(), k

    def test_wrist_relative_consistency(self, dataset):
        """gt_hand_jt3d_flip is wrist-centered; obj translation is relative
        to the (unflipped) wrist (dexycb6.py:429-430, 447-451)."""
        item = dataset[0]
        np.testing.assert_allclose(item["gt_hand_jt3d_flip"][0], 0, atol=1e-6)
        rebuilt = item["gt_obj"][6:] + item["root_joint"]
        np.testing.assert_allclose(rebuilt, item["gt_obj_rt"][:, 3], atol=1e-5)

    def test_left_hand_flip_protocol(self, dataset):
        """Left sample: flipped verts mirror x; the object pose is NEVER
        flipped (gt_obj_rt stays in the original camera frame)."""
        item = dataset[2]
        assert not item["is_right"]
        # flipped GT hand must be a valid wrist-centered cloud
        np.testing.assert_allclose(item["gt_hand_jt3d_flip"][0], 0, atol=1e-6)
        # unflip: mirrored x + camera root must equal annotation joints
        unflipped = item["gt_hand_jt3d_flip"].copy()
        unflipped[:, 0] *= -1
        rebuilt = unflipped + item["root_joint"]
        np.testing.assert_allclose(rebuilt, item["gt_joint"], atol=1e-5)
        # object rt untouched by the flip (matches the raw +0.02 translation)
        assert item["gt_obj_rt"][0, 3] > 0  # x stayed positive

    def test_heatmap_peaks_on_joints(self, dataset):
        """The GT hand heatmap must peak where the (cropped) joints project."""
        item = dataset[0]
        hm = item["hm_hand"]
        assert float(hm.max()) > 0.9
        # at least half of the joints produce in-map peaks
        assert (hm.reshape(21, -1).max(-1) > 0.5).sum() >= 11

    def test_eval_determinism(self, dataset):
        a = dataset[1]
        b = dataset[1]
        np.testing.assert_allclose(a["rgb"], b["rgb"])
        np.testing.assert_allclose(a["bbox_hand"], b["bbox_hand"])

    def test_train_augmentation_varies(self, mini_dexycb):
        cfg = Config(data_dir=mini_dexycb, patch_size=128, num_workers=0)
        ds = D.DexYCBForceDataset(cfg, mini_dexycb, is_train=True)
        a = ds[0]
        # training aug is seeded per index: same index -> same aug
        b = ds[0]
        np.testing.assert_allclose(a["rgb"], b["rgb"])
        # but geometry keys remain consistent with the warped 2D
        assert np.isfinite(a["cam_intr_crop"]).all()

    def test_loader_collates(self, dataset):
        batch = next(D.make_loader(dataset, batch_size=3, num_workers=2))
        assert batch["rgb"].shape == (3, 128, 128, 3)
        assert batch["is_right"].shape == (3,)
        assert batch["obj_id"].tolist() == [0, 1, 2]

    def test_contact_disk_cache(self, mini_dexycb, monkeypatch):
        """Second pass reads cache/hand_contact/<...>/contact_*.npy
        (base.py:871-881 protocol) — identical labels, NO recompute."""
        cfg = Config(data_dir=mini_dexycb, patch_size=128, num_workers=0)
        ds = D.DexYCBForceDataset(cfg, mini_dexycb, is_train=False)
        first = ds[0]["force_contact"]
        cf = ds.samples[ds.index_ls[0]]["color_file"]
        cache = os.path.join(
            mini_dexycb, "cache", "hand_contact",
            cf.replace("color_", "contact_").replace(".jpg", ".npy"))
        assert os.path.exists(cache), cache

        def boom(*a, **k):
            raise AssertionError("full-mesh NN recomputed despite cache")

        monkeypatch.setattr(D, "signed_contact_weights", boom)
        second = ds[0]["force_contact"]
        np.testing.assert_allclose(first, second)
