"""HO3D v2 dataset + codalab inference against a synthesized mini-dataset.

Builds an on-disk HO3D tree (train + evaluation splits, meta pkls + rgb
pngs + evaluation.txt) with geometrically consistent annotations in the
OpenGL frame, then drives: the three split variants (train / valid / test
per ho3d3.py:421-494), the GT-less evaluation item (ho3d3.py:306-420), the
codalab dump format (train_diff_hand_obj.py:872-880), and the full
Trainer.infer_ho3d loop end to end.
"""
import json
import os
import pickle
import zipfile

import cv2
import numpy as np
import pytest

from vpho_tpu.configs.config import Config
from vpho_tpu.data import dexycb as D
from vpho_tpu.data import ho3d as H

GL = H.OPENGL_TO_OPENCV

N_TRAIN = 11
N_EVAL = 2


def _write_frame(root, split, seq, frame, meta, rng):
    meta_dir = root / split / seq / "meta"
    rgb_dir = root / split / seq / "rgb"
    meta_dir.mkdir(parents=True, exist_ok=True)
    rgb_dir.mkdir(parents=True, exist_ok=True)
    with open(meta_dir / f"{frame}.pkl", "wb") as f:
        pickle.dump(meta, f)
    # image-like content (gradients + noise), not white noise: the device
    # warp's LU kernel is pinned against cv2 on natural spectra
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    img = np.stack([127 + 80 * np.sin(xx / 37) + 15 * rng.randn(480, 640),
                    127 + 80 * np.cos(yy / 53) + 15 * rng.randn(480, 640),
                    127 + 60 * np.sin((xx + yy) / 71) + 15 * rng.randn(480, 640)],
                   -1)
    # PNG is lossless (real HO3D ships PNG) so pre-blur the synthetic noise
    # to a photographic spectrum — JPEG compression does this implicitly
    # for the DexYCB fixture
    img = cv2.GaussianBlur(np.clip(img, 0, 255).astype(np.float32), (3, 3), 0.8)
    img = np.clip(img, 0, 255).astype(np.uint8)
    cv2.imwrite(str(rgb_dir / f"{frame}.png"), img)


@pytest.fixture(scope="module")
def mini_ho3d(tmp_path_factory):
    root = tmp_path_factory.mktemp("HO3D_v2")
    rng = np.random.RandomState(7)
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])

    gt = {"train": [], "eval": []}
    model, _ = D._fk_fn("right")

    def make_geometry(i):
        aa_flat = rng.randn(45) * 0.1 + np.asarray(model.hands_mean)
        beta = rng.randn(10) * 0.3
        global_rot_cv = rng.randn(3) * 0.2
        transl_cv = np.array([0.01 * i - 0.02, 0.01, 0.55])
        vert, jt_cv = D.get_hand_vert(aa_flat, beta, global_rot_cv, transl_cv, True)
        # generic rotation: GL @ R_cv must stay away from the exact-pi
        # axis-angle extraction singularity when ENCODING the fixture
        R_cv = D._aa_to_mat(np.array([0.1, 0.4, -0.2]))
        t_cv = transl_cv + np.array([0.03, 0.0, 0.02])
        return aa_flat, beta, global_rot_cv, transl_cv, jt_cv, R_cv, t_cv

    for i in range(N_TRAIN):
        aa_flat, beta, grot, transl, jt_cv, R_cv, t_cv = make_geometry(i)
        pose_gl = np.concatenate(
            [D._mat_to_aa(GL @ D._aa_to_mat(grot)), aa_flat])
        meta = {
            "handPose": pose_gl.astype(np.float32),
            "handBeta": beta.astype(np.float32),
            "handJoints3D": (jt_cv @ GL).astype(np.float32),
            "handTrans": (GL @ transl).astype(np.float32),
            "objName": "025_mug",
            "objRot": D._mat_to_aa(GL @ R_cv).reshape(3, 1),
            "objTrans": (GL @ t_cv).astype(np.float32),
            "camMat": K,
        }
        _write_frame(root, "train", "ABF10", f"{i:04d}", meta, rng)
        gt["train"].append({"jt_cv": jt_cv, "R_cv": R_cv, "t_cv": t_cv})

    for i in range(N_EVAL):
        aa_flat, beta, grot, transl, jt_cv, R_cv, t_cv = make_geometry(i + 3)
        jt2d = jt_cv @ K.T
        jt2d = jt2d[:, :2] / jt2d[:, 2:]
        x1, y1 = jt2d.min(0) - 5
        x2, y2 = jt2d.max(0) + 5
        meta = {
            "handJoints3D": (GL @ jt_cv[0]).astype(np.float32),  # root only
            "handBoundingBox": np.array([x1, y1, x2, y2], np.float32),
            "objName": "025_mug",
            "objRot": D._mat_to_aa(GL @ R_cv).reshape(3, 1),
            "objTrans": (GL @ t_cv).astype(np.float32),
            "camMat": K,
        }
        _write_frame(root, "evaluation", "SM1", f"{i:04d}", meta, rng)
        gt["eval"].append({"root_cv": jt_cv[0], "R_cv": R_cv, "t_cv": t_cv})

    # evaluation.txt fixes codalab order — written REVERSED to prove the
    # listing honors it rather than sorting
    with open(root / "evaluation.txt", "w") as f:
        for i in reversed(range(N_EVAL)):
            f.write(f"SM1/{i:04d}\n")
    return str(root), gt


@pytest.fixture(scope="module")
def cfg(mini_ho3d):
    root, _ = mini_ho3d
    return Config(data_dir=root, dataset_name="ho3d", patch_size=128,
                  num_workers=0)


class TestSplits:
    def test_train_listing(self, mini_ho3d, cfg):
        root, _ = mini_ho3d
        ds = H.HO3DForceDataset(cfg, root, split="train")
        assert len(ds) == N_TRAIN and ds.is_train

    def test_valid_is_every_tenth(self, mini_ho3d, cfg):
        root, _ = mini_ho3d
        ds = H.HO3DForceDataset(cfg, root, split="valid")
        assert len(ds) == -(-N_TRAIN // 10)      # ::10 (ho3d3.py:447)
        assert not ds.is_train                   # no augmentation

    def test_test_follows_evaluation_txt_order(self, mini_ho3d, cfg):
        root, _ = mini_ho3d
        ds = H.HO3DForceDataset(cfg, root, split="test")
        assert len(ds) == N_EVAL
        frames = [os.path.basename(p) for p in ds.index_ls]
        assert frames == [f"{i:04d}" for i in reversed(range(N_EVAL))]
        assert ds.get_path(0).endswith("rgb/0001.png")


class TestTrainItem:
    def test_contract_and_geometry(self, mini_ho3d, cfg):
        root, gt = mini_ho3d
        ds = H.HO3DForceDataset(cfg, root, split="valid")  # no aug: exact
        item = ds[0]
        ref = gt["train"][0]
        assert bool(item["is_right"]) and bool(item["is_ho3d"])
        # OpenGL->OpenCV roundtrip: the dataset's camera-frame joints must
        # match the OpenCV-frame joints the fixture was generated from
        np.testing.assert_allclose(item["gt_joint"], ref["jt_cv"], atol=1e-4)
        np.testing.assert_allclose(item["root_joint"], ref["jt_cv"][0], atol=1e-4)
        rt = item["gt_obj_rt"]
        np.testing.assert_allclose(rt[:, :3], ref["R_cv"], atol=1e-5)
        np.testing.assert_allclose(rt[:, 3], ref["t_cv"], atol=1e-5)
        # wrist-relative object translation (ho3d parity with dexycb6)
        np.testing.assert_allclose(
            item["gt_obj"][6:], ref["t_cv"] - ref["jt_cv"][0], atol=1e-4)
        assert item["hm_hand"].shape == (21, 64, 64)
        assert item["hm_obj"].shape == (27, 64, 64)
        assert item["rgb"].shape == (128, 128, 3)

    def test_aug_path_runs(self, mini_ho3d, cfg):
        root, _ = mini_ho3d
        ds = H.HO3DForceDataset(cfg, root, split="train")
        item = ds[3]
        P = cfg.patch_size
        for k in ("bbox_hand_rect", "bbox_obj_rect"):
            b = item[k]
            assert (b[:2] >= 0).all() and (b[2:] <= P).all(), (k, b)

    def test_device_mode_parity(self, mini_ho3d, cfg):
        """--device_preprocess on HO3D train items matches the host path
        (same aligned RNG stream protocol as DexYCB; all HO3D hands are
        right, so no flip term in the affine)."""
        import jax

        from vpho_tpu.configs.config import Config
        from vpho_tpu.data.device_pipeline import make_device_preprocess
        from vpho_tpu.data.dexycb import collate

        root, _ = mini_ho3d
        host_ds = H.HO3DForceDataset(
            Config(data_dir=root, dataset_name="ho3d", patch_size=128,
                   num_workers=0, clahe_prob=0.0,
                   random_erasing_mode="const"), root, split="train")
        dcfg = Config(data_dir=root, dataset_name="ho3d", patch_size=128,
                      num_workers=0, clahe_prob=0.0,
                      random_erasing_mode="const", device_preprocess=True)
        dev_ds = H.HO3DForceDataset(dcfg, root, split="train")
        host = collate([host_ds[i] for i in range(2)])
        raw = collate([dev_ds[i] for i in range(2)])
        assert "rgb_full" in raw and "rgb" not in raw
        dev = make_device_preprocess(dcfg, is_train=True)(
            raw, jax.random.PRNGKey(3))
        d_rgb = np.abs(np.asarray(dev["rgb"]) - host["rgb"])
        assert d_rgb.mean() < 0.05, d_rgb.mean()
        d_hm = np.abs(np.asarray(dev["hm_hand"]) - host["hm_hand"])
        assert d_hm.max() < 0.25 and d_hm.mean() < 0.01
        np.testing.assert_allclose(np.asarray(dev["gt_obj"]), host["gt_obj"],
                                   atol=1e-6)

    def test_contact_derived_is_grasped(self, mini_ho3d, cfg):
        """Train items compute contact + pool to anchors + derive is_grasped
        from it (ho3d3.py:155-166) — NOT from the is_off_desk asset."""
        from vpho_tpu.models import anchor as anchor_lib

        root, _ = mini_ho3d
        ds = H.HO3DForceDataset(cfg, root, split="valid")
        item = ds[0]
        fc = item["force_contact"]
        assert fc.shape == (32,) and fc.dtype == np.float32
        assert (fc >= 0).all() and (fc <= 1 + 1e-6).all()
        assert float(item["is_grasped"]) == float(
            anchor_lib.check_is_grasped_np(fc))

    def test_force_cache_roundtrip(self, mini_ho3d, cfg):
        """save_force (ho3d branch) writes where HO3D get_force reads."""
        from vpho_tpu.engine.force_optim import ForceOptimizer

        root, _ = mini_ho3d
        ds = H.HO3DForceDataset(cfg, root, split="train")
        rng = np.random.RandomState(0)
        result = {"force_local": rng.randn(1, 32, 3).astype(np.float32),
                  "force_global": rng.randn(1, 32, 3).astype(np.float32)}
        ForceOptimizer.save_force(result, [ds.get_path(2)], "ho3d")
        got = ds.get_force(ds.get_path(2))
        np.testing.assert_array_equal(got, result["force_local"][0])
        # untouched frames still fall back to zeros
        assert (ds.get_force(ds.get_path(3)) == 0).all()


class TestEvalItem:
    def test_contract(self, mini_ho3d, cfg):
        root, gt = mini_ho3d
        ds = H.HO3DForceDataset(cfg, root, split="test")
        item = ds[1]            # evaluation.txt reversed -> dataset idx 1 == frame 0000
        ref = gt["eval"][0]
        assert "gt_mano" not in item and "gt_joint" not in item  # no hand GT
        np.testing.assert_allclose(item["root_joint"], ref["root_cv"], atol=1e-5)
        rt = item["gt_obj_rt"]
        np.testing.assert_allclose(rt[:, :3], ref["R_cv"], atol=1e-5)
        np.testing.assert_allclose(rt[:, 3], ref["t_cv"], atol=1e-5)
        assert item["hm_obj"].shape == (27, 64, 64)
        assert float(item["gravity"].sum()) == 0.0   # zeros (ho3d3.py:411)
        assert item["force_local"].shape == (32, 3)
        P = cfg.patch_size
        for k in ("bbox_hand_rect", "bbox_obj_rect"):
            b = item[k]
            assert (b[:2] >= 0).all() and (b[2:] <= P).all(), (k, b)

    def test_loader_batches(self, mini_ho3d, cfg):
        root, _ = mini_ho3d
        from vpho_tpu.data.dexycb import make_loader

        ds = H.HO3DForceDataset(cfg, root, split="test")
        batches = list(make_loader(ds, 2, shuffle=False, drop_last=False,
                                   num_workers=0))
        assert len(batches) == 1
        b = batches[0]
        assert b["rgb"].shape == (2, 128, 128, 3)
        assert b["_valid"].all() and (b["_index"] == [0, 1]).all()


class TestCodalabDump:
    def test_format(self, tmp_path):
        joints = np.arange(2 * 21 * 3, dtype=np.float64).reshape(2, 21, 3) * 0.1234567
        verts = np.ones((2, 778, 3)) * 0.7654321
        zp = H.dump_codalab(joints, verts, str(tmp_path / "submit" / "hand_reg"))
        assert zp.endswith("hand_reg.zip") and os.path.exists(zp)
        assert not os.path.exists(zp.replace(".zip", ".json"))  # json removed
        with zipfile.ZipFile(zp) as z:
            assert z.namelist() == ["hand_reg.json"]
            payload = json.loads(z.read("hand_reg.json"))
        assert len(payload) == 2                      # [joints, verts]
        assert np.asarray(payload[0]).shape == (2, 21, 3)
        assert np.asarray(payload[1]).shape == (2, 778, 3)
        # 6-decimal rounding (train_diff_hand_obj.py:875-876)
        assert payload[1][0][0][0] == 0.765432


class TestInferHO3D:
    def test_end_to_end(self, mini_ho3d, tmp_path):
        """Full codalab inference: mini-HO3D test split -> loader ->
        Trainer.infer_ho3d -> object metric report + two zips + pkl."""
        root, gt = mini_ho3d
        from vpho_tpu.data.dexycb import make_loader
        from vpho_tpu.engine.trainer import Trainer

        cfg = Config(data_dir=root, dataset_name="ho3d", patch_size=64,
                     batch_size=2, eval_batch_size=2, sampling_steps=3,
                     sample_num=2, repeat_num=2, topk_hand=2, topk_obj=2,
                     num_workers=0, output_dir=str(tmp_path), viz_freq=-1)
        ds = H.HO3DForceDataset(cfg, root, split="test")
        trainer = Trainer(cfg)
        first = next(make_loader(ds, 2, shuffle=False, drop_last=False,
                                 num_workers=0))
        first.pop("_valid"), first.pop("_index")
        trainer.init_state(first, steps_per_epoch=1)
        trainer.eval_dataset = ds

        out = trainer.infer_ho3d(
            make_loader(ds, 2, shuffle=False, drop_last=False, num_workers=0))
        assert set(out["zips"]) == {"hand_reg", "hand_diff"}
        for p in out["zips"].values():
            assert os.path.exists(p)
            with zipfile.ZipFile(p) as z:
                payload = json.loads(z.read(z.namelist()[0]))
            assert np.asarray(payload[0]).shape == (N_EVAL, 21, 3)
            assert np.asarray(payload[1]).shape == (N_EVAL, 778, 3)
        assert "mean_candidate_pose" in out["report"]["object"]
        rows = out["collector_res"]
        assert rows and all("pd_obj_rt" in r and "index" in r for r in rows)
        assert rows[0]["path"][0].endswith(".png")
