"""Mode dispatch: build data streams + Trainer and run train/eval/infer.

Composition root (reference: main.py + BaseTrainer.__init__,
base_trainer.py:19-37).  Data resolution order:
  1. real DexYCB under ``cfg.data_dir`` (vpho_tpu/data/dexycb.py)
  2. synthetic fixture stream (hermetic; keeps every subsystem runnable)
"""
from __future__ import annotations

import os
from typing import Dict, Iterator

import jax
import numpy as np

from ..configs.config import Config
from ..data.fixtures import make_batch
from ..models import heads
from ..utils import transforms as T
from .trainer import Trainer, postprocess_hand_vert


def _augment_eval_keys(ctx, batch: Dict) -> Dict:
    """Attach camera-frame GT (gt_joint/gt_hand_vert/gt_obj_rt/cam_intr) the
    eval loop consumes, derived from the batch's wrist-relative GT."""
    import jax.numpy as jnp

    root = batch["root_joint"]
    is_right = batch["is_right"]
    batch = dict(batch)
    batch["gt_joint"] = postprocess_hand_vert(batch["gt_hand_jt3d_flip"], root, is_right)
    batch["gt_hand_vert"] = postprocess_hand_vert(batch["gt_hand_vert_flip"], root, is_right)
    rt = T.obj_9d_to_mat(batch["gt_obj"])
    batch["gt_obj_rt"] = rt.at[..., :, 3].add(root)
    batch["cam_intr"] = batch["cam_intr_crop"]
    return batch


def synthetic_stream(ctx, cfg: Config, n_batches: int, batch_size: int,
                     seed: int = 0, with_eval_keys: bool = False) -> Iterator[Dict]:
    for i in range(n_batches):
        batch = make_batch(ctx, jax.random.PRNGKey(seed + i), batch_size,
                           cfg.patch_size)
        if with_eval_keys:
            batch = _augment_eval_keys(ctx, batch)
        batch = dict(jax.device_get(batch))
        if with_eval_keys:
            batch["_index"] = np.arange(i * batch_size, (i + 1) * batch_size)
            batch["_valid"] = np.ones((batch_size,), bool)
        yield batch


def _has_real_data(cfg: Config) -> bool:
    if cfg.dataset_name == "ho3d":
        return os.path.exists(os.path.join(cfg.data_dir, "evaluation.txt")) or \
            os.path.isdir(os.path.join(cfg.data_dir, "train"))
    return os.path.isdir(os.path.join(cfg.data_dir, "20200709-subject-01")) or \
        os.path.exists(os.path.join(cfg.data_dir, "dex_ycb_s0_train_data.json"))


def run(cfg: Config):
    if cfg.eval_path:
        # re-score a previously dumped prediction pkl (reference eval_path)
        from ..models.ycb import load_registry
        from .tester import evaluate_prediction_pkl

        report = evaluate_prediction_pkl(cfg.eval_path, load_registry(cfg.models_dir or None))
        for k, v in report.items():
            print(k, v)
        return report

    if cfg.mode == "energy":
        # CLI-surface parity: the mode exists in the reference dispatch and
        # raises NotImplementedError outright there too (main.py:14-15)
        raise NotImplementedError(
            "--mode energy is non-functional in the reference "
            "(zhoujun-7/VPHO main.py:14-15) and intentionally not rebuilt")

    # multi-host bring-up (single-process no-op); replaces Accelerate's
    # torch.distributed init (base_trainer.py:22)
    from ..parallel.mesh import init_distributed

    init_distributed()

    trainer = Trainer(cfg)
    log = trainer.logger
    if cfg.eval_repeat_num != 50:
        log.warning("--eval_repeat_num is parsed for CLI parity but consumed "
                    "nowhere in the reference (args.py:195, zero readers); "
                    "use --sample_num to set eval hypothesis count")

    if _has_real_data(cfg) and cfg.dataset_name == "ho3d":
        # HO3D: train on the train split, sub-eval (with GT) on every 10th
        # train frame, codalab infer on the evaluation split
        # (ho3d3.py:421-494 dataset trio)
        from ..data.dexycb import make_loader
        from ..data.ho3d import HO3DForceDataset

        train_ds = HO3DForceDataset(cfg, cfg.data_dir, split="train")
        valid_ds = HO3DForceDataset(cfg, cfg.data_dir, split="valid")
        test_ds = HO3DForceDataset(cfg, cfg.data_dir, split="test")
        # eval_dataset (-> infer_ho3d paths) is the codalab test split; the
        # metric eval runs over valid_ds, whose paths differ
        trainer.dataset, trainer.eval_dataset = train_ds, test_ds
        metric_path_of = valid_ds.get_path
        steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
        first = next(make_loader(train_ds, cfg.batch_size, shuffle=False, num_batches=1))
        get_train = lambda ep: make_loader(train_ds, cfg.batch_size, shuffle=True, seed=ep)
        # full=True -> the GT-less evaluation split (consumed by infer_ho3d);
        # full=False -> the with-GT valid split (consumed by evaluate)
        get_eval = lambda full: make_loader(
            test_ds if full else valid_ds, cfg.eval_batch_size, shuffle=False,
            drop_last=False)
    elif _has_real_data(cfg):
        metric_path_of = None  # falls back to eval_dataset.get_path
        from ..data.dexycb import DexYCBForceDataset, make_loader

        train_ds = DexYCBForceDataset(cfg, cfg.data_dir, is_train=True)
        test_ds = DexYCBForceDataset(cfg, cfg.data_dir, is_train=False)
        # evaluate() resolves the collector's 'path' column through
        # eval_dataset.get_path (pkl parity, train_diff_hand_obj.py:443-444)
        trainer.dataset, trainer.eval_dataset = train_ds, test_ds
        steps_per_epoch = len(train_ds) // cfg.batch_size
        first = next(make_loader(train_ds, cfg.batch_size, shuffle=False, num_batches=1))
        get_train = lambda ep: make_loader(train_ds, cfg.batch_size, shuffle=True, seed=ep)
        # drop_last=False: every test frame is scored exactly once (the tail
        # batch is padded and masked by _valid)
        get_eval = lambda full: make_loader(
            test_ds, cfg.eval_batch_size, shuffle=False,
            subsample=1 if full else 10, drop_last=False)
    else:
        metric_path_of = None
        log.warning("No real DexYCB found under %s — using the synthetic "
                    "fixture stream", cfg.data_dir)
        steps_per_epoch = 8
        first = next(synthetic_stream(trainer.ctx, cfg, 1, cfg.batch_size))
        get_train = lambda ep: synthetic_stream(
            trainer.ctx, cfg, steps_per_epoch, cfg.batch_size, seed=100 * ep)
        get_eval = lambda full: synthetic_stream(
            trainer.ctx, cfg, 4 if full else 2, cfg.eval_batch_size, seed=9999,
            with_eval_keys=True)

    trainer.init_state(first, steps_per_epoch)

    if cfg.mode == "train":
        if cfg.start_with_eval:
            trainer.evaluate(get_eval(False), path_of=metric_path_of)
        for epoch in range(trainer.start_epoch, cfg.max_epochs):
            log.info(f"Epoch {epoch}/{cfg.max_epochs}")
            trainer.train_one_epoch(epoch, get_train(epoch), steps_per_epoch)
            trainer.save_checkpoint(epoch + 1)
            # per-epoch sub-eval; HO3D instead runs the codalab-style infer
            # every full_evaluation_freq epochs, with the sub-eval only when
            # mixing trainsets (train_diff_hand_obj.py:145-152)
            if cfg.dataset_name != "ho3d":
                trainer.evaluate(get_eval(False), path_of=metric_path_of)
            elif (epoch + 1) % cfg.full_evaluation_freq == 0:
                if cfg.use_mix_trainset:
                    trainer.evaluate(get_eval(False), path_of=metric_path_of)
                trainer.infer_ho3d(get_eval(True), epoch_tag=f"ep{epoch+1}_")
            trainer.save_model()
    elif cfg.mode == "eval":
        # HO3D's evaluation split has no hand GT: metric eval runs on the
        # with-GT valid split (reference eval mode wires the Valid dataset,
        # ho3d3.py:436-450); use --mode infer for the codalab run
        full = cfg.eval_full and cfg.dataset_name != "ho3d"
        out = trainer.evaluate(get_eval(full), path_of=metric_path_of)
        trainer.dump_predictions(out["collector_res"])
    elif cfg.mode == "infer_candidate":
        # the reference names this mode but its Trainer never defines the
        # method (main.py:12-13 -> AttributeError); implemented intent here:
        # dump the raw diffusion candidate sets over the full test split
        trainer.infer_candidates(get_eval(True))
    elif cfg.mode == "infer":
        if cfg.dataset_name == "ho3d":
            # object metrics + codalab hand_reg/hand_diff zips + pkl
            # (Trainer.infer, train_diff_hand_obj.py:360-444)
            trainer.infer_ho3d(get_eval(True))
        else:
            out = trainer.evaluate(get_eval(True))
            trainer.dump_predictions(out["collector_res"], tag="-infer")
    else:
        raise ValueError(f"Invalid mode: {cfg.mode}")  # main.py:21-22 parity
    return trainer
