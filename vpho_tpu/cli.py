"""Console entry points (installed as ``vpho`` / ``vpho-force-optim``).

The repo-root ``main.py`` / ``force_optim.py`` scripts delegate here so the
same dispatch works both as loose scripts (reference-CLI parity:
``python main.py --mode train ...``) and as an installed package.
"""
import os

from vpho_tpu.utils.platform import honor_jax_platforms_env


def train_eval_main():
    """Train/eval/infer dispatch — parity with the reference main.py."""
    honor_jax_platforms_env()
    from vpho_tpu.configs.config import get_config
    cfg = get_config()
    from vpho_tpu.engine.runner import run

    # full mode surface of the reference dispatch (main.py:10-22 there);
    # runner.run handles each, incl. the loud NotImplementedError for
    # 'energy' (dead in the reference too)
    run(cfg)


def force_optim_main():
    """Offline pseudo-force label optimization (reference force_optim.py)."""
    honor_jax_platforms_env()
    from vpho_tpu.configs.config import get_config
    cfg = get_config()
    cfg.bbox_scale_factor = 1.5  # ForceOptimizer override (force_optimization.py:24)

    import jax
    import numpy as np

    from vpho_tpu.engine.force_optim import ForceOptimizer
    from vpho_tpu.models import vpho as V

    ctx = V.make_context(cfg.to_model_config(), cfg.mano_root or None,
                         cfg.models_dir or None)
    optimizer = ForceOptimizer(cfg, ctx.anchor_tables, ctx.registry)

    if cfg.dataset_name == "ho3d" and os.path.isdir(os.path.join(cfg.data_dir, "train")):
        # HO3D labeling: train split, no aug, contact computed per item
        # (the reference intends this path — force_optimization.py:12-13
        # imports a ho3d dataset module missing from the published tree)
        from vpho_tpu.data.dexycb import make_loader
        from vpho_tpu.data.ho3d import HO3DForceDataset

        ds = HO3DForceDataset(cfg, cfg.data_dir, split="train")
        ds.is_train = False  # no augmentation during labeling (:55)
        for bi, batch in enumerate(make_loader(ds, cfg.batch_size)):
            paths = [ds.get_path(int(i)) for i in batch["index"]]
            result = optimizer.run_batch(batch)
            ForceOptimizer.save_force(result, paths, "ho3d")
            print(f"batch {bi}: losses={result['losses']}")
        return
    data_ok = os.path.exists(os.path.join(cfg.data_dir, "dex_ycb_s0_train_data.json"))
    if data_ok:
        from vpho_tpu.data.dexycb import DexYCBForceDataset, make_loader

        ds = DexYCBForceDataset(cfg, cfg.data_dir, is_train=True)
        ds.is_train = False  # no augmentation during labeling (:55)
        for bi, batch in enumerate(make_loader(ds, cfg.batch_size)):
            paths = [os.path.join(cfg.data_dir, ds.samples[ds.index_ls[int(i)]]["color_file"])
                     for i in batch["index"]]
            result = optimizer.run_batch(batch)
            ForceOptimizer.save_force(result, paths, cfg.dataset_name)
            print(f"batch {bi}: losses={result['losses']}")
    else:
        from vpho_tpu.data.fixtures import make_batch

        print("No real DexYCB found; running one synthetic batch as smoke check")
        batch = jax.device_get(make_batch(ctx, jax.random.PRNGKey(0), 4, 64))
        batch["force_contact"] = np.abs(np.random.RandomState(0).randn(4, 32)).astype(np.float32)
        result = optimizer.run_batch(batch)
        print(f"losses={result['losses']}")
        print(f"force_local shape={result['force_local'].shape}")
