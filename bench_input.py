"""Input-pipeline throughput: items/s through make_loader on real-shaped data.

Answers the question the train/eval benches (which feed pre-built on-device
fixture batches) cannot: can the HOST feed the chip?  The blessed bf16 train
step consumes ~466 frames/s/chip (docs/PERF.md); the loader must produce at
least that many items/s or the end-to-end number is loader-bound.

Builds a 640x480 synthetic s0-format DexYCB tree once under /tmp (JPEG
decode cost matches natural images — gradients+noise content), then measures
the full per-item pipeline (decode, crop/warp, aug, FK correction, heatmaps,
contact labels) through the threaded loader:

  * pass 1 (train): COLD contact cache — includes the full-mesh NN cost
  * pass 2 (train): WARM cache — the steady-state per-epoch cost
  * eval pass: no color aug / erasing

Env knobs: BENCH_INPUT_N (images, default 64), BENCH_INPUT_BATCHES,
BENCH_INPUT_BS, BENCH_INPUT_WORKERS, BENCH_INPUT_PATCH,
BENCH_INPUT_MODE=host|device (device = on-chip preprocessing pipeline).

Prints one JSON line: warm train items/s + the step-throughput ratio.
"""
import json
import os
import shutil
import sys
import time

import numpy as np

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

TRAIN_STEP_FPS = 466.0  # blessed bf16 train step, docs/PERF.md r3


def run_pass(ds, bs, n_batches, workers, label, device_fn=None):
    from vpho_tpu.data.dexycb import make_loader

    t0 = time.perf_counter()
    n_items = 0
    for batch in make_loader(ds, batch_size=bs, shuffle=False,
                             num_batches=n_batches, num_workers=workers):
        if device_fn is not None:
            batch = device_fn(batch)
        n_items += next(iter(batch.values())).shape[0]
    if device_fn is not None:
        import jax

        jax.block_until_ready(batch["rgb"])
    dt = time.perf_counter() - t0
    ips = n_items / dt
    print(f"{label}: {n_items} items in {dt:.2f}s = {ips:.1f} items/s",
          file=sys.stderr)
    return ips


def main():
    n_imgs = int(os.environ.get("BENCH_INPUT_N", "64"))
    bs = int(os.environ.get("BENCH_INPUT_BS", "16"))
    n_batches = int(os.environ.get("BENCH_INPUT_BATCHES",
                                   str(max(1, n_imgs // bs))))
    workers = int(os.environ.get("BENCH_INPUT_WORKERS", "8"))
    patch = int(os.environ.get("BENCH_INPUT_PATCH", "256"))
    mode = os.environ.get("BENCH_INPUT_MODE", "host")

    root = os.environ.get("BENCH_INPUT_DIR",
                          f"/tmp/vpho_bench_dexycb_{n_imgs}")
    from vpho_tpu.configs.config import Config
    from vpho_tpu.data.dexycb import DexYCBForceDataset
    from vpho_tpu.data.fixtures_disk import build_mini_dexycb

    if not os.path.exists(os.path.join(root, "dex_ycb_s0_train_data.json")):
        build_mini_dexycb(root, n=n_imgs, seed=0)
    # cold-cache measurement must actually be cold
    shutil.rmtree(os.path.join(root, "cache"), ignore_errors=True)

    # host: full cv2 per-item pipeline (the reference's architecture)
    # raw:  device_preprocess loader only — what the HOST must sustain when
    #       pixel work moves on-device (decode + point math + param draws)
    # device: raw loader + the jitted preprocess graph per batch
    device_fn = None
    if mode in ("device", "raw"):
        cfg = Config(data_dir=root, patch_size=patch, batch_size=bs,
                     device_preprocess=True)
        ds_train = DexYCBForceDataset(cfg, root, is_train=True)
        if mode == "device":
            from vpho_tpu.data.device_pipeline import make_device_preprocess

            device_fn = make_device_preprocess(cfg, is_train=True)
    else:
        cfg = Config(data_dir=root, patch_size=patch, batch_size=bs)
        ds_train = DexYCBForceDataset(cfg, root, is_train=True)

    if device_fn is not None:
        # compile the preprocess jits outside the timed passes
        from vpho_tpu.data.dexycb import make_loader

        warm_b = next(make_loader(ds_train, batch_size=bs, num_batches=1,
                                  num_workers=0))
        import jax

        jax.block_until_ready(device_fn(warm_b)["rgb"])
        # the warm-up pass populated the first bs items' contact caches —
        # re-clear so the cold measurement is actually cold
        shutil.rmtree(os.path.join(root, "cache"), ignore_errors=True)

    cold = run_pass(ds_train, bs, n_batches, workers,
                    f"train[{mode}] cold-contact-cache", device_fn)
    warm = run_pass(ds_train, bs, n_batches, workers,
                    f"train[{mode}] warm", device_fn)

    ds_eval = DexYCBForceDataset(cfg, root, is_train=False)
    eval_fn = None
    if mode == "device":
        from vpho_tpu.data.device_pipeline import make_device_preprocess

        eval_fn = make_device_preprocess(cfg, is_train=False)
        from vpho_tpu.data.dexycb import make_loader

        import jax

        warm_b = next(make_loader(ds_eval, batch_size=bs, num_batches=1,
                                  num_workers=0))
        jax.block_until_ready(eval_fn(warm_b)["rgb"])
    eips = run_pass(ds_eval, bs, n_batches, workers,
                    f"eval[{mode}]", eval_fn)

    print(json.dumps({
        "metric": f"input_pipeline_{mode}",
        "value": round(warm, 1),
        "unit": "items/sec",
        "vs_baseline": round(warm / TRAIN_STEP_FPS, 3),
        "cold_ips": round(cold, 1),
        "eval_ips": round(eips, 1),
        "train_step_fps": TRAIN_STEP_FPS,
        "note": "vs_baseline = loader items/s over the blessed bf16 train "
                "step f/s; >= 1.0 means the host keeps the chip fed",
    }))


if __name__ == "__main__":
    main()
