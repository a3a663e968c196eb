"""On-chip cost of the fused input-preprocessing graph (device_preprocess).

Feeds synthetic raw batches (uint8 640x480 frames + warp/aug params) to the
jitted ``preprocess_batch`` graph and reports ms/batch + items/s for the
train (rotation-aware warp + full aug chain) and eval (dense rectilinear
warp) variants at the blessed shapes.  Compare against the train step
(~137 ms at bs=64 bf16) and the host pipeline cost it replaces
(bench_input.py).

Env: BENCH_BATCH (64), BENCH_PATCH (256), BENCH_ITERS (10).
"""
import json
import os
import time

import numpy as np

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax


def make_raw_batch(B, P, train, seed=0):
    rng = np.random.RandomState(seed)
    H, W = 480, 640
    th = rng.uniform(-0.5, 0.5, B) * (1.0 if train else 0.0)
    s = rng.uniform(1.5, 2.5, B)
    minv = np.zeros((B, 2, 3), np.float32)
    minv[:, 0, 0] = s * np.cos(th)
    minv[:, 0, 1] = -s * np.sin(th) * (1.0 if train else 0.0)
    minv[:, 1, 0] = s * np.sin(th) * (1.0 if train else 0.0)
    minv[:, 1, 1] = s * np.cos(th)
    minv[:, 0, 2] = rng.uniform(0, 100, B)
    minv[:, 1, 2] = rng.uniform(0, 60, B)
    batch = {
        "rgb_full": rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8),
        "warp_minv": minv,
        "jt2d": rng.uniform(0, P, (B, 21, 2)).astype(np.float32),
        "kpt2d": rng.uniform(0, P, (B, 27, 2)).astype(np.float32),
        "bbox_hand": np.tile(np.array([10, 10, 200, 200], np.float32),
                             (B, 1)),
        "bbox_obj_rect": np.tile(np.array([20, 20, 220, 220], np.float32),
                                 (B, 1)),
        "is_right": np.ones(B, bool),
    }
    if train:
        kern = np.zeros((B, 13, 13), np.float32)
        kern[:, 6, 6] = 0.5
        kern[:, 5, 6] = 0.25
        kern[:, 7, 6] = 0.25
        batch.update({
            "rgb_shift": rng.uniform(-20, 20, (B, 3)).astype(np.float32),
            "jitter_bcsh": np.tile(np.array([1.1, 0.9, 1.05, 0.02],
                                            np.float32), (B, 1)),
            "blur_kernel": kern,
            "erase_rects": np.tile(np.array([[10, 10, 30, 40], [0, 0, 0, 0]],
                                            np.int32), (B, 1, 1)),
        })
    return batch


def bench_variant(train, B, P, iters):
    from vpho_tpu.data.device_pipeline import preprocess_batch
    import functools

    fn = jax.jit(functools.partial(
        preprocess_batch, patch_size=P, heatmap_size=64, hand_sigma=2.0,
        obj_sigma=2.0, is_train=train, erase_mode="pixel"))
    batch = make_raw_batch(B, P, train)
    rng = jax.random.PRNGKey(0)
    out = fn(batch, rng)
    jax.block_until_ready(out["rgb"])
    times = []
    for i in range(iters):
        b2 = dict(batch)
        # fresh param so the axon tunnel cannot short-circuit re-execution
        b2["warp_minv"] = batch["warp_minv"] + np.float32(1e-6 * (i + 1))
        t0 = time.perf_counter()
        out = fn(b2, jax.random.fold_in(rng, i))
        jax.block_until_ready(out["rgb"])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    B = int(os.environ.get("BENCH_BATCH", "64"))
    P = int(os.environ.get("BENCH_PATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    dt_train = bench_variant(True, B, P, iters)
    dt_eval = bench_variant(False, B, P, iters)
    print(json.dumps({
        "metric": "device_preprocess_ms_per_batch",
        "train_ms": round(1000 * dt_train, 2),
        "eval_ms": round(1000 * dt_eval, 2),
        "batch": B,
        "train_items_per_s": round(B / dt_train, 1),
        "eval_items_per_s": round(B / dt_eval, 1),
    }))


if __name__ == "__main__":
    main()
