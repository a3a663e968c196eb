"""Micro-bench: dominant-eigenvector extraction for batched 4x4 quaternion
outer-product matrices — `jnp.linalg.eigh` vs fixed-iteration power method.

The cascade/fuse aggregation takes ~6 batched eigh calls per predict
(average_quaternion/average_rot6d); eigh of tiny matrices on TPU lowers to
a sequential QR-ish routine that is latency- not FLOP-bound.  The power
method is a handful of (B,4,4)x(B,4) matvecs — pure VPU work.  Accuracy is
checked against eigh on the same inputs (PSD rank-deficient matrices from
realistic near-aligned quaternion clusters).
"""
import json
import os
import time

from vpho_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np


from vpho_tpu.utils.transforms import dominant_eigvec_4x4_power


def main():
    n = int(os.environ.get("N", "4096"))
    rng = np.random.RandomState(0)
    # realistic: clusters of K=30 quaternions near a base rotation
    base = rng.randn(n, 4)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    qs = base[:, None] + 0.15 * rng.randn(n, 30, 4)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    qs *= np.where(qs[..., :1] > 0, 1.0, -1.0)
    A = jnp.asarray(np.einsum("nki,nkj->nij", qs, qs) / 30, jnp.float32)

    f_eigh = jax.jit(lambda A: jnp.linalg.eigh(A)[1][..., -1])
    f_pow = jax.jit(lambda A: dominant_eigvec_4x4_power(A))

    out = {"n": n}
    results = {}
    # power first: it compiles in seconds; eigh's TPU lowering (sequential
    # QR) can take minutes at large batch — print incrementally so a
    # timeout still leaves data
    for name, f in (("power", f_pow), ("eigh", f_eigh)):
        t0 = time.perf_counter()
        r = f(A)
        jax.block_until_ready(r)
        out[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
        results[name] = np.asarray(r)
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            for _ in range(4):
                r = f(A)
            jax.block_until_ready(r)
            ts.append((time.perf_counter() - t0) / 4)
        ts.sort()
        out[f"{name}_ms"] = round(ts[len(ts) // 2] * 1e3, 3)
        print(json.dumps(out), flush=True)

    v_p = results["power"]
    v_e = results["eigh"]
    v_p = v_p * np.sign((v_p * v_e).sum(-1, keepdims=True))
    out["max_abs_err"] = float(np.abs(v_p - v_e).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
