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


def power_dominant(A: jax.Array, iters: int = 12) -> jax.Array:
    """Dominant eigenvector of PSD (..., 4, 4) matrices.

    Quaternion-average matrices are PSD with a large spectral gap when the
    cluster is coherent (the common case: top-k candidates agree); the
    trace-normalized start vector has nonzero overlap with the dominant
    eigenspace for any PSD A (it is A's own column mix).
    """
    v = jnp.ones(A.shape[:-1], A.dtype)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", A, v)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-20)
    return v


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
    f_pow = jax.jit(lambda A: power_dominant(A))

    v_e = np.asarray(f_eigh(A))
    v_p = np.asarray(f_pow(A))
    # sign-align then compare
    v_p = v_p * np.sign((v_p * v_e).sum(-1, keepdims=True))
    err = np.abs(v_p - v_e).max()

    out = {"max_abs_err": float(err)}
    for name, f in (("eigh", f_eigh), ("power12", f_pow)):
        r = f(A)
        jax.block_until_ready(r)
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            for _ in range(4):
                r = f(A)
            jax.block_until_ready(r)
            ts.append((time.perf_counter() - t0) / 4)
        ts.sort()
        out[f"{name}_ms"] = round(ts[len(ts) // 2] * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
