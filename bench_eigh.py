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


def power_dominant(A: jax.Array, squarings: int = 4) -> jax.Array:
    """Dominant eigenvector of PSD (..., 4, 4) matrices.

    Matrix-power subspace iteration: repeated squaring gives A^(2^k), whose
    columns all collapse onto the dominant eigenvector q (column i scales as
    lambda^(2^k) * q_i * q); the largest-norm column is then a numerically
    safe representative (q cannot be orthogonal to ALL four basis columns).
    Unlike a fixed-start power iteration there is NO start vector to be
    accidentally orthogonal to q.  Each step renormalizes by the max entry
    to avoid overflow; 4 squarings = A^16, plenty for the spectral gaps of
    coherent quaternion clusters (and ambiguous clusters have no meaningful
    average anyway).  Pure batched 4x4 matmul + reductions — VPU/MXU work,
    no sequential QR like eigh's TPU lowering.
    """
    P = A
    for _ in range(squarings):
        P = P / (jnp.max(jnp.abs(P), axis=(-2, -1), keepdims=True) + 1e-30)
        P = jnp.einsum("...ij,...jk->...ik", P, P)
    norms = jnp.linalg.norm(P, axis=-2)                    # column norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(P, best[..., None, None], axis=-1)[..., 0]
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-20)


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
    for name, f in (("eigh", f_eigh), ("power", f_pow)):
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
