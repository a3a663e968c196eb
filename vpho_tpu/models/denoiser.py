"""Score network (denoiser) — Flax port of the reference BaseDenoiser.

Reference: lib/model/denoiser.py.  The architecture is small and MLP-only:
  t --GaussianFourier(128)--Linear--ReLU--> 128
  sampled_pose --Linear(256)-ReLU-Linear(256)-ReLU--> 256
  concat [t(128), pose(256), feat(1024)] --> head --> out / std(t)

Heads use ``ParallelLinear`` banks (denoiser.py:166-179, 234-247): N
independent 2-layer MLPs computed as two einsums — already the ideal MXU
layout; the final layer of every head is zero-initialized (``zero_module``,
denoiser.py:10-16).

TPU-native optimization (exact algebra, not an approximation): the ODE
sampler evaluates this network 4 x sampling_steps times per hypothesis with
the SAME conditioning ``feat``.  The first bank layer is linear, so its feat
slice — 1024 of the 1408 input dims, ~73% of the dominant FLOPs — can be
projected ONCE per sample (``precompute_feat``) and reused at every
evaluation with only the (t, pose) slice recomputed.  ``BankMLPHead`` keeps
one parameter bank shared by both paths.

The Fourier time-embedding weights are FROZEN random features (buffer, not a
parameter — denoiser.py:19-31); they live in the 'buffers' collection so the
optimizer never sees them.
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pallas_bank

T_DIM = 128
POSE_DIM = 256
FEAT_DIM = 1024
TP_DIM = T_DIM + POSE_DIM
TOTAL_FEAT_DIM = TP_DIM + FEAT_DIM


def _kaiming_uniform_bank(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) for a (num, fan_in, fan_out) bank."""
    fan_in = shape[1]
    bound = math.sqrt(3.0) * math.sqrt(2.0 / (1 + 5.0)) / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ParallelLinear(nn.Module):
    """Bank of ``num`` independent Linear layers as one einsum.

    Reference lib/model/parallel_linear.py:8-35 — the repo's own intra-op
    parallelism primitive; on TPU the einsum maps straight onto the MXU.
    """

    features: int
    num: int
    zero_init: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        if self.zero_init:
            w_init = nn.initializers.zeros
            b_init = nn.initializers.zeros
        else:
            w_init = _kaiming_uniform_bank
            bound = 1.0 / math.sqrt(in_features)
            b_init = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound
            )
        w = self.param("kernel", w_init, (self.num, in_features, self.features))
        b = self.param("bias", b_init, (self.num, self.features))
        if self.dtype is not None:
            x, w, b = x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype)
        if x.ndim == 2:
            y = jnp.einsum("bc,ncd->bnd", x, w) + b
        else:
            y = jnp.einsum("bnc,ncd->bnd", x, w) + b
        return y


class BankMLPHead(nn.Module):
    """num-bank 2-layer MLP head over [t | pose | feat] with a splittable
    first layer (see module docstring).  Equivalent to
    ``ParallelLinear(1408, 256, num) -> ReLU -> zero ParallelLinear(256, k)``.

    The first layer is linear, so each input slice projects independently:
      h = W_t t_feat + W_p pose_feat + W_f feat + b.
    Inside the ODE loop the conditioning ``feat`` is constant per sample
    (precomputed once) and ``t`` is ONE scalar shared by all B*S hypotheses
    per step (t_feat arrives with batch 1 and broadcasts) — only the pose
    slice (256 of 1408 input dims) is recomputed per hypothesis per eval.
    """

    num: int
    out_dim: int            # per-bank output dim (3)
    hidden: int = 256
    dtype: Any = None

    def setup(self):
        bound = 1.0 / math.sqrt(TOTAL_FEAT_DIM)
        self.kernel1 = self.param(
            "kernel1", _kaiming_uniform_bank, (self.num, TOTAL_FEAT_DIM, self.hidden))
        self.bias1 = self.param(
            "bias1",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (self.num, self.hidden))
        self.kernel2 = self.param(
            "kernel2", nn.initializers.zeros, (self.num, self.hidden, self.out_dim))
        self.bias2 = self.param("bias2", nn.initializers.zeros,
                                (self.num, self.out_dim))

    def _cast(self, *xs):
        if self.dtype is None:
            return xs
        return tuple(x.astype(self.dtype) for x in xs)

    def precompute_feat(self, feat: jax.Array) -> jax.Array:
        """feat: (B, 1024) -> (B, num, hidden): the constant first-layer term."""
        w = self.kernel1[:, TP_DIM:]
        feat, w = self._cast(feat, w)
        return jnp.einsum("bc,ncd->bnd", feat, w)

    def __call__(self, t_feat: jax.Array, pose_feat: jax.Array,
                 feat: jax.Array | None = None,
                 feat_proj: jax.Array | None = None) -> jax.Array:
        """t_feat: (Bt, 128) with Bt in {1, B} (broadcasts over hypotheses);
        pose_feat: (B, 256); provide either the raw ``feat`` (full recompute)
        or a precomputed ``feat_proj`` (B, num, hidden)."""
        # NOTE(r2): a fused Pallas bank-MLP kernel (layer1+ReLU+layer2 with
        # the hidden tile kept in VMEM) was built and measured against this
        # einsum path inside a 100-step scan at the blessed shapes: einsum
        # f32 0.597 ms/eval vs pallas f32 0.772 / best-tuned bf16 0.593 —
        # XLA's batched-GEMM lowering wins (docs/PERF.md has the full
        # sweep), so the kernel was dropped and this stays einsum.
        if (feat_proj is not None and feat_proj.shape[0] != pose_feat.shape[0]
                and t_feat.shape[0] == 1 and self.dtype is not None
                and self.num * self.out_dim >= 32
                and not os.environ.get("VPHO_DISABLE_FUSED_BANK")
                and pallas_bank.tpu_backend()):
            # ODE-loop fast path on TPU under the bf16 policy: ONE fused
            # Pallas kernel (layer1 + ReLU + block-diagonal layer2) that
            # never materializes the (B*S, num, hidden) activation in HBM
            # (~210 MB/score-eval at blessed shapes; see ops/pallas_bank.py).
            # The per-sample additive term folds the shared t-embedding,
            # bias1 and the conditioning projection into (B, num, hidden).
            # Gated to wide heads (num*out >= 32): the 3-bank object head's
            # 9 output lanes pad to 128 and the per-cell work is too small —
            # measured 8.1 -> 11.8 ms REGRESSION in-situ; the hand head
            # (32 banks, 96 lanes) measures 24.8 -> 21.9 ms.
            B = feat_proj.shape[0]
            S = pose_feat.shape[0] // B
            assert S * B == pose_feat.shape[0], (pose_feat.shape, feat_proj.shape)
            t_term = jnp.einsum("bc,ncd->bnd",
                                *self._cast(t_feat, self.kernel1[:, :T_DIM]))
            add = (t_term.astype(jnp.float32) + self.bias1
                   + feat_proj.astype(jnp.float32))
            out = pallas_bank.fused_bank_mlp(
                pose_feat, self.kernel1[:, T_DIM:TP_DIM], add,
                self.kernel2, self.bias2, S)
            return out.reshape(out.shape[0], self.num * self.out_dim)
        w_t = self.kernel1[:, :T_DIM]
        w_p = self.kernel1[:, T_DIM:TP_DIM]
        t_feat, pose_feat, w_t, w_p, b1 = self._cast(
            t_feat, pose_feat, w_t, w_p, self.bias1)
        h = (jnp.einsum("bc,ncd->bnd", t_feat, w_t)
             + jnp.einsum("bc,ncd->bnd", pose_feat, w_p) + b1)
        if feat_proj is None:
            assert feat is not None
            h = h + self.precompute_feat(feat)
        elif feat_proj.shape[0] != h.shape[0]:
            # ODE loop off-TPU / f32: feat_proj is per-SAMPLE (B, n, H)
            # while the poses carry B*S hypotheses (sample-major repeat).
            # Broadcasting here instead of pre-repeating saves reading the
            # repeated 210 MB conditioning tensor at every score evaluation.
            S = h.shape[0] // feat_proj.shape[0]
            assert S * feat_proj.shape[0] == h.shape[0], (h.shape, feat_proj.shape)
            h = (h.reshape(feat_proj.shape[0], S, *h.shape[1:])
                 + feat_proj[:, None].astype(h.dtype)).reshape(h.shape)
        else:
            h = h + feat_proj.astype(h.dtype)
        h = nn.relu(h)
        w2, b2 = self._cast(self.kernel2, self.bias2)
        out = jnp.einsum("bnc,ncd->bnd", h, w2) + b2
        return out.reshape(out.shape[0], self.num * self.out_dim)


class GaussianFourierProjection(nn.Module):
    """Fixed random Fourier features for the diffusion time (frozen buffer)."""

    embed_dim: int = 128
    scale: float = 30.0

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        W = self.variable(
            "buffers",
            "W",
            lambda: jax.random.normal(self.make_rng("params"), (self.embed_dim // 2,)) * self.scale,
        ).value
        x_proj = t[:, None] * W[None, :] * 2.0 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Dense(nn.Dense):
    """nn.Dense with the reference's Linear init (normal 0.01 / zero bias)."""

    kernel_init: Callable = nn.initializers.normal(stddev=0.01)
    bias_init: Callable = nn.initializers.zeros


HEAD_OUT_DIM = {"mano_pose": 96, "obj": 9}
HEAD_BANKS = {"mano_pose": 32, "obj": 3}


class Denoiser(nn.Module):
    """Conditional score network (heads: 'mano_pose' 96-d, 'obj' 9-d —
    the two the live reference instantiates, VPHO.py:57-59)."""

    head: str = "mano_pose"
    dtype: Any = None

    @property
    def out_dim(self) -> int:
        return HEAD_OUT_DIM[self.head]

    def setup(self):
        self.t_dense = Dense(T_DIM)
        self.pose_dense1 = Dense(POSE_DIM)
        self.pose_dense2 = Dense(POSE_DIM)
        self.fourier = GaussianFourierProjection(T_DIM)
        self.bank = BankMLPHead(num=HEAD_BANKS[self.head], out_dim=3,
                                dtype=self.dtype)

    def _tp_feat(self, sampled_pose: jax.Array, t: jax.Array):
        """t: (Bt, 1) with Bt in {1, B} — the ODE loop passes the shared
        per-step scalar as (1, 1) so the t-encoder and the bank's t-slice run
        ONCE per step instead of once per hypothesis (exact broadcast)."""
        t_feat = nn.relu(self.t_dense(self.fourier(t[:, 0])))
        p = nn.relu(self.pose_dense1(sampled_pose))
        p = nn.relu(self.pose_dense2(p))
        return t_feat, p

    def precompute_feat(self, feat: jax.Array) -> jax.Array:
        """Project the conditioning feature once per sample (B, num, 256)."""
        return self.bank.precompute_feat(feat)

    def __call__(self, feat: jax.Array, sampled_pose: jax.Array, t: jax.Array,
                 std: jax.Array) -> jax.Array:
        """Full path: feat (B, 1024); sampled_pose (B, D); t/std (B, 1)."""
        t_feat, p = self._tp_feat(sampled_pose, t)
        out = self.bank(t_feat, p, feat=feat)
        return out.astype(jnp.float32) / (std + 1e-7)

    def score_from_proj(self, feat_proj: jax.Array, sampled_pose: jax.Array,
                        t: jax.Array, std: jax.Array) -> jax.Array:
        """Fast path for the ODE loop: uses the precomputed feat projection."""
        t_feat, p = self._tp_feat(sampled_pose, t)
        out = self.bank(t_feat, p, feat_proj=feat_proj)
        return out.astype(jnp.float32) / (std + 1e-7)
