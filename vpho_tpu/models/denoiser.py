"""Score network (denoiser) — Flax port of the reference BaseDenoiser.

Reference: lib/model/denoiser.py.  The architecture is small and MLP-only:
  t --GaussianFourier(128)--Linear--ReLU--> 128
  sampled_pose --Linear(256)-ReLU-Linear(256)-ReLU--> 256
  concat [t(128), pose(256), feat(1024)] --> head --> out / std(t)

Heads use ``ParallelLinear`` banks (denoiser.py:166-179, 234-247): N
independent 2-layer MLPs computed as two einsums — already the ideal MXU
layout (one batched matmul per layer); the final layer of every head is
zero-initialized (``zero_module``, denoiser.py:10-16).

The Fourier time-embedding weights are FROZEN random features (buffer, not a
parameter — denoiser.py:19-31); we keep them in the 'buffers' collection so
the optimizer never sees them.
"""
from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

TOTAL_FEAT_DIM = 128 + 256 + 1024


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


def _torch_linear_init():
    """Reference vpho_net.init_weights (VPHO.py:43-44): N(0, 0.01), zero bias."""
    return nn.initializers.normal(stddev=0.01), nn.initializers.zeros


class Dense(nn.Dense):
    """nn.Dense with the reference's Linear init (normal 0.01 / zero bias)."""

    kernel_init: Callable = nn.initializers.normal(stddev=0.01)
    bias_init: Callable = nn.initializers.zeros


class ManoPoseHead(nn.Module):
    """32-bank parallel head -> 16x rot6d = 96 dims (ManoPoseHead2, :166-179)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        x = ParallelLinear(features=256, num=32, dtype=self.dtype)(feat)
        x = nn.relu(x)
        x = ParallelLinear(features=3, num=32, zero_init=True, dtype=self.dtype)(x)
        return x.reshape(x.shape[0], 96)


class ObjHead(nn.Module):
    """3-bank parallel head -> 9 dims rot6d+trans (ObjHead2, :234-247)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        x = ParallelLinear(features=256, num=3, dtype=self.dtype)(feat)
        x = nn.relu(x)
        x = ParallelLinear(features=3, num=3, zero_init=True, dtype=self.dtype)(x)
        return x.reshape(x.shape[0], 9)


HEAD_OUT_DIM = {"mano_pose": 96, "obj": 9, "mano": 58, "mano6d": 106}


class Denoiser(nn.Module):
    """Conditional score network.  ``marginal_prob_std`` divides the output.

    head: 'mano_pose' (hand, 96-d) or 'obj' (object, 9-d) — the two heads the
    live reference instantiates (VPHO.py:57-59).
    """

    head: str = "mano_pose"
    dtype: Any = None

    @property
    def out_dim(self) -> int:
        return HEAD_OUT_DIM[self.head]

    @nn.compact
    def __call__(self, feat: jax.Array, sampled_pose: jax.Array, t: jax.Array,
                 std: jax.Array) -> jax.Array:
        """feat: (B, 1024); sampled_pose: (B, D); t: (B, 1); std: (B, 1) or scalar."""
        t_feat = GaussianFourierProjection(128)(t[:, 0])
        t_feat = Dense(128)(t_feat)
        t_feat = nn.relu(t_feat)

        pose_feat = Dense(256)(sampled_pose)
        pose_feat = nn.relu(pose_feat)
        pose_feat = Dense(256)(pose_feat)
        pose_feat = nn.relu(pose_feat)

        total_feat = jnp.concatenate([t_feat, pose_feat, feat], axis=-1)

        if self.head == "mano_pose":
            out = ManoPoseHead(dtype=self.dtype)(total_feat)
        elif self.head == "obj":
            out = ObjHead(dtype=self.dtype)(total_feat)
        else:
            raise NotImplementedError(self.head)
        # the score divides by std and feeds the ODE integrator: f32 out
        return out.astype(jnp.float32) / (std + 1e-7)
