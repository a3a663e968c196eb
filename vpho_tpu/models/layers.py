"""Shared NN building blocks (Flax, NHWC, bf16-friendly).

Ports of the reference's small modules with TPU-first layout choices:
  * all conv feature maps are NHWC (TPU-native); the (B, J, H, W) heatmap
    convention is only materialized at module boundaries where the
    aggregation/loss interfaces expect it
  * BatchNorm matches torch defaults (momentum 0.1 -> flax momentum 0.9,
    eps 1e-5); running stats live in the 'batch_stats' collection
  * LeakyReLU(0.01) everywhere the reference uses it

Reference files: lib/model/encoding.py (Residual/Encoder),
lib/model/head_inplane.py (HeadHeatmap2/JointsMSELoss),
lib/model/cross_module.py (PosEmbedder/PositionalEncoding/CrossModule).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# reference init for conv/linear inside vpho_net heads (VPHO.py:34-45)
conv_init = nn.initializers.normal(stddev=0.001)
linear_init = nn.initializers.normal(stddev=0.01)


def lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch defaults; NHWC channel-last axis.

    ``dtype`` is the computation dtype (bf16 policy); params/stats stay f32.
    """

    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
        )(x)


class Residual(nn.Module):
    """Hourglass-style pre-activation residual (encoding.py:5-36).

    BN -> LReLU -> 1x1(C/2) -> BN -> LReLU -> 3x3(C/2) -> BN -> LReLU -> 1x1(C)
    with an (optional) 1x1 projection skip when channel counts differ.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_in = x.shape[-1]
        d = self.dtype
        h = TorchBatchNorm(use_running_average=not train, dtype=d)(x)
        h = lrelu(h)
        h = nn.Conv(self.features // 2, (1, 1), kernel_init=conv_init, dtype=d)(h)
        h = TorchBatchNorm(use_running_average=not train, dtype=d)(h)
        h = lrelu(h)
        h = nn.Conv(self.features // 2, (3, 3), padding=1, kernel_init=conv_init, dtype=d)(h)
        h = TorchBatchNorm(use_running_average=not train, dtype=d)(h)
        h = lrelu(h)
        h = nn.Conv(self.features, (1, 1), kernel_init=conv_init, dtype=d)(h)
        skip = x
        if num_in != self.features:
            skip = nn.Conv(self.features, (1, 1), kernel_init=conv_init, dtype=d)(x)
        return (h + skip.astype(h.dtype))


class Encoder(nn.Module):
    """ROI-feature encoder: 1x1 project + 4 blocks x 2 Residuals with 2x
    maxpool halving (encoding.py:39-73).

    Input (B, 32, 32, C_in) -> flattened (B, 1024) + the per-block maps
    ``x_ls`` (x_ls[1] is the (B, 8, 8, 256) map feeding the physics cross
    module, VPHO.py:170-171).
    """

    hid_dim: int = 256
    n_blocks: int = 4
    n_modules: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.hid_dim, (1, 1), kernel_init=conv_init, dtype=self.dtype)(x)
        x_ls = []
        for _ in range(self.n_blocks):
            for _ in range(self.n_modules):
                x = Residual(self.hid_dim, dtype=self.dtype)(x, train=train)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x_ls.append(x)
        # channel-major flatten of (B, 2, 2, C) to match torch's (B, C*2*2)
        out = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return out, x_ls


class HeadHeatmap(nn.Module):
    """Keypoint heatmap head (HeadHeatmap2, head_inplane.py:42-113).

    conv3x3(C->h) -> conv3x3 -> BN -> LReLU -> deconv4x4/s2(h/2) -> BN ->
    ReLU -> 1x1(out).  32x32 ROI features -> 64x64 heatmaps.
    Output stays NHWC; callers transpose if they need (B, J, H, W).
    Default hidden_dim 128 matches the reference instantiation
    ``HeadHeatmap2(256, {21,27}, 128)`` (VPHO.py:61-62).
    """

    out_dim: int
    hidden_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = nn.Conv(self.hidden_dim, (3, 3), padding=1, kernel_init=conv_init, dtype=d)(x)
        x = nn.Conv(self.hidden_dim, (3, 3), padding=1, kernel_init=conv_init, dtype=d)(x)
        x = TorchBatchNorm(use_running_average=not train, dtype=d)(x)
        # the reference's activation here is ``nn.LeakyReLU(True)``
        # (head_inplane.py:43) — whose first positional arg is
        # negative_slope, so slope=1.0 == IDENTITY.  We replicate the
        # trained network's true function (pinned by test_head_heatmap_parity)
        x = nn.ConvTranspose(self.hidden_dim // 2, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             kernel_init=conv_init, dtype=d)(x)
        x = TorchBatchNorm(use_running_average=not train, dtype=d)(x)
        x = nn.relu(x)
        # final logits in f32 (heatmaps feed losses/aggregation directly)
        x = nn.Conv(self.out_dim, (1, 1), kernel_init=conv_init,
                    dtype=jnp.float32)(x.astype(jnp.float32))
        return x


def joints_mse_loss(pd_hm: jax.Array, gt_hm: jax.Array) -> jax.Array:
    """Plain MSE over heatmaps (JointsMSELoss, head_inplane.py:191-202)."""
    return jnp.mean((pd_hm - gt_hm) ** 2)


# ---------------------------------------------------------------------------
# positional embeddings + transformer encoder (cross_module.py)
# ---------------------------------------------------------------------------


def nerf_embed(x: jax.Array, multires: int = 10) -> jax.Array:
    """NeRF positional embedding, include_input, log-sampled freqs
    (cross_module.py:8-45).  (..., D) -> (..., D*(1+2*multires))."""
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)
    angles = x[..., None, :] * freqs[:, None]  # (..., multires, D)
    sin = jnp.sin(angles)
    cos = jnp.cos(angles)
    # interleave per frequency: [sin(f0 x), cos(f0 x), sin(f1 x), ...]
    enc = jnp.stack([sin, cos], axis=-2).reshape(x.shape[:-1] + (2 * multires * x.shape[-1],))
    return jnp.concatenate([x, enc], axis=-1)


def sinusoid_table(length: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """Sinusoidal token positional encoding (cross_module.py:48-88)."""
    position = jnp.arange(length, dtype=dtype)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=dtype) * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((length, d_model), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer with torch defaults
    (d_ff=2048, ReLU, dropout 0.1) — torch ``nn.TransformerEncoderLayer``.

    NOTE (deliberate fix): the reference feeds (batch, tokens, dim) into a
    sequence-first torch transformer (cross_module.py:104-107, 132-134),
    which silently attends across the BATCH axis.  We attend across tokens —
    the intended semantics — and document the deviation here.
    """

    d_model: int = 512
    n_heads: int = 2
    d_ff: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            deterministic=not train, dropout_rate=self.dropout, dtype=self.dtype,
        )(x, x)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(attn))
        ff = nn.Dense(self.d_ff, dtype=self.dtype)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype)(ff)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(ff))
        return x
