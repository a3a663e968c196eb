"""On-device color augmentation ops (jax) for the fused input pipeline.

JAX twins of the host cv2 pipeline in ``data/augment.py`` (itself a
re-derivation of the reference's albumentations stack, base.py:379-392 —
see DEVIATIONS.md D15).  All ops work on float32 RGB in [0, 255] (the host
path round-trips uint8 between stages; skipping that quantization is the
only difference, pinned by tests/test_device_pipeline.py tolerances).

HSV follows cv2's uint8 convention: H in [0, 180), S and V in [0, 255].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv_cv2(x: jax.Array) -> jax.Array:
    """(..., 3) RGB float 0..255 -> (..., 3) HSV, H in [0,180) cv2-style."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(delta > 0, jnp.mod(h, 360.0), 0.0) / 2.0   # cv2 uint8: H/2
    s = jnp.where(v > 0, delta * 255.0 / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb_cv2(hsv: jax.Array) -> jax.Array:
    """Inverse of :func:`rgb_to_hsv_cv2` (continuous-hue version)."""
    h = hsv[..., 0] * 2.0                    # back to degrees [0, 360)
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]
    c = v * s
    hp = h / 60.0
    xwedge = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    r = jnp.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                   [c, xwedge, z, z, xwedge], c)
    g = jnp.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                   [xwedge, c, c, xwedge, z], z)
    b = jnp.select([hp < 1, hp < 2, hp < 3, hp < 4, hp < 5],
                   [z, z, xwedge, c, c], xwedge)
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def color_jitter(x: jax.Array, bcsh: jax.Array) -> jax.Array:
    """Per-sample brightness/contrast/saturation/hue, fixed b->c->s->h order.

    x: (B, H, W, 3) float 0..255; bcsh: (B, 4) with identity = (1, 1, 1, 0).
    Matches ``ImageAugmentor._color_jitter`` (data/augment.py): contrast
    blends with the GLOBAL per-image mean (computed after brightness,
    before clipping, exactly like the host path), saturation scales the
    cv2-convention HSV S channel, hue adds ``hue * 180`` degrees-halved
    mod 180.
    """
    b = bcsh[:, 0, None, None, None]
    c = bcsh[:, 1, None, None, None]
    f = x * b
    mean = jnp.mean(f, axis=(1, 2, 3), keepdims=True)
    f = (f - mean) * c + mean
    f = jnp.clip(f, 0.0, 255.0)
    hsv = rgb_to_hsv_cv2(f)
    s_new = jnp.clip(hsv[..., 1] * bcsh[:, 2, None, None], 0.0, 255.0)
    h_new = jnp.mod(hsv[..., 0] + bcsh[:, 3, None, None] * 180.0, 180.0)
    hsv = jnp.stack([h_new, s_new, hsv[..., 2]], axis=-1)
    return jnp.clip(hsv_to_rgb_cv2(hsv), 0.0, 255.0)


def rgb_shift(x: jax.Array, shift: jax.Array) -> jax.Array:
    """x: (B, H, W, 3) 0..255; shift: (B, 3) additive per channel."""
    return jnp.clip(x + shift[:, None, None, :], 0.0, 255.0)


def depthwise_blur(x: jax.Array, kernels: jax.Array) -> jax.Array:
    """Per-sample single-kernel blur over all channels, reflect-101 border.

    x: (B, H, W, 3); kernels: (B, k, k) correlation kernels (identity delta
    when the sample's blur didn't trigger).  The host path applies gaussian
    then motion blur sequentially (cv2 correlation, BORDER_REFLECT_101);
    two correlations compose into one correlation with the full 2-D
    convolution of the kernels, which the host side precomputes — so one
    conv here reproduces both stages (border rows differ imperceptibly:
    one combined reflect pad vs two sequential ones).
    """
    k = kernels.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    def one(im, kern):
        # (H+2p, W+2p, 3) -> NHWC conv with HWIO kernel shared across
        # channels via feature_group_count=3
        kern4 = jnp.broadcast_to(kern[:, :, None, None], (k, k, 1, 3))
        return jax.lax.conv_general_dilated(
            im[None], kern4, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)[0]

    return jax.vmap(one)(xp, kernels)


def erase_regions(x: jax.Array, rects: jax.Array, rng: jax.Array,
                  mode: str = "pixel") -> jax.Array:
    """timm-style RandomErasing fills on the NORMALIZED image.

    x: (B, H, W, C); rects: (B, R, 4) int32 (y, x, h, w) with h == 0 for
    unused slots (host samples the geometry; see data/device_pipeline.py).
    Fill: 'pixel' = unit-normal noise per pixel, 'rand' = one normal color
    per region, 'const' = zeros (matches data/augment.py run_random_erasing).
    """
    B, H, W, C = x.shape
    R = rects.shape[1]
    ii = jnp.arange(H)[None, None, :, None]          # (1, 1, H, 1)
    jj = jnp.arange(W)[None, None, None, :]          # (1, 1, 1, W)
    y0 = rects[..., 0][:, :, None, None]
    x0 = rects[..., 1][:, :, None, None]
    h = rects[..., 2][:, :, None, None]
    w = rects[..., 3][:, :, None, None]
    mask = ((ii >= y0) & (ii < y0 + h) & (jj >= x0) & (jj < x0 + w))  # (B,R,H,W)
    if mode == "pixel":
        fill = jax.random.normal(rng, (B, 1, H, W, C), x.dtype)
        fill = jnp.broadcast_to(fill, (B, R, H, W, C))
    elif mode == "rand":
        fill = jax.random.normal(rng, (B, R, 1, 1, C), x.dtype)
        fill = jnp.broadcast_to(fill, (B, R, H, W, C))
    elif mode == "const":
        fill = jnp.zeros((B, R, H, W, C), x.dtype)
    else:
        raise ValueError(mode)
    out = x
    for r in range(R):
        out = jnp.where(mask[:, r, :, :, None], fill[:, r], out)
    return out
