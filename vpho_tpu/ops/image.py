"""Image sampling ops: grid_sample (bilinear/bicubic) and roi_align.

XLA-native replacements for ``torch.nn.functional.grid_sample`` and
``torchvision.ops.roi_align`` (the only library image ops on the reference's
live path — VPHO.py:125-128, 333-346; aggregation.py:210, 771).  Both lower to
gathers + fused elementwise math, which XLA vectorizes well on TPU; there is
no scatter and no data-dependent shape anywhere.

Conventions match torch:
  * inputs are NCHW
  * normalized grid coords in [-1, 1], (x, y) order
  * ``align_corners=False``: pixel i spans [i, i+1) and x_px = ((x+1)*W - 1)/2
  * zero padding outside the image
  * bicubic uses the cubic convolution kernel with A = -0.75 (torch default)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(img: jax.Array, ix: jax.Array, iy: jax.Array) -> jax.Array:
    """img: (C, H, W); ix/iy: (...,) int32 -> (C, ...) with zero padding."""
    H, W = img.shape[-2:]
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    flat = img.reshape(img.shape[0], H * W)
    idx = (iyc * W + ixc).reshape(-1)
    vals = flat[:, idx].reshape((img.shape[0],) + ix.shape)
    return vals * valid.astype(img.dtype)


def _cubic_weights(t: jax.Array, A: float = -0.75):
    """Cubic convolution weights for offsets (-1, 0, 1, 2) at fraction t."""
    t2, t3 = t * t, t * t * t
    w0 = A * (t3 - 2 * t2 + t)
    w1 = (A + 2) * t3 - (A + 3) * t2 + 1
    w2 = -(A + 2) * t3 + (2 * A + 3) * t2 - A * t
    w3 = A * (t2 - t3)
    return jnp.stack([w0, w1, w2, w3], axis=0)


def _grid_sample_single(img: jax.Array, grid: jax.Array, mode: str, align_corners: bool):
    """img: (C, H, W); grid: (Hg, Wg, 2) -> (C, Hg, Wg)."""
    H, W = img.shape[-2:]
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if mode == "nearest":
        return _gather_2d(img, jnp.round(x).astype(jnp.int32), jnp.round(y).astype(jnp.int32))

    if mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        v00 = _gather_2d(img, x0i, y0i)
        v01 = _gather_2d(img, x0i + 1, y0i)
        v10 = _gather_2d(img, x0i, y0i + 1)
        v11 = _gather_2d(img, x0i + 1, y0i + 1)
        top = v00 * (1 - tx) + v01 * tx
        bot = v10 * (1 - tx) + v11 * tx
        return top * (1 - ty) + bot * ty

    if mode == "bicubic":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        wx = _cubic_weights(tx)  # (4, ...)
        wy = _cubic_weights(ty)
        out = 0.0
        for j in range(4):
            row = 0.0
            for i in range(4):
                row = row + wx[i] * _gather_2d(img, x0i + i - 1, y0i + j - 1)
            out = out + wy[j] * row
        return out

    raise NotImplementedError(mode)


def grid_sample(input: jax.Array, grid: jax.Array, mode: str = "bilinear",
                align_corners: bool = False) -> jax.Array:
    """Torch-compatible grid_sample.

    input: (B, C, H, W); grid: (B, Hg, Wg, 2) -> (B, C, Hg, Wg).
    """
    return jax.vmap(lambda im, g: _grid_sample_single(im, g, mode, align_corners))(input, grid)


def _keys_kernel(d: jax.Array, A: float = -0.75) -> jax.Array:
    """Keys cubic-convolution kernel k(d), zero for |d| >= 2.

    The piecewise closed form of the per-tap weights in ``_cubic_weights``:
    evaluating it at every integer pixel offset reproduces exactly the 4
    nonzero taps (w0..w3) and 0 elsewhere.
    """
    ad = jnp.abs(d)
    ad2, ad3 = ad * ad, ad * ad * ad
    near = (A + 2.0) * ad3 - (A + 3.0) * ad2 + 1.0        # |d| < 1
    far = A * (ad3 - 5.0 * ad2 + 8.0 * ad - 4.0)          # 1 <= |d| < 2
    return jnp.where(ad < 1.0, near, jnp.where(ad < 2.0, far, 0.0))


def _tent_kernel(d: jax.Array) -> jax.Array:
    """Bilinear (tent) kernel, zero for |d| >= 1."""
    return jnp.maximum(1.0 - jnp.abs(d), 0.0)


def sample_points(input: jax.Array, pts: jax.Array, mode: str = "bicubic",
                  align_corners: bool = False) -> jax.Array:
    """Sample per-channel values at per-channel point lists in one pass.

    input: (B, J, H, W); pts: (B, N, J, 2) normalized -> (B, N, J).

    Replaces the reference's per-joint Python loop over ``F.grid_sample``
    calls (aggregation.py:206-213, 767-774).  TPU formulation: interpolation
    is separable, so instead of 16 scalar gathers per sample (XLA gathers
    are the single slowest op family on TPU — measured ~50 ms per cascade
    level at the blessed shapes) we evaluate the interpolation kernel
    DENSELY over the full W and H axes (it is zero outside the 4-tap
    window, so this is exact, including the zero padding outside the
    image: out-of-range taps simply have no pixel to weight) and contract
    with two einsums — pure MXU work, no gathers.
    """
    B, J, H, W = input.shape
    kern = {"bicubic": _keys_kernel, "bilinear": _tent_kernel}[mode]
    x = _unnormalize(pts[..., 0], W, align_corners)             # (B, N, J)
    y = _unnormalize(pts[..., 1], H, align_corners)
    wx = kern(jnp.arange(W, dtype=x.dtype) - x[..., None])      # (B, N, J, W)
    wy = kern(jnp.arange(H, dtype=y.dtype) - y[..., None])      # (B, N, J, H)
    rows = jnp.einsum("bjhw,bnjw->bnjh", input, wx)             # contract W
    return jnp.einsum("bnjh,bnjh->bnj", rows, wy)               # contract H


def _gather_2d_nhwc(img: jax.Array, ix: jax.Array, iy: jax.Array) -> jax.Array:
    """img: (H, W, C); ix/iy: (...,) int32 -> (..., C) with zero padding."""
    H, W, C = img.shape
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    flat = img.reshape(H * W, C)
    vals = flat[(iyc * W + ixc).reshape(-1)].reshape(ix.shape + (C,))
    return vals * valid[..., None].astype(img.dtype)


def roi_align(features: jax.Array, boxes: jax.Array, output_size: int,
              spatial_scale: float = 0.25, sampling_ratio: int = 2) -> jax.Array:
    """ROI-align (torchvision semantics, aligned=False), NHWC.

    features: (B, H, W, C); boxes: (B, 4) as (x1, y1, x2, y2) in input coords
    (one ROI per batch element — the reference always crops its own image's
    bbox, VPHO.py:117-128, so the torchvision batch-index column is implicit).
    Returns (B, output_size, output_size, C).

    Deviation: torchvision derives the per-ROI sampling grid count from the
    ROI size (data-dependent); for a static XLA graph we use a fixed
    ``sampling_ratio`` per bin (the detectron default of 2).  Training from
    scratch, this changes nothing semantically.
    """
    B, H, W, C = features.shape
    os, sr = output_size, sampling_ratio

    def one(img, box):
        x1, y1, x2, y2 = box * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        # per-bin sr x sr sample points
        ii = jnp.arange(os)
        ss = (jnp.arange(sr) + 0.5) / sr
        ys = y1 + (ii[:, None] + ss[None, :]) * (roi_h / os)
        xs = x1 + (ii[:, None] + ss[None, :]) * (roi_w / os)
        gy, gx = jnp.meshgrid(ys.reshape(-1), xs.reshape(-1), indexing="ij")
        # bilinear at absolute pixel coords (pixel i at coordinate i)
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        tx, ty = (gx - x0)[..., None], (gy - y0)[..., None]
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        v00 = _gather_2d_nhwc(img, x0i, y0i)
        v01 = _gather_2d_nhwc(img, x0i + 1, y0i)
        v10 = _gather_2d_nhwc(img, x0i, y0i + 1)
        v11 = _gather_2d_nhwc(img, x0i + 1, y0i + 1)
        vals = (v00 * (1 - tx) + v01 * tx) * (1 - ty) + (v10 * (1 - tx) + v11 * tx) * ty
        vals = vals.reshape(os, sr, os, sr, C)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one)(features, boxes)


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """NCHW bilinear resize, align_corners=False (torch F.interpolate)."""
    B, C, H, W = x.shape
    out = jax.image.resize(x, (B, C, size[0], size[1]), method="bilinear")
    return out
