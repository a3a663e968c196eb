"""Image sampling ops: grid_sample (bilinear/bicubic) and roi_align.

XLA-native replacements for ``torch.nn.functional.grid_sample`` and
``torchvision.ops.roi_align`` (the only library image ops on the reference's
live path — VPHO.py:125-128, 333-346; aggregation.py:210, 771).  The hot
paths (``sample_points``, ``roi_align``, ``resample_rectilinear``) are
formulated as DENSE separable weight-matrix contractions — interpolation
kernels evaluated over the full axis, zero outside their tap window — so
they run entirely on the MXU with no gathers (XLA's gather lowering is the
slowest op family on TPU; the rewrite bought +77% end-to-end eval
throughput, docs/PERF.md).  The general ``grid_sample`` keeps the classic
gather form for arbitrary (non-rectilinear) grids and as the parity
reference.

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


def resample_rectilinear(x: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Bilinear resample of NCHW maps on a rectilinear grid, as dense matmuls.

    x: (B, C, H, W); xs: (B, Wout) / ys: (B, Hout) ABSOLUTE pixel coords
    (``align_corners=False`` unnormalization done by the caller) ->
    (B, C, Hout, Wout), zero padding outside the image.

    A rectilinear grid (every output row shares its y, every column its x —
    true for the heatmap re-alignment, VPHO.py:333-346) factorizes the
    interpolation into two tent-weight contractions: out = Wy @ x @ Wx^T.
    No gathers (the TPU-hostile path); the weight rows are zero outside the
    2-tap window so this is exact, including zero padding.
    """
    H, W = x.shape[-2:]
    wx = _tent_kernel(jnp.arange(W, dtype=xs.dtype) - xs[..., None])  # (B, Wout, W)
    wy = _tent_kernel(jnp.arange(H, dtype=ys.dtype) - ys[..., None])  # (B, Hout, H)
    rows = jnp.einsum("bchw,bsw->bchs", x, wx)
    return jnp.einsum("bchs,bth->bcts", rows, wy)


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

    # The ROI sampling grid is rectilinear (ys x xs outer product), so the
    # bilinear interpolation + per-bin mean factorize into two dense tent-
    # weight contractions (cf. resample_rectilinear) — no gathers.  The
    # sr sample rows of each bin are averaged directly into the weight
    # matrix, so the contraction output is already the binned value.
    box = boxes * spatial_scale
    x1, y1 = box[:, 0], box[:, 1]
    roi_w = jnp.maximum(box[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(box[:, 3] - y1, 1.0)
    ii = jnp.arange(os, dtype=features.dtype)
    ss = (jnp.arange(sr, dtype=features.dtype) + 0.5) / sr
    grid01 = (ii[:, None] + ss[None, :])                          # (os, sr)
    ys = y1[:, None, None] + grid01 * (roi_h[:, None, None] / os)  # (B, os, sr)
    xs = x1[:, None, None] + grid01 * (roi_w[:, None, None] / os)
    # bilinear at absolute pixel coords (pixel i at coordinate i), zero pad
    wx = _tent_kernel(jnp.arange(W, dtype=xs.dtype) - xs[..., None]).mean(2)  # (B, os, W)
    wy = _tent_kernel(jnp.arange(H, dtype=ys.dtype) - ys[..., None]).mean(2)  # (B, os, H)
    rows = jnp.einsum("bhwc,bsw->bhsc", features, wx)             # (B, H, os, C)
    return jnp.einsum("bhsc,bth->btsc", rows, wy)                 # (B, os, os, C)


def affine_warp(img: jax.Array, minv: jax.Array, out_size: int,
                rectilinear: bool = False) -> jax.Array:
    """Batched inverse-affine image warp (cv2.warpAffine semantics), NHWC.

    img: (B, H, W, C) float; minv: (B, 2, 3) DST->SRC affine (the inverse of
    the matrix passed to cv2.warpAffine); out_size: P -> (B, P, P, C).
    Bicubic (Keys A=-0.75 == cv2 INTER_CUBIC), zero border, pixel centers at
    integer coordinates (cv2's convention).

    Replaces the loader's per-item host ``cv2.warpAffine`` (data/dexycb.py;
    reference dexycb6.py:339-364) with on-device resampling:

    * ``rectilinear=True`` (no in-plane rotation — every eval crop, and
      train crops when rot aug doesn't trigger): src x depends only on dst
      column and src y only on dst row, so the bicubic kernel is evaluated
      DENSELY over each source axis and applied as two einsum contractions
      — pure MXU work, no gathers (same trick as ``sample_points``).
    * general (rotated train crops): a rotated grid is non-separable as a
      direct tensor product, but the affine factors into TWO 1-D resample
      passes (Catmull & Smith '80 / LU decomposition of the 2x2 block):
      pass 1 x-resamples every SOURCE row at the sheared column positions,
      pass 2 y-resamples the result per output pixel.  Both passes are
      dense-kernel einsums — gather-free (the 16-tap gather form measured
      863 ms/batch on the chip; dense scan-blocked forms compiled for
      minutes and ran seconds).  The composed kernel is a SHEARED cubic
      tensor product rather than cv2's axis-aligned one: identical on the
      axis-aligned case, and within ~2/255 mean (27/255 max on white
      noise) of cv2 INTER_CUBIC under rotation
      (tests/test_device_pipeline.py).  Batch is processed in chunks to
      bound the dense-weight footprint (~1.3 GB bf16 per 8 samples).
    """
    B, H, W, C = img.shape
    P = out_size
    jj = jnp.arange(P, dtype=jnp.float32)
    if rectilinear:
        xs = minv[:, 0, 0, None] * jj + minv[:, 0, 2, None]      # (B, P)
        ys = minv[:, 1, 1, None] * jj + minv[:, 1, 2, None]      # (B, P)
        wx = _keys_kernel(jnp.arange(W, dtype=xs.dtype) - xs[..., None])
        wy = _keys_kernel(jnp.arange(H, dtype=ys.dtype) - ys[..., None])
        rows = jnp.einsum("bhwc,bsw->bhsc", img, wx)
        return jnp.einsum("bhsc,bth->btsc", rows, wy)
    hh = jnp.arange(H, dtype=jnp.float32)
    ww = jnp.arange(W, dtype=jnp.float32)
    ii = jnp.arange(P, dtype=jnp.float32)
    bf = jnp.bfloat16
    chunk = min(B, 8)
    outs = []
    for b0 in range(0, B, chunk):
        b1 = min(B, b0 + chunk)
        m = minv[b0:b1]
        m00, m01, m02 = m[:, 0, 0, None, None], m[:, 0, 1, None, None], m[:, 0, 2, None, None]
        m10, m11, m12 = m[:, 1, 0, None, None], m[:, 1, 1, None, None], m[:, 1, 2, None, None]
        # pass 1: for source row h and output column j, the output row that
        # lands on h is i(h,j) = (h - m12 - m10 j)/m11 (m11 = cos/scale > 0
        # for |rot| < 90 deg); x-center follows the sheared column
        i_of = (hh[None, :, None] - m12 - m10 * jj[None, None, :]) / m11
        xc = m00 * jj[None, None, :] + m01 * i_of + m02           # (b,H,P)
        w1 = _keys_kernel(ww[None, None, None] - xc[..., None])   # (b,H,P,W)
        T = jnp.einsum("bhwc,bhjw->bhjc", img[b0:b1].astype(bf),
                       w1.astype(bf), preferred_element_type=jnp.float32)
        # pass 2: y-resample at the exact source row of each output pixel
        ys = m10 * jj[None, None, :] + m11 * ii[None, :, None] + m12
        w2 = _keys_kernel(hh[None, None, None] - ys[..., None])   # (b,P,P,H)
        outs.append(jnp.einsum("bhjc,bijh->bijc", T.astype(bf),
                               w2.astype(bf),
                               preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """NCHW bilinear resize, align_corners=False (torch F.interpolate)."""
    B, C, H, W = x.shape
    out = jax.image.resize(x, (B, C, size[0], size[1]), method="bilinear")
    return out
