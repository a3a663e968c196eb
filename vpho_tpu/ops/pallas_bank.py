"""Fused denoiser bank-MLP (Pallas TPU kernel) for the ODE fast path.

The score network's bank head (reference denoiser.py:34-82; here
``models/denoiser.BankMLPHead``) evaluates, per ODE step,

    out[b, n, :] = relu(p[b] @ Wp[n] + t_term[n] + feat_proj[s(b), n] + b1[n]) @ W2[n] + b2[n]

over R = B*S hypothesis rows and n banks (hand head: n=32, hidden 256 ->
an (R, 32, 256) hidden tensor).  XLA's einsum lowering is a fine pair of
batched GEMMs, but it round-trips that hidden tensor through HBM — at the
blessed shapes (R=6400) that is ~210 MB per score evaluation, ~10.5 GB
over a 50-step DPM-Solver++(2M) sample, the dominant term of the hand-ODE
time (docs/PERF.md).  The r2 fusion attempt lost to serial small-N
per-bank dots (commit aa1c98c); this kernel avoids both problems:

  * rows are laid out (B, S_pad) with S_pad 16-aligned, and the grid maps
    ONE SAMPLE per row-block — the per-sample additive term (t-embedding +
    bias + conditioning projection) is a single broadcast row, no gathers,
    no in-kernel reshapes;
  * layer2 runs as ONE dense block-diagonal dot (n*hidden, n*out) per
    hidden tile — the MXU sees a 96/128-lane GEMM instead of n serial
    3-lane dots (the padding waste is the same, the serialization is gone);
  * the hidden activation lives only in VMEM: the grid's inner axis tiles
    the n*hidden dimension and accumulates layer2 partials into the
    revisited (S_pad, n*out) output block.

HBM traffic per evaluation drops from ~315 MB (bf16 einsum) to ~12 MB
(p + weights + out), leaving the op compute-bound.  Used on the TPU
predict path only (the ODE sampler runs under no-grad); every other
backend and the training loss keep the einsum formulation.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dist import tpu_backend

# (requested, effective) clamp pairs already warned about (one warning each)
_CLAMP_WARNED: set = set()


def _kernel(p_ref, w1_ref, a_ref, w2_ref, b2_ref, out_ref, *, s_pad: int):
    """``G`` samples per cell (G = a_ref block rows).

    p (G*S_pad, C) bf16; w1 (C, ND) bf16; a (G, 1, ND) f32 (3-D so the
    per-sample block keeps its last two dims lowering-legal); w2 (ND, NO)
    bf16; b2 (1, NO) f32; out (G*S_pad, NO) f32.  w1/w2/b2 block indices are
    constant across the grid, so the weights are fetched from HBM once and
    stay VMEM-resident — tiling the hidden axis instead (the first design)
    re-fetched the cycling weight tiles every step, ~270 MB/eval.  G > 1
    packs several samples into one cell: the layer dots see M = G*S_pad
    rows (S=100 pads to 112 — under the 128-row MXU tile at G=1) and the
    grid/DMA overhead amortizes; the per-sample additive term applies via a
    sublane-split reshape (S_pad is 8-aligned, so the split is layout-free).
    """
    g = a_ref.shape[0]
    h = jnp.dot(p_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32)        # (G*S_pad, ND) MXU
    if g > 1:
        h = h.reshape(g, s_pad, h.shape[-1]) + a_ref[...]
        h = jnp.maximum(h, 0.0).astype(p_ref.dtype).reshape(g * s_pad, -1)
    else:
        h = jnp.maximum(h + a_ref[0], 0.0).astype(p_ref.dtype)
    out_ref[...] = jnp.dot(h, w2_ref[...],
                           preferred_element_type=jnp.float32) + b2_ref[...]


@functools.partial(jax.jit, static_argnames=("S", "interpret", "group"))
def _pallas_bank_mlp(p, w1, a, w2bd, b2, S: int, interpret: bool = False,
                     group: int = 1):
    """p (B*S, C) bf16; w1 (C, ND) bf16; a (B, ND) f32; w2bd (ND, NO) bf16
    block-diagonal; b2 (1, NO) f32 -> (B*S, NO) f32."""
    R, C = p.shape
    ND = w1.shape[1]
    NO = w2bd.shape[1]
    B = R // S
    s_pad = max(16, -(-S // 16) * 16)
    if s_pad != S:
        p = jnp.pad(p.reshape(B, S, C), ((0, 0), (0, s_pad - S), (0, 0)))
        p = p.reshape(B * s_pad, C)
    g = group if group > 0 and B % group == 0 else 1
    # VMEM budget per cell at hand-head blessed shapes (G=1): h f32
    # (112, 8192) 3.7 MB + w1 4.2 + w2 1.6 + small double-buffered p/a/out
    # blocks — ~10 MB of the ~16 MB/core (G=2 adds one more h tile)
    grid = (B // g,)
    out = pl.pallas_call(
        functools.partial(_kernel, s_pad=s_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g * s_pad, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, ND), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, ND), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, NO), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NO), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g * s_pad, NO), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * s_pad, NO), jnp.float32),
        interpret=interpret,
    )(p, w1, a[:, None], w2bd, b2)
    if s_pad != S:
        out = out.reshape(B, s_pad, NO)[:, :S].reshape(B * S, NO)
    return out


def clamp_group(group: int, S: int, C: int, n: int, D: int, O: int) -> int:
    """Clamp the samples-per-cell knob against the per-cell VMEM budget.

    The hidden f32 tile (g*s_pad, n*D) dominates the cell footprint;
    weights (w1 + block-diag w2, bf16) are grid-constant; p/a/out blocks
    are double-buffered.  Keep the estimate under ~14 MB of the ~16 MB/core
    — at hand-head blessed shapes the measured-good g=2 sums to ~13 MB and
    stays allowed, while g=4 (hidden tile alone ~14.7 MB, ~21.5 MB total)
    clamps down to 2.
    """
    group = max(1, group)
    s_pad = max(16, -(-S // 16) * 16)
    weight_bytes = 2 * (C * n * D + (n * D) * (n * O))
    while group > 1:
        rows = group * s_pad
        cell_bytes = (4 * rows * n * D            # hidden f32
                      + 2 * 2 * rows * C          # p bf16, double-buffered
                      + 2 * 4 * rows * n * O      # out f32, double-buffered
                      + 2 * 4 * group * n * D     # add f32, double-buffered
                      + weight_bytes)
        if cell_bytes <= 14 * 1024 * 1024:
            break
        group -= 1                                # largest size that fits
    return group


def block_diag_w2(w2: jax.Array) -> jax.Array:
    """(n, D, O) layer2 bank weights -> dense block-diagonal (n*D, n*O)."""
    n, D, O = w2.shape
    eye = jnp.eye(n, dtype=w2.dtype)
    # (n, D, n, O): bank k's (D, O) block lands at row-block k, col-block k
    return (eye[:, None, :, None] * w2[:, :, None, :]).reshape(n * D, n * O)


def fused_bank_mlp(pose_feat: jax.Array, w1_pose: jax.Array, add: jax.Array,
                   w2: jax.Array, b2: jax.Array, S: int,
                   use_pallas: bool | None = None,
                   interpret: bool = False,
                   group: int | None = None) -> jax.Array:
    """Fused relu-MLP over banks for the per-sample-conditioning fast path.

    pose_feat: (B*S, C) hypothesis features (sample-major);
    w1_pose:   (n, C, D) layer1 pose-slice bank weights;
    add:       (B, n, D) per-sample additive term (t-embedding + bias1 +
               conditioning feature projection);
    w2:        (n, D, O) layer2 bank weights;  b2: (n, O) bias;
    S:         hypotheses per sample  ->  (B*S, n, O) f32.

    Falls back to the einsum formulation off-TPU (and in interpret-mode
    tests the kernel runs unlowered for parity).
    """
    B, n, D = add.shape
    O = w2.shape[-1]
    if use_pallas is None:
        use_pallas = tpu_backend()
    if not use_pallas and not interpret:
        h = jnp.einsum("bc,ncd->bnd", pose_feat, w1_pose.astype(pose_feat.dtype))
        h = h.reshape(B, S, n, D) + add[:, None].astype(h.dtype)
        h = jnp.maximum(h, 0.0).reshape(B * S, n, D)
        out = jnp.einsum("bnc,ncd->bnd", h, w2.astype(h.dtype))
        return (out + b2.astype(out.dtype)).astype(jnp.float32)
    cd = jnp.bfloat16
    if group is None:
        # 2 samples/cell by default: S=100 pads to 112 rows — under the
        # 128-row MXU tile — so packing lifts utilization (0.453 -> 0.423
        # ms/eval measured at blessed shapes; g=4 is flat).  Non-divisible
        # batches fall back to the 1-sample grid inside _pallas_bank_mlp.
        # Safe range: 1-2 at hand-head shapes; larger values are clamped
        # against the VMEM budget below (g=4 already puts the f32 hidden
        # tile at ~14.7 MB — at/over the ~16 MB/core budget).
        raw = os.environ.get("VPHO_BANK_GROUP", "2")
        try:
            group = int(raw)
        except ValueError:
            import warnings

            warnings.warn(f"VPHO_BANK_GROUP={raw!r} is not an integer; "
                          "using the default of 2")
            group = 2
    requested = group
    group = clamp_group(group, S, pose_feat.shape[-1], n, D, O)
    if group < requested and (requested, group) not in _CLAMP_WARNED:
        # one-time loud signal: a user benchmarking VPHO_BANK_GROUP=4 must
        # be able to tell the kernel actually ran at a smaller group (the
        # VMEM formula in clamp_group is an estimate, not the compiler's)
        _CLAMP_WARNED.add((requested, group))
        import warnings

        warnings.warn(
            f"fused_bank_mlp: requested group={requested} exceeds the "
            f"estimated ~14 MB/core VMEM budget at these shapes; clamped "
            f"to group={group}", stacklevel=2)
    w1_flat = jnp.transpose(w1_pose, (1, 0, 2)).reshape(w1_pose.shape[1], n * D)
    out = _pallas_bank_mlp(
        pose_feat.astype(cd), w1_flat.astype(cd),
        add.reshape(B, n * D).astype(jnp.float32),
        block_diag_w2(w2).astype(cd),
        b2.reshape(1, n * O).astype(jnp.float32),
        S, interpret=interpret, group=group)
    return out.reshape(B * S, n, O)
