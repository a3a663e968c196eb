"""Parity tests for the fused bank-MLP Pallas kernel (ops/pallas_bank.py).

The kernel runs in interpret mode on CPU; the reference is the einsum
formulation the module uses off-TPU (itself parity-pinned against the
reference torch denoiser in test_torch_parity.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpho_tpu.ops.pallas_bank import block_diag_w2, clamp_group, fused_bank_mlp


def _einsum_ref(p, w1p, add, w2, b2, S):
    B, n, D = add.shape
    h = jnp.einsum("bc,ncd->bnd", p, w1p)
    h = h.reshape(B, S, n, D) + add[:, None]
    h = jnp.maximum(h, 0.0).reshape(B * S, n, D)
    return jnp.einsum("bnc,ncd->bnd", h, w2) + b2


def _case(key, B, S, n, D, O, C=256):
    ks = jax.random.split(key, 5)
    p = jax.random.normal(ks[0], (B * S, C), jnp.float32)
    w1p = jax.random.normal(ks[1], (n, C, D), jnp.float32) * 0.05
    add = jax.random.normal(ks[2], (B, n, D), jnp.float32)
    w2 = jax.random.normal(ks[3], (n, D, O), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (n, O), jnp.float32) * 0.1
    return p, w1p, add, w2, b2


def test_block_diag_w2():
    w2 = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
    bd = block_diag_w2(w2)
    assert bd.shape == (6, 4)
    np.testing.assert_array_equal(np.asarray(bd[:3, :2]), np.asarray(w2[0]))
    np.testing.assert_array_equal(np.asarray(bd[3:, 2:]), np.asarray(w2[1]))
    np.testing.assert_array_equal(np.asarray(bd[:3, 2:]), 0.0)
    np.testing.assert_array_equal(np.asarray(bd[3:, :2]), 0.0)


@pytest.mark.parametrize("B,S,n,D,O", [
    (3, 16, 4, 256, 3),    # 16-aligned S: no row padding
    (2, 5, 4, 256, 3),     # S < 16: padded to the minimum row tile
    (2, 20, 2, 384, 3),    # S padded 20 -> 32; single hidden tile (768)
    (1, 100, 8, 256, 3),   # blessed-S geometry, hidden tiled 2048
])
def test_fused_matches_einsum(B, S, n, D, O):
    p, w1p, add, w2, b2 = _case(jax.random.PRNGKey(0), B, S, n, D, O)
    ref = _einsum_ref(p.astype(jnp.bfloat16), w1p.astype(jnp.bfloat16),
                      add, w2.astype(jnp.bfloat16), b2, S).astype(jnp.float32)
    got = fused_bank_mlp(p, w1p, add, w2, b2, S,
                         use_pallas=True, interpret=True)
    assert got.shape == (B * S, n, O)
    # kernel accumulates in f32 where the bf16 einsum path rounds between
    # ops — bf16-level agreement is the contract
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.03, atol=0.03)


def test_fused_f32_exactish():
    # interpret mode casts to bf16 inside fused_bank_mlp; against an f32
    # einsum the error must stay at bf16 rounding scale, not blow up with
    # the hidden-tile accumulation order
    p, w1p, add, w2, b2 = _case(jax.random.PRNGKey(7), 2, 100, 8, 256, 3)
    ref = _einsum_ref(p, w1p, add, w2, b2, 100)
    got = fused_bank_mlp(p, w1p, add, w2, b2, 100,
                         use_pallas=True, interpret=True)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02, err.max() / scale


@pytest.mark.parametrize("group", [2, 4])
def test_fused_group_matches_einsum(group):
    # multi-sample-per-cell packing (VPHO_BANK_GROUP) must be a pure layout
    # change: same outputs as the one-sample grid
    B, S, n, D, O = 4, 20, 4, 256, 3
    p, w1p, add, w2, b2 = _case(jax.random.PRNGKey(11), B, S, n, D, O)
    ref = fused_bank_mlp(p, w1p, add, w2, b2, S,
                         use_pallas=True, interpret=True, group=1)
    got = fused_bank_mlp(p, w1p, add, w2, b2, S,
                         use_pallas=True, interpret=True, group=group)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_group_nondivisible_falls_back():
    # B=3 not divisible by group=2 -> silently uses the 1-sample grid
    B, S, n, D, O = 3, 16, 4, 256, 3
    p, w1p, add, w2, b2 = _case(jax.random.PRNGKey(13), B, S, n, D, O)
    ref = fused_bank_mlp(p, w1p, add, w2, b2, S,
                         use_pallas=True, interpret=True, group=1)
    got = fused_bank_mlp(p, w1p, add, w2, b2, S,
                         use_pallas=True, interpret=True, group=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_clamp_group_vmem_budget():
    """The VPHO_BANK_GROUP knob is clamped against the per-cell VMEM
    estimate: hand-head blessed shapes (S=100, C=256, n=32, D=256, O=3)
    cap at 2 — g=4's f32 hidden tile alone is ~14.7 MB, over budget."""
    hand = dict(S=100, C=256, n=32, D=256, O=3)
    assert clamp_group(1, **hand) == 1
    assert clamp_group(2, **hand) == 2
    assert clamp_group(4, **hand) == 2      # clamped: cell would spill
    assert clamp_group(64, **hand) == 2
    assert clamp_group(0, **hand) == 1      # floor at 1
    assert clamp_group(-3, **hand) == 1
    # tiny shapes keep whatever the caller asked for
    assert clamp_group(4, S=16, C=256, n=4, D=256, O=3) == 4


def test_fallback_matches_einsum_exactly():
    p, w1p, add, w2, b2 = _case(jax.random.PRNGKey(3), 2, 10, 4, 256, 3)
    ref = _einsum_ref(p, w1p, add, w2, b2, 10).astype(jnp.float32)
    got = fused_bank_mlp(p, w1p, add, w2, b2, 10, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
