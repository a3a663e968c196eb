"""Golden module-level parity vs the REFERENCE's own torch code.

The reference's pure-torch modules (BaseDenoiser, ParallelLinear, sde,
HeadHeatmap2, Encoder, FPN, cond_ode_sampler) are importable on this host
without CUDA or datasets.  These tests instantiate them, import their
state_dicts into our Flax modules through ``torch_import.load_vpho_state_dict``
(the same path --pretrain uses), and assert numerical agreement — the
strongest accuracy evidence obtainable without DexYCB/MANO assets.

Tolerances (recorded per test): elementwise agreement is ~1e-5 (f32
rounding across different op orders); the ODE end-state comparison is
integrator-level (fixed-step RK4 vs adaptive RK45), tolerance 2e-3 relative.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference vendors `ipdb` imports (lib/model/sde.py:6); stub it
_ipdb = types.ModuleType("ipdb")
_ipdb.set_trace = lambda *a, **k: None
sys.modules.setdefault("ipdb", _ipdb)
# torchvision is absent on this host; the reference's FPN file only imports
# `torchvision.ops` (for roi_align, unused by the FPN itself)
_tv = types.ModuleType("torchvision")
_tv.ops = types.ModuleType("torchvision.ops")
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.ops", _tv.ops)
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

try:
    # lib.configs.args (pulled in by score_based_model) parses sys.argv at
    # import time — shield it from pytest's argv
    _argv = sys.argv
    sys.argv = [sys.argv[0]]
    try:
        from lib.model.denoiser import BaseDenoiser as TorchDenoiser
        from lib.model.score_based_model import cond_ode_sampler  # noqa: F401
        from lib.model.sde import init_sde as torch_init_sde
    finally:
        sys.argv = _argv
except Exception:  # reference tree not mounted
    pytestmark = pytest.mark.skip(reason="reference tree unavailable")

import jax
import jax.numpy as jnp

from vpho_tpu.diffusion.sampler import ode_sampler
from vpho_tpu.diffusion.sde import init_sde
from vpho_tpu.models.denoiser import Denoiser
from vpho_tpu.models.layers import Encoder, HeadHeatmap, TransformerEncoderLayer
from vpho_tpu.utils.torch_import import (export_vpho_state_dict,
                                          load_vpho_state_dict)

torch.manual_seed(0)


def randomize_(module, scale=0.05):
    """Give every parameter a nonzero random value (the reference
    zero-inits final head layers, which would make score tests vacuous)."""
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn_like(p) * scale)
    return module


def import_submodule(torch_module, prefix, flax_variables):
    """Prefix the torch module's state_dict and run the full importer."""
    sd = {f"{prefix}.{k}": v.numpy() for k, v in torch_module.state_dict().items()}
    new_vars, report = load_vpho_state_dict(flax_variables, sd)
    assert not report["unconsumed"], report["unconsumed"]
    return new_vars


def mini_vars(prefix, variables):
    """Build a single-submodule variables nest as the importer expects."""
    return {
        "params": {prefix: variables["params"]},
        "batch_stats": {prefix: variables["batch_stats"]}
        if "batch_stats" in variables else {},
        "buffers": {prefix: variables["buffers"]}
        if "buffers" in variables else {},
    }


def unnest(variables, prefix):
    out = {}
    for coll, tree in variables.items():
        if prefix in tree:
            out[coll] = tree[prefix]
    return out


# ---------------------------------------------------------------------------
# denoiser + SDE + sampler
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("head,flax_head,dim", [("mano_pose", "mano_pose", 96),
                                                ("obj", "obj", 9)])
def test_denoiser_score_parity(head, flax_head, dim):
    _, marginal_prob_fn, _, eps, _ = torch_init_sde("ve")
    tden = randomize_(TorchDenoiser(marginal_prob_fn, head=head).eval())

    model = Denoiser(head=flax_head)
    B = 4
    feat = np.random.RandomState(1).randn(B, 1024).astype(np.float32)
    pose = np.random.RandomState(2).randn(B, dim).astype(np.float32)
    t = np.random.RandomState(3).uniform(0.05, 0.95, (B, 1)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                           jnp.asarray(pose), jnp.asarray(t), jnp.ones((B, 1)))
    prefix = "denoiser_hand" if head == "mano_pose" else "denoiser_obj"
    full = import_submodule(tden, prefix, mini_vars(prefix, variables))
    loaded = unnest(full, prefix)

    sde = init_sde("ve")
    _, std = sde.marginal_prob(jnp.asarray(pose), jnp.asarray(t))
    std = jnp.broadcast_to(jnp.asarray(std), (B, 1))
    ours = model.apply(loaded, jnp.asarray(feat), jnp.asarray(pose),
                       jnp.asarray(t), std)

    with torch.no_grad():
        theirs = tden({"feat": torch.from_numpy(feat),
                       "sampled_pose": torch.from_numpy(pose),
                       "t": torch.from_numpy(t)}).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-5)

    # fast path (precomputed conditioning projection) is exact algebra
    proj = model.apply(loaded, jnp.asarray(feat), method=Denoiser.precompute_feat)
    fast = model.apply(loaded, proj, jnp.asarray(pose), jnp.asarray(t), std,
                       method=Denoiser.score_from_proj)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ours),
                               rtol=1e-5, atol=1e-6)


def test_sde_marginal_prob_parity():
    """VE marginal std sigma_min*(sigma_max/sigma_min)^t matches torch."""
    _, t_marginal, t_sde, t_eps, _T = torch_init_sde("ve")
    sde = init_sde("ve")
    assert abs(sde.eps - t_eps) < 1e-12
    for tv in [0.01, 0.3, 0.65, 1.0]:
        x = torch.zeros(2, 4)
        _, tstd = t_marginal(x, torch.full((2, 1), tv))
        _, jstd = sde.marginal_prob(jnp.zeros((2, 4)), jnp.full((2, 1), tv))
        np.testing.assert_allclose(np.asarray(jstd).ravel()[0],
                                   tstd.numpy().ravel()[0], rtol=1e-5)
        tdrift, tdiff = t_sde(torch.tensor(tv))
        jdrift, jdiff = sde.sde(jnp.asarray(tv))
        np.testing.assert_allclose(float(jdiff), float(tdiff), rtol=1e-5)
        np.testing.assert_allclose(float(jdrift), float(tdrift), atol=1e-7)


def test_ode_sampler_vs_reference_cond_ode_sampler():
    """Sampler accuracy vs the TRUE reverse ODE solution, with the
    reference's own cond_ode_sampler as the comparison band.

    Both samplers approximate the same ODE: the reference with adaptive
    scipy RK45 at loose tolerances (rtol=3e-3/atol=3e-4,
    score_based_model.py:91), ours with fixed-step RK4/Heun at the blessed
    50 steps.  Ground truth = scipy RK45 at rtol=1e-9 on the SAME torch
    denoiser.  Measured (recorded 2026-08-16, random 0.05-scale weights,
    obj head, T0=0.65): truth scale 2.81, reference err 0.046,
    rk4@50 err 0.011 (4x closer than the reference), heun@50 err 0.036
    (inside the reference's own error band) — the heun promotion evidence.
    """
    from scipy import integrate

    prior_fn, marginal_prob_fn, sde_fn, eps, _T = torch_init_sde("ve")
    tden = randomize_(TorchDenoiser(marginal_prob_fn, head="obj").eval())

    B, dim, T0, steps = 6, 9, 0.65, 50
    feat = np.random.RandomState(7).randn(B, 1024).astype(np.float32)

    model = Denoiser(head="obj")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                           jnp.zeros((B, dim)), jnp.full((B, 1), 0.5),
                           jnp.ones((B, 1)))
    full = import_submodule(tden, "denoiser_obj", mini_vars("denoiser_obj", variables))
    loaded = unnest(full, "denoiser_obj")

    sde = init_sde("ve")

    def score_fn(x, t):
        _, std = sde.marginal_prob(x, t)
        std = jnp.broadcast_to(jnp.asarray(std), (x.shape[0], 1))
        return model.apply(loaded, jnp.asarray(feat), x, t, std)

    # identical starting state everywhere: draw our prior, then cancel the
    # reference's in-function prior draw with a same-seed probe
    key = jax.random.PRNGKey(11)
    x0 = np.asarray(sde.prior(key, (B, dim), T=T0))
    zero_init = jnp.zeros((B, dim)) - sde.prior(key, (B, dim), T=T0) + x0

    ours = {}
    for method in ("rk4", "heun", "dpm2m", "dpm3m"):
        traj, x = ode_sampler(score_fn, key, B, dim, sde, T0, steps,
                              method=method, init_x=zero_init)
        assert np.allclose(np.asarray(traj[:, 0]), x0, atol=1e-5)
        ours[method] = np.asarray(x)
    # reduced-step study (report + gate): the pipeline is HBM-bound on
    # per-eval reads, so fewer grid transitions are a direct throughput
    # lever IF fidelity holds — measured against the same truth below
    for method in ("dpm2m", "dpm3m"):
        for rsteps in (25, 32):
            _, x = ode_sampler(score_fn, key, B, dim, sde, T0, rsteps,
                               method=method, init_x=zero_init)
            ours[f"{method}@{rsteps}"] = np.asarray(x)

    # bf16 compute-dtype variant of the same denoiser (params stay f32):
    # the promotion gate for --compute_dtype bfloat16 on the eval path
    model_bf16 = Denoiser(head="obj", dtype=jnp.bfloat16)

    def score_fn_bf16(x, t):
        _, std = sde.marginal_prob(x, t)
        std = jnp.broadcast_to(jnp.asarray(std), (x.shape[0], 1))
        return model_bf16.apply(loaded, jnp.asarray(feat), x, t, std)

    _, x_bf16 = ode_sampler(score_fn_bf16, key, B, dim, sde, T0, steps,
                            method="heun", init_x=zero_init)
    ours["heun_bf16"] = np.asarray(x_bf16)
    _, x_dpm_bf16 = ode_sampler(score_fn_bf16, key, B, dim, sde, T0, steps,
                                method="dpm2m", init_x=zero_init)
    ours["dpm2m_bf16"] = np.asarray(x_dpm_bf16)
    _, x_dpm3_bf16 = ode_sampler(score_fn_bf16, key, B, dim, sde, T0, steps,
                                 method="dpm3m", init_x=zero_init)
    ours["dpm3m_bf16"] = np.asarray(x_dpm3_bf16)

    torch.manual_seed(123)
    probe = prior_fn((B, dim), T=T0)
    torch.manual_seed(123)
    with torch.no_grad():
        _, ref_x = cond_ode_sampler(
            dim, tden, {"feat": torch.from_numpy(feat)}, prior_fn, sde_fn,
            eps=eps, T=T0, num_steps=steps,
            init_x=torch.from_numpy(x0) - probe)
    ref_x = ref_x.numpy()

    # ground truth: tight-tolerance RK45 on the torch denoiser + the same
    # final reverse-diffusion predictor step both samplers apply
    def ode_func(t, x):
        xx = torch.from_numpy(x.reshape(-1, dim).astype(np.float32))
        ts = torch.full((B, 1), float(t))
        with torch.no_grad():
            s = tden({"feat": torch.from_numpy(feat),
                      "sampled_pose": xx, "t": ts}).numpy()
        drift, diff = sde_fn(torch.tensor(t))
        return (drift.numpy() - 0.5 * (diff.numpy() ** 2) * s).reshape(-1)

    sol = integrate.solve_ivp(ode_func, (T0, eps),
                              x0.reshape(-1).astype(np.float64),
                              rtol=1e-9, atol=1e-11, method="RK45")
    xT = sol.y[:, -1].reshape(B, dim).astype(np.float32)
    with torch.no_grad():
        ve = torch.full((B, 1), eps)
        drift, diff = sde_fn(ve)
        g = tden({"feat": torch.from_numpy(feat),
                  "sampled_pose": torch.from_numpy(xT), "t": ve})

        def truth_for(n):
            # the final reverse-diffusion predictor step's dt depends on the
            # step count — reduced-step runs get a matching truth
            return (torch.from_numpy(xT)
                    + (drift - diff ** 2 * g) * ((1 - eps) / n)).numpy()

        truth = truth_for(steps)

    err_ref = np.abs(ref_x - truth).max()
    err_rk4 = np.abs(ours["rk4"] - truth).max()
    err_heun = np.abs(ours["heun"] - truth).max()
    err_dpm = np.abs(ours["dpm2m"] - truth).max()
    err_dpm3 = np.abs(ours["dpm3m"] - truth).max()
    err_bf16 = np.abs(ours["heun_bf16"] - truth).max()
    reduced = {k: np.abs(v - truth_for(int(k.split("@")[1]))).max()
               for k, v in ours.items() if "@" in k}
    print(f"ode errs vs truth: ref_rk45={err_ref:.4f} rk4@50={err_rk4:.4f} "
          f"heun@50={err_heun:.4f} dpm2m@50={err_dpm:.4f} "
          f"dpm3m@50={err_dpm3:.4f} "
          f"heun@50_bf16={err_bf16:.4f} "
          f"dpm2m@50_bf16={np.abs(ours['dpm2m_bf16'] - truth).max():.4f} "
          f"dpm3m@50_bf16={np.abs(ours['dpm3m_bf16'] - truth).max():.4f} "
          + " ".join(f"{k}={v:.4f}" for k, v in sorted(reduced.items())))
    # our default integrator must be at least as faithful as the reference's
    assert err_rk4 < err_ref, (err_rk4, err_ref)
    # heun stays within the reference's own error band (promotion gate)
    assert err_heun < 1.2 * err_ref, (err_heun, err_ref)
    # dpm2m (1 eval/step) must ALSO stay within the reference's band — the
    # promotion gate for --ode_method dpm2m (half heun's score evals)
    assert err_dpm < 1.2 * err_ref, (err_dpm, err_ref)
    # dpm3m shares dpm2m's eval count; its 3rd-order local error must stay
    # inside the same band (the gate the sampler docstring points at),
    # in f32 and under the bf16 compute policy (the eval default)
    assert err_dpm3 < 1.2 * err_ref, (err_dpm3, err_ref)
    err_dpm3_bf16 = np.abs(ours["dpm3m_bf16"] - truth).max()
    assert err_dpm3_bf16 < 1.2 * err_ref, (err_dpm3_bf16, err_ref)
    # the documented rationale for KEEPING 50 steps: every reduced grid
    # fails the same band (measured 2026-08-20: dpm2m@32 0.0725, dpm3m@32
    # 0.0663, @25 ~0.11 vs band 0.0554).  A tripwire, not a gate: if a
    # sampler/jax numeric change ever makes a reduced grid pass the band,
    # WARN loudly (update docs/PERF.md and consider promoting the cheaper
    # grid) rather than fail — an improvement must not break the suite.
    for k, v in reduced.items():
        if v <= 1.2 * err_ref:
            import warnings

            warnings.warn(
                f"reduced ODE grid {k} now PASSES the fidelity band "
                f"({v:.4f} <= {1.2 * err_ref:.4f}) — the 50-step rationale "
                f"in docs/PERF.md is stale; consider promoting this grid")
    # ...and under the bf16 compute policy (the bench default combines
    # dpm2m + bf16; measured 2026-08-19: 0.0375 vs f32 dpm2m 0.0358 —
    # integration error dominates rounding, same story as heun_bf16)
    err_dpm_bf16 = np.abs(ours["dpm2m_bf16"] - truth).max()
    assert err_dpm_bf16 < 1.2 * err_ref, (err_dpm_bf16, err_ref)
    # bf16-compute heun must ALSO stay within the reference's own band —
    # the --compute_dtype bfloat16 eval promotion gate (measured 2026-08-17:
    # err_bf16 0.0381 vs f32 heun 0.0360 vs reference RK45 0.0462 — bf16
    # rounding is buried under the integration error both samplers carry)
    assert err_bf16 < 1.2 * err_ref, (err_bf16, err_ref)


# ---------------------------------------------------------------------------
# conv trunk modules
# ---------------------------------------------------------------------------


def test_head_heatmap_parity():
    """HeadHeatmap2 incl. the ConvTranspose layout/flip convention."""
    from lib.model.head_inplane import HeadHeatmap2

    thead = randomize_(HeadHeatmap2(256, 21, 128).eval())
    model = HeadHeatmap(21, hidden_dim=128)
    x = np.random.RandomState(5).randn(2, 8, 8, 256).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = import_submodule(thead, "head_hm_hand",
                            mini_vars("head_hm_hand", variables))
    loaded = unnest(full, "head_hm_hand")

    ours = model.apply(loaded, jnp.asarray(x))                    # NHWC
    with torch.no_grad():
        theirs = thead(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), theirs,
                               rtol=1e-4, atol=1e-5)


def test_encoder_parity():
    """Encoder (8 Residuals, maxpool halving, channel-major flatten)."""
    from lib.model.encoding import Encoder as TorchEncoder

    tenc = randomize_(TorchEncoder(256 + 21, 256).eval())
    model = Encoder(256)
    x = np.random.RandomState(6).randn(2, 32, 32, 277).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    full = import_submodule(tenc, "encoder_hand",
                            mini_vars("encoder_hand", variables))
    loaded = unnest(full, "encoder_hand")

    out, x_ls = model.apply(loaded, jnp.asarray(x))
    with torch.no_grad():
        tout, tx_ls = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_ls[1]).transpose(0, 3, 1, 2),
                               tx_ls[1].numpy(), rtol=1e-4, atol=1e-4)


def test_fpn_backbone_parity():
    """Dual-stream ResNet-50 FPN end-to-end (random init, eval BN)."""
    from lib.model.backbone_FPN_HFL import FPN as TorchFPN

    from vpho_tpu.models.backbone import FPNBackbone

    tfpn = TorchFPN(pretrained=False).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tfpn.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    model = FPNBackbone()
    x = np.random.RandomState(8).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {f"feature_extractor.{k}": v.numpy() for k, v in tfpn.state_dict().items()}
    loaded_full, report = load_vpho_state_dict(
        mini_vars("feature_extractor", variables), sd)
    assert not report["unconsumed"], report["unconsumed"][:10]
    loaded = unnest(loaded_full, "feature_extractor")

    ph, po = model.apply(loaded, jnp.asarray(x))
    with torch.no_grad():
        tph, tpo = tfpn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ph).transpose(0, 3, 1, 2),
                               tph.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(po).transpose(0, 3, 1, 2),
                               tpo.numpy(), rtol=1e-3, atol=1e-3)


def test_transformer_layer_parity():
    """Weight mapping of torch nn.TransformerEncoderLayer -> our layer.

    Fed in token-correct orientation on both sides (the reference's
    batch-axis feeding is a separate, documented deviation — see
    DEVIATIONS.md)."""
    tlayer = torch.nn.TransformerEncoderLayer(d_model=64, nhead=2,
                                              dim_feedforward=128).eval()
    model = TransformerEncoderLayer(d_model=64, n_heads=2, d_ff=128)
    x = np.random.RandomState(9).randn(2, 7, 64).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {f"cross_hand.attn.layers.0.{k}": v.numpy()
          for k, v in tlayer.state_dict().items()}
    wrap = {"params": {"cross_hand": {"TransformerEncoderLayer_0":
                                      variables["params"]}},
            "batch_stats": {}, "buffers": {}}
    loaded_full, report = load_vpho_state_dict(wrap, sd)
    assert not report["unconsumed"], report["unconsumed"]
    loaded = {"params":
              loaded_full["params"]["cross_hand"]["TransformerEncoderLayer_0"]}

    ours = model.apply(loaded, jnp.asarray(x))
    with torch.no_grad():
        # torch default is sequence-first: (S, B, E)
        theirs = tlayer(torch.from_numpy(x.transpose(1, 0, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs.transpose(1, 0, 2),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# full-checkpoint mapping coverage
# ---------------------------------------------------------------------------


def _full_variable_shapes():
    """eval_shape the full VPHONet variable tree (no compile)."""
    from vpho_tpu.data.fixtures import make_batch
    from vpho_tpu.models import vpho as V
    from vpho_tpu.models.vpho import ModelConfig, VPHONet

    cfg = ModelConfig(sample_num=2, sampling_steps=2, topk_hand=2, topk_obj=2,
                      patch_size=64)
    ctx = V.make_context(cfg)
    model = VPHONet()
    batch = make_batch(ctx, jax.random.PRNGKey(0), batch_size=1, patch_size=64)
    shapes = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch, False))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def test_full_state_dict_mapping():
    """Synthetic full vpho_net state_dict -> every key consumed, removal
    prefixes honored, selected tensors land where expected."""
    from lib.model.encoding import Encoder as TorchEncoder
    from lib.model.head_inplane import HeadHeatmap2

    _, marginal_prob_fn, _, _, _ = torch_init_sde("ve")

    sd = {}
    for side in ("hand", "obj"):
        head = HeadHeatmap2(256, 21 if side == "hand" else 27, 128)
        sd.update({f"head_hm_{side}.{k}": v.numpy()
                   for k, v in head.state_dict().items()})
        enc = TorchEncoder(256 + (21 if side == "hand" else 27), 256)
        sd.update({f"encoder_{side}.{k}": v.numpy()
                   for k, v in enc.state_dict().items()})
        den = TorchDenoiser(marginal_prob_fn,
                            head="mano_pose" if side == "hand" else "obj")
        sd.update({f"denoiser_{side}.{k}": v.numpy()
                   for k, v in den.state_dict().items()})
    # head_mano / head_physics / cross modules via raw tensors
    rs = np.random.RandomState(0)
    sd["head_mano.base_layer.0.weight"] = rs.randn(1024, 1024).astype(np.float32)
    sd["head_mano.base_layer.0.bias"] = rs.randn(1024).astype(np.float32)
    sd["head_mano.base_layer.2.weight"] = rs.randn(512, 1024).astype(np.float32)
    sd["head_mano.base_layer.2.bias"] = rs.randn(512).astype(np.float32)
    sd["head_mano.fc_pose.weight"] = rs.randn(96, 512).astype(np.float32)
    sd["head_mano.fc_pose.bias"] = rs.randn(96).astype(np.float32)
    sd["head_mano.fc_shape.weight"] = rs.randn(10, 512).astype(np.float32)
    sd["head_mano.fc_shape.bias"] = rs.randn(10).astype(np.float32)
    for seq in ("fc_scale", "fc_weight", "fc_CoM"):
        out = {"fc_scale": 1, "fc_weight": 8, "fc_CoM": 3}[seq]
        sd[f"head_physics.{seq}.0.weight"] = rs.randn(512, 512).astype(np.float32)
        sd[f"head_physics.{seq}.0.bias"] = rs.randn(512).astype(np.float32)
        sd[f"head_physics.{seq}.2.weight"] = rs.randn(out, 512).astype(np.float32)
        sd[f"head_physics.{seq}.2.bias"] = rs.randn(out).astype(np.float32)
    for side in ("hand", "obj"):
        t = f"cross_{side}"
        sd[f"{t}.proj_hand.weight"] = rs.randn(256, 256, 3, 3).astype(np.float32)
        sd[f"{t}.proj_hand.bias"] = rs.randn(256).astype(np.float32)
        sd[f"{t}.proj_obj.weight"] = rs.randn(256, 256, 3, 3).astype(np.float32)
        sd[f"{t}.proj_obj.bias"] = rs.randn(256).astype(np.float32)
        sd[f"{t}.gravity_proj.weight"] = rs.randn(512, 63).astype(np.float32)
        sd[f"{t}.gravity_proj.bias"] = rs.randn(512).astype(np.float32)
        tl = torch.nn.TransformerEncoderLayer(d_model=512, nhead=2)
        sd.update({f"{t}.attn.layers.0.{k}": v.numpy()
                   for k, v in tl.state_dict().items()})

    variables = _full_variable_shapes()
    # FPN keys are synthesized separately (covered by test_fpn_backbone_parity);
    # remove_pretrained_keys drops the denoiser_obj branch
    new_vars, report = load_vpho_state_dict(
        variables, sd, remove_keys=("denoiser_obj",))
    assert not report["unconsumed"], report["unconsumed"][:10]
    assert "denoiser_obj.t_encoder.1" not in report["imported"]
    # removed prefix stays at init value (zeros here)
    assert np.all(new_vars["params"]["denoiser_obj"]["t_dense"]["kernel"] == 0)
    # a mapped tensor landed (torch Linear weight transposed)
    np.testing.assert_array_equal(
        new_vars["params"]["head_mano"]["Dense_2"]["kernel"],
        sd["head_mano.fc_pose.weight"].T)
    # missing FPN keys were tolerated (strict=False semantics)
    assert any(k.startswith("feature_extractor") for k in report["missing"])


def test_export_state_dict_round_trip():
    """export_vpho_state_dict is the exact inverse of load_vpho_state_dict.

    Randomized full variables -> torch-format state_dict -> re-import into a
    zeroed tree -> every mapped leaf lands back bit-identically (a layout
    mistake — a missed transpose, an unflipped deconv, a bad MHA packing —
    cannot hide in zeros).  Exported keys also load into the reference's own
    torch modules with strict=True, so a reference user can consume a
    checkpoint trained here."""
    import flax

    zeros = _full_variable_shapes()
    rs = np.random.RandomState(42)
    rand = {}
    for coll in ("params", "batch_stats", "buffers"):
        flat = flax.traverse_util.flatten_dict(zeros[coll])
        rand[coll] = flax.traverse_util.unflatten_dict(
            {k: rs.randn(*v.shape).astype(np.float32) for k, v in flat.items()})

    sd = export_vpho_state_dict(rand)
    assert len(sd) > 400, len(sd)

    back, report = load_vpho_state_dict(_full_variable_shapes(), sd)
    # the mapping must consume its own output completely
    assert not report["missing"], report["missing"][:10]
    assert not report["unconsumed"], report["unconsumed"][:10]
    for coll in ("params", "batch_stats", "buffers"):
        src = flax.traverse_util.flatten_dict(rand[coll])
        dst = flax.traverse_util.flatten_dict(back[coll])
        diff = [k for k in src
                if not np.array_equal(np.asarray(src[k]), np.asarray(dst[k]))]
        assert not diff, (coll, diff[:10])

    # strict torch-module loads: the exported sub-dicts fit the reference's
    # own modules key-for-key and shape-for-shape
    from lib.model.encoding import Encoder as TorchEncoder
    from lib.model.head_inplane import HeadHeatmap2

    head = HeadHeatmap2(256, 21, 128)
    head.load_state_dict({k[len("head_hm_hand."):]: torch.from_numpy(v.copy())
                          for k, v in sd.items()
                          if k.startswith("head_hm_hand.")}, strict=True)
    enc = TorchEncoder(256 + 27, 256)
    enc.load_state_dict({k[len("encoder_obj."):]: torch.from_numpy(v.copy())
                         for k, v in sd.items()
                         if k.startswith("encoder_obj.")}, strict=True)
    _, marginal_prob_fn, _, _, _ = torch_init_sde("ve")
    den = TorchDenoiser(marginal_prob_fn, head="mano_pose")
    den.load_state_dict({k[len("denoiser_hand."):]: torch.from_numpy(v.copy())
                         for k, v in sd.items()
                         if k.startswith("denoiser_hand.")}, strict=True)
    tl = torch.nn.TransformerEncoderLayer(d_model=512, nhead=2)
    tl.load_state_dict({k[len("cross_hand.attn.layers.0."):]: torch.from_numpy(v.copy())
                        for k, v in sd.items()
                        if k.startswith("cross_hand.attn.layers.0.")}, strict=True)


# ---------------------------------------------------------------------------
# transform_fn numerics (reference lib/utils/transform_fn.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_transform_fn():
    """Import the reference's transform_fn with pytorch3d stubbed.

    Its module-level pytorch3d import pulls only matrix_to_rotation_6d /
    rotation_6d_to_matrix, used by obj_9D_to_mat/obj_mat_to_9D — which we
    don't exercise here; stub them so the pure torch/numpy functions load.
    """
    p3d = types.ModuleType("pytorch3d")
    p3d_t = types.ModuleType("pytorch3d.transforms")
    p3d_t.matrix_to_rotation_6d = None
    p3d_t.rotation_6d_to_matrix = None
    p3d.transforms = p3d_t
    saved = {k: sys.modules.get(k) for k in ("pytorch3d", "pytorch3d.transforms")}
    sys.modules["pytorch3d"] = p3d
    sys.modules["pytorch3d.transforms"] = p3d_t
    try:
        import importlib

        import lib.utils.transform_fn as ref_tf
        importlib.reload(ref_tf)
        yield ref_tf
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_average_quaternion_parity(ref_transform_fn):
    """Ours (both impls) vs the reference's torch eigh implementation
    (transform_fn.py:101-125) on realistic clustered candidates."""
    from vpho_tpu.utils import transforms as T

    rs = np.random.RandomState(11)
    base = rs.randn(64, 4)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    qs = (base[:, None] + 0.2 * rs.randn(64, 15, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    w = (rs.rand(64, 15).astype(np.float32) + 0.05)

    ref = ref_transform_fn.average_quaternion(
        torch.from_numpy(qs), torch.from_numpy(w)).numpy()
    ours_eigh = np.asarray(T.average_quaternion(
        jnp.asarray(qs), jnp.asarray(w), impl="eigh"))
    ours_pow = np.asarray(T.average_quaternion(
        jnp.asarray(qs), jnp.asarray(w), impl="power"))
    # eigenvectors are sign/phase-fixed by both apis (real part > 0);
    # compare as rotations via |dot|
    for ours in (ours_eigh, ours_pow):
        dots = np.abs((ref * ours).sum(-1))
        assert dots.min() > 1 - 1e-4, dots.min()


def test_rigid_align_parity(ref_transform_fn):
    """Umeyama alignment vs the reference's rigid_align_AtoB
    (transform_fn.py:43-66, HFL-derived; drives PA-MJE/PA-MVE)."""
    from vpho_tpu.utils import transforms as T

    rs = np.random.RandomState(12)
    A = rs.randn(21, 3).astype(np.float64)
    # B = similarity transform of A plus noise
    ang = rs.randn(3)
    Rm = np.asarray(T.axis_angle_to_matrix(jnp.asarray(ang[None])))[0]
    B = 1.7 * A @ Rm.T + np.array([0.1, -0.2, 0.05]) + 0.01 * rs.randn(21, 3)

    ref = ref_transform_fn.rigid_align_AtoB(A, B)
    ours = np.asarray(T.rigid_align(jnp.asarray(A[None]), jnp.asarray(B[None]))[0])
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_projection_parity(ref_transform_fn):
    from vpho_tpu.utils import transforms as T

    rs = np.random.RandomState(13)
    pt = rs.randn(4, 21, 3).astype(np.float32)
    pt[..., 2] += 5.0
    K = np.tile(np.array([[475.0, 0, 316], [0, 475.0, 244], [0, 0, 1]],
                         np.float32), (4, 1, 1))
    ref = ref_transform_fn.project_pt3d_to_pt2d(
        torch.from_numpy(pt), torch.from_numpy(K)).numpy()
    ours = np.asarray(T.project_pt3d_to_pt2d(jnp.asarray(pt), jnp.asarray(K)))
    np.testing.assert_allclose(ours, ref, atol=1e-3)

    uvd = np.concatenate([ref, pt[..., 2:]], axis=-1)
    ref_xyz = ref_transform_fn.inverse_project_uvd_to_xyz(
        torch.from_numpy(uvd), torch.from_numpy(K)).numpy()
    ours_xyz = np.asarray(T.inverse_project_uvd_to_xyz(
        jnp.asarray(uvd), jnp.asarray(K)))
    np.testing.assert_allclose(ours_xyz, ref_xyz, atol=1e-4)
    np.testing.assert_allclose(ours_xyz, pt, atol=1e-3)


def test_matmul_for_rt_parity(ref_transform_fn):
    from vpho_tpu.utils import transforms as T

    rs = np.random.RandomState(14)
    aa = rs.randn(6, 3)
    Rm = np.asarray(T.axis_angle_to_matrix(jnp.asarray(aa)))
    t = rs.randn(6, 3, 1)
    T1 = np.concatenate([Rm[:3], t[:3]], axis=-1).astype(np.float32)
    T2 = np.concatenate([Rm[3:], t[3:]], axis=-1).astype(np.float32)
    ref = ref_transform_fn.matmul_for_rt(
        torch.from_numpy(T1), torch.from_numpy(T2)).numpy()
    ours = np.asarray(T.matmul_for_rt(jnp.asarray(T1), jnp.asarray(T2)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cross_module_batch_axis_parity():
    """D1 compat (DEVIATIONS.md): CrossModule(attention_axis='batch') must
    reproduce the reference's CrossModule bit-for-bit with imported weights —
    including its batch-axis attention (sequence-first TransformerEncoder
    feed) and sample-indexed positional encoding (cross_module.py:104-134).
    This makes reference-checkpoint inference faithful end to end."""
    from lib.model.cross_module import CrossModule as TorchCross

    from vpho_tpu.models.heads import CrossModule

    tmod = TorchCross(in_HW=8, hid_dim=512).eval()
    randomize_(tmod)
    model = CrossModule(hid_dim=512, attention_axis="batch")

    rs = np.random.RandomState(3)
    B = 3
    xh = rs.randn(B, 8, 8, 256).astype(np.float32)
    xo = rs.randn(B, 8, 8, 256).astype(np.float32)
    g = rs.randn(B, 1, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xh),
                           jnp.asarray(xo), jnp.asarray(g))

    sd = {f"cross_hand.{k}": v.numpy() for k, v in tmod.state_dict().items()}
    wrap = {"params": {"cross_hand": variables["params"]},
            "batch_stats": {}, "buffers": {}}
    loaded_full, report = load_vpho_state_dict(wrap, sd)
    assert not report["unconsumed"], report["unconsumed"]
    loaded = {"params": loaded_full["params"]["cross_hand"]}

    yh, yo, yg = model.apply(loaded, jnp.asarray(xh), jnp.asarray(xo),
                             jnp.asarray(g))
    with torch.no_grad():
        th, to_, tg = tmod(
            torch.from_numpy(np.ascontiguousarray(xh.transpose(0, 3, 1, 2))),
            torch.from_numpy(np.ascontiguousarray(xo.transpose(0, 3, 1, 2))),
            torch.from_numpy(g))
    np.testing.assert_allclose(np.asarray(yh), th.numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yo), to_.numpy(), rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yg), tg.numpy(), rtol=1e-4, atol=2e-4)
