"""ODE step-count sensitivity study on the REFERENCE's own torch denoiser.

Same methodology as tests/test_torch_parity.py::
test_ode_sampler_vs_reference_cond_ode_sampler — random 0.05-scale weights
imported into the Flax denoiser, ground truth = scipy RK45 at rtol=1e-9 on
the torch module, comparison band = the reference cond_ode_sampler's OWN
error at its blessed 50-step t_eval grid.  Prints the end-state error of
dpm2m / dpm3m at several step counts so a reduced-step promotion can be
judged by the established rule (err < 1.2 x the reference's RK45 error).

Pure CPU (torch + scipy + JAX cpu); no TPU needed.
"""
import json
import sys
import types

import numpy as np

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import torch

_ipdb = types.ModuleType("ipdb")
_ipdb.set_trace = lambda *a, **k: None
sys.modules.setdefault("ipdb", _ipdb)
_tv = types.ModuleType("torchvision")
_tv.ops = types.ModuleType("torchvision.ops")
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.ops", _tv.ops)
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

_argv = sys.argv
sys.argv = [sys.argv[0]]
try:
    from lib.model.denoiser import BaseDenoiser as TorchDenoiser
    from lib.model.score_based_model import cond_ode_sampler
    from lib.model.sde import init_sde as torch_init_sde
finally:
    sys.argv = _argv

import jax
import jax.numpy as jnp
from scipy import integrate

from vpho_tpu.diffusion.sampler import ode_sampler
from vpho_tpu.diffusion.sde import init_sde
from vpho_tpu.models.denoiser import Denoiser

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
from test_torch_parity import (import_submodule, mini_vars, randomize_,
                               unnest)  # noqa: E402

torch.manual_seed(0)


def main():
    prior_fn, marginal_prob_fn, sde_fn, eps, _T = torch_init_sde("ve")
    tden = randomize_(TorchDenoiser(marginal_prob_fn, head="obj").eval())

    B, dim, T0 = 6, 9, 0.65
    feat = np.random.RandomState(7).randn(B, 1024).astype(np.float32)

    model = Denoiser(head="obj")
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feat),
                           jnp.zeros((B, dim)), jnp.full((B, 1), 0.5),
                           jnp.ones((B, 1)))
    full = import_submodule(tden, "denoiser_obj",
                            mini_vars("denoiser_obj", variables))
    loaded = unnest(full, "denoiser_obj")
    sde = init_sde("ve")

    def score_fn(x, t):
        _, std = sde.marginal_prob(x, t)
        std = jnp.broadcast_to(jnp.asarray(std), (x.shape[0], 1))
        return model.apply(loaded, jnp.asarray(feat), x, t, std)

    key = jax.random.PRNGKey(11)
    x0 = np.asarray(sde.prior(key, (B, dim), T=T0))
    zero_init = jnp.zeros((B, dim)) - sde.prior(key, (B, dim), T=T0) + x0

    # reference band at its blessed 50 steps
    torch.manual_seed(123)
    probe = prior_fn((B, dim), T=T0)
    torch.manual_seed(123)
    with torch.no_grad():
        _, ref_x = cond_ode_sampler(
            dim, tden, {"feat": torch.from_numpy(feat)}, prior_fn, sde_fn,
            eps=eps, T=T0, num_steps=50,
            init_x=torch.from_numpy(x0) - probe)
    ref_x = ref_x.numpy()

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

    def truth_for(steps):
        # xT + the same final reverse-diffusion predictor step, whose dt
        # depends on the step count — recompute per grid
        with torch.no_grad():
            ve = torch.full((B, 1), eps)
            drift, diff = sde_fn(ve)
            g = tden({"feat": torch.from_numpy(feat),
                      "sampled_pose": torch.from_numpy(xT), "t": ve})
            return (torch.from_numpy(xT)
                    + (drift - diff ** 2 * g) * ((1 - eps) / steps)).numpy()

    err_ref = np.abs(ref_x - truth_for(50)).max()
    print(json.dumps({"solver": "reference_rk45", "steps": 50,
                      "err": round(float(err_ref), 5),
                      "gate": round(float(1.2 * err_ref), 5)}))

    for method in ("dpm2m", "dpm3m", "heun"):
        for steps in (50, 40, 35, 30, 25, 20):
            _, x = ode_sampler(score_fn, key, B, dim, sde, T0, steps,
                               method=method, init_x=zero_init)
            err = np.abs(np.asarray(x) - truth_for(steps)).max()
            print(json.dumps({
                "solver": method, "steps": steps,
                "err": round(float(err), 5),
                "passes_gate": bool(err < 1.2 * err_ref)}), flush=True)


if __name__ == "__main__":
    main()
