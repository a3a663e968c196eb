"""On-device probability-flow ODE sampler + denoising score-matching loss.

This replaces the reference's #1 hot loop and #1 host<->device boundary:
``cond_ode_sampler`` (lib/model/score_based_model.py:45-105) integrates the
reverse ODE with **scipy RK45 on CPU**, round-tripping every RHS evaluation
GPU->CPU->GPU.  Here the whole trajectory is one ``lax.scan`` over a fixed
step grid, fully jitted and batched over (batch x sample_num) hypotheses on
the TPU — zero host transfers.

Fidelity note (SURVEY.md §7 "hard parts"): RK45 is adaptive between the
``t_eval`` grid points; a fixed-step integrator differs bitwise but matches at
the metric level.  The framework's eval default is DPM-Solver++(3M) (one
score eval per step at 3rd order — the r4 promotion, see ``_dpm3m_scan``);
``method`` also supports 'dpm2m', classic 'rk4' (4 evals/step, this
function's own parameter default and the most faithful option), 'heun'
(2 evals) and 'euler' (1 eval) for speed/quality trades.

The score-matching loss vectorizes the reference's serial ``repeat_num`` loop
(score_based_model.py:117-128) into a single batched denoiser call.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .sde import SDE

ScoreFn = Callable[[jax.Array, jax.Array], jax.Array]  # (x:(B,D), t:(B,1)) -> (B,D)


def _ode_rhs(score_fn: ScoreFn, sde: SDE, x: jax.Array, t: jax.Array) -> jax.Array:
    """dx/dt = f(x,t) - 0.5 g(t)^2 score(x,t).

    For the default VE SDE the drift coefficient is 0, matching the reference
    exactly (score_based_model.py:74-83).  For vp/subvp we apply the correct
    state-dependent drift ``drift_coeff * x`` (the reference adds the bare
    scalar coefficient — a latent bug on its never-used non-VE path).
    """
    drift_coeff, diffusion = sde.sde(t)
    # the step time is ONE scalar shared by every hypothesis: pass it as
    # (1, 1) so the denoiser's t-encoder + bank t-slice compute once per
    # step and broadcast (exact algebra; see BankMLPHead docstring)
    score = score_fn(x, jnp.reshape(t, (1, 1)))
    score = jnp.nan_to_num(score, nan=0.0, posinf=0.0, neginf=0.0)  # ref :69-71
    return drift_coeff * x - 0.5 * (diffusion**2) * score


def time_grid(sde: SDE, T0: float, num_steps: int, schedule: str = "uniform",
              rho: float = 7.0) -> jax.Array:
    """Integration grid t_0=T0 > ... > t_{n-1}=eps.

    'uniform': the reference's ``linspace(T0, eps, n)`` (t_eval grid,
    score_based_model.py:88-91).  'karras': rho-spaced in sigma
    (Karras et al. 2022 eq. 5) mapped back through the SDE's own
    sigma(t) = marginal std — denser near low noise where the flow bends
    most, so the same fidelity needs fewer fixed steps.  SDE-agnostic: the
    sigma->t inverse is a dense-grid interpolation, computed at trace time.
    """
    if schedule == "uniform":
        return jnp.linspace(T0, sde.eps, num_steps)
    if schedule == "karras":
        t_dense = jnp.linspace(sde.eps, T0, 1025)
        s_dense = sde.marginal_prob(jnp.zeros_like(t_dense), t_dense)[1]
        s_dense = jnp.reshape(s_dense, (-1,))
        s_lo, s_hi = s_dense[0], s_dense[-1]
        frac = jnp.linspace(0.0, 1.0, num_steps)
        inv = 1.0 / rho
        sig = (s_hi**inv + frac * (s_lo**inv - s_hi**inv)) ** rho
        return jnp.interp(sig, s_dense, t_dense)
    raise NotImplementedError(schedule)


def _dpm3m_scan(score_fn: ScoreFn, sde: SDE, x0: jax.Array, ts: jax.Array,
                return_trajectory: bool):
    """DPM-Solver++(3M): ONE score eval per grid transition, 3rd order.

    Lu et al. 2022 (arXiv:2211.01095), multistep data-prediction variant at
    order 3: extrapolate the denoised prediction D through the TWO previous
    steps' D values in log-SNR time (Taylor form with phi_2/phi_3
    coefficients).  Transition i -> i+1 (h = lam_{i+1}-lam_i, h0/h1 the two
    previous intervals, r0 = h0/h, r1 = h1/h):

        D1_0 = (D_i - D_{i-1}) / r0
        D1_1 = (D_{i-1} - D_{i-2}) / r1
        D1   = D1_0 + r0/(r0+r1) (D1_0 - D1_1)
        D2   = (D1_0 - D1_1) / (r0+r1)
        x_{i+1} = (sig_{i+1}/sig_i) x_i - alp_{i+1} [phi_1 D_i
                    - phi_2 D1 + phi_3 D2]
        phi_1 = expm1(-h),  phi_2 = phi_1/h + 1,  phi_3 = phi_2/h - 1/2

    (first/second transitions run at order 1/2).  Same score-eval count as
    dpm2m; the h^3 local error tracks the true ODE ~12% tighter at the
    blessed 50-step grid (err 0.0314 vs dpm2m's 0.0358), which promoted it
    to the eval default (r4).  Reduced step grids (25/32) fail the 1.2x
    reference-band rule at every order, so the step count stays at 50 —
    the gate lives in tests/test_torch_parity.py (f32 + bf16 asserts);
    the study numbers are in docs/PERF.md.
    """
    flat = jnp.reshape(ts, (-1,))
    alp = jnp.reshape(sde.marginal_prob(jnp.ones_like(flat), flat)[0], (-1,))
    sig = jnp.reshape(sde.marginal_prob(jnp.zeros_like(flat), flat)[1], (-1,))
    lam = jnp.log(alp) - jnp.log(sig)
    h = lam[1:] - lam[:-1]                                   # (n-1,), > 0
    ones = jnp.ones((1,), h.dtype)
    r0 = jnp.concatenate([ones, h[:-1] / h[1:]])             # h_{i-1}/h_i
    r1 = jnp.concatenate([ones, ones, h[:-2] / h[2:]])       # h_{i-2}/h_i

    def step(carry, i):
        x, d_p1, d_p2 = carry
        score = score_fn(x, jnp.reshape(ts[i], (1, 1)))
        score = jnp.nan_to_num(score, nan=0.0, posinf=0.0, neginf=0.0)
        d = (x + (sig[i] ** 2) * score) / alp[i]
        phi1 = jnp.expm1(-h[i])
        phi2 = phi1 / h[i] + 1.0
        phi3 = phi2 / h[i] - 0.5
        d1_0 = (d - d_p1) / r0[i]
        d1_1 = (d_p1 - d_p2) / r1[i]
        d1 = d1_0 + (r0[i] / (r0[i] + r1[i])) * (d1_0 - d1_1)
        d2 = (d1_0 - d1_1) / (r0[i] + r1[i])
        base = (sig[i + 1] / sig[i]) * x - alp[i + 1] * phi1 * d
        x1 = base                                            # order 1
        x2 = base + alp[i + 1] * phi2 * d1_0                 # order 2 (taylor)
        x3 = base + alp[i + 1] * (phi2 * d1 - phi3 * d2)     # order 3
        x_new = jnp.where(i == 0, x1, jnp.where(i == 1, x2, x3))
        return (x_new, d, d_p1), (x_new if return_trajectory
                                  else jnp.zeros((0,), x.dtype))

    (x_final, _, _), traj = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)),
        jnp.arange(ts.shape[0] - 1))
    return x_final, traj


def _dpm2m_scan(score_fn: ScoreFn, sde: SDE, x0: jax.Array, ts: jax.Array,
                return_trajectory: bool):
    """DPM-Solver++(2M): ONE score eval per grid transition, 2nd order.

    Lu et al. 2022, "DPM-Solver++" (arXiv:2211.01095), multistep
    data-prediction variant: exploit the semi-linear structure of the
    probability-flow ODE by solving the linear part exactly in log-SNR
    time lambda = log(alpha/sigma) and extrapolating the *denoised
    prediction* D = (x + sigma^2 score)/alpha from the previous step for
    2nd-order accuracy.  Per transition i -> i+1 (h_i = lam_{i+1}-lam_i):

        D_ext = (1 + 1/(2 r_i)) D_i - 1/(2 r_i) D_{i-1},  r_i = h_{i-1}/h_i
        x_{i+1} = (sig_{i+1}/sig_i) x_i - alp_{i+1} expm1(-h_i) D_ext

    (first transition falls back to the 1st-order step, which is exact for
    point-mass data).  Halves the score-eval count vs Heun at the same
    grid; the eval pipeline is HBM-bound on per-eval reads (docs/PERF.md),
    so evals, not FLOPs, are the cost.  SDE-agnostic via alpha(t)/sigma(t)
    from ``marginal_prob``; for the default VE SDE alpha == 1.
    """
    flat = jnp.reshape(ts, (-1,))
    alp = jnp.reshape(sde.marginal_prob(jnp.ones_like(flat), flat)[0], (-1,))
    sig = jnp.reshape(sde.marginal_prob(jnp.zeros_like(flat), flat)[1], (-1,))
    lam = jnp.log(alp) - jnp.log(sig)
    h = lam[1:] - lam[:-1]                                   # (n-1,), > 0
    r = jnp.concatenate([jnp.ones((1,), h.dtype), h[:-1] / h[1:]])

    def step(carry, i):
        x, d_prev = carry
        score = score_fn(x, jnp.reshape(ts[i], (1, 1)))
        score = jnp.nan_to_num(score, nan=0.0, posinf=0.0, neginf=0.0)
        d = (x + (sig[i] ** 2) * score) / alp[i]
        c = 0.5 / r[i]
        d_use = jnp.where(i == 0, d, (1.0 + c) * d - c * d_prev)
        x_new = (sig[i + 1] / sig[i]) * x - alp[i + 1] * jnp.expm1(-h[i]) * d_use
        return (x_new, d), (x_new if return_trajectory
                            else jnp.zeros((0,), x.dtype))

    (x_final, _), traj = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0)), jnp.arange(ts.shape[0] - 1))
    return x_final, traj


def ode_sampler(
    score_fn: ScoreFn,
    key: jax.Array,
    batch_size: int,
    pose_dim: int,
    sde: SDE,
    T0: float,
    num_steps: int,
    method: str = "rk4",
    init_x: jax.Array | None = None,
    denoise: bool = True,
    return_trajectory: bool = True,
    schedule: str = "uniform",
) -> Tuple[jax.Array, jax.Array]:
    """Sample poses by integrating the reverse probability-flow ODE.

    Matches reference ``cond_ode_sampler`` semantics: integrate T0 -> sde.eps
    on ``linspace(T0, eps, num_steps)``; optional final reverse-diffusion
    predictor ("denoise") Euler step with dt = (1-eps)/num_steps (:95-104).
    ``schedule='karras'`` swaps the grid spacing (see :func:`time_grid`);
    the integrator itself is unchanged.

    Returns:
      trajectory: (B, num_steps, D) states at each grid point (x(T0) first),
                  or a zero-length axis if return_trajectory is False.
      x_final: (B, D) denoised sample.
    """
    prior = sde.prior(key, (batch_size, pose_dim), T=T0)
    x0 = prior if init_x is None else init_x + prior

    ts = time_grid(sde, T0, num_steps, schedule)

    if method in ("dpm2m", "dpm3m"):
        scan = _dpm2m_scan if method == "dpm2m" else _dpm3m_scan
        x_final, traj = scan(score_fn, sde, x0, ts, return_trajectory)
        if return_trajectory:
            trajectory = jnp.concatenate(
                [x0[:, None], jnp.moveaxis(traj, 0, 1)], axis=1)
        else:
            trajectory = jnp.zeros((batch_size, 0, pose_dim), x0.dtype)
        if denoise:
            x_final = _denoise_step(score_fn, sde, x_final, num_steps)
        return trajectory, x_final

    def step(x, i):
        t0, t1 = ts[i], ts[i + 1]
        h = t1 - t0
        if method == "euler":
            k1 = _ode_rhs(score_fn, sde, x, t0)
            x_new = x + h * k1
        elif method == "heun":
            k1 = _ode_rhs(score_fn, sde, x, t0)
            xe = x + h * k1
            k2 = _ode_rhs(score_fn, sde, xe, t1)
            x_new = x + 0.5 * h * (k1 + k2)
        elif method == "rk4":
            tm = t0 + 0.5 * h
            k1 = _ode_rhs(score_fn, sde, x, t0)
            k2 = _ode_rhs(score_fn, sde, x + 0.5 * h * k1, tm)
            k3 = _ode_rhs(score_fn, sde, x + 0.5 * h * k2, tm)
            k4 = _ode_rhs(score_fn, sde, x + h * k3, t1)
            x_new = x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        else:
            raise NotImplementedError(method)
        return x_new, (x_new if return_trajectory else jnp.zeros((0,), x.dtype))

    x_final, traj = jax.lax.scan(step, x0, jnp.arange(num_steps - 1))

    if return_trajectory:
        trajectory = jnp.concatenate([x0[:, None], jnp.moveaxis(traj, 0, 1)], axis=1)
    else:
        trajectory = jnp.zeros((batch_size, 0, pose_dim), x0.dtype)

    if denoise:
        x_final = _denoise_step(score_fn, sde, x_final, num_steps)

    return trajectory, x_final


def _denoise_step(score_fn: ScoreFn, sde: SDE, x_final: jax.Array,
                  num_steps: int) -> jax.Array:
    """Final reverse-diffusion predictor Euler step (ref :95-104)."""
    t_eps = jnp.asarray(sde.eps, x_final.dtype)
    drift_coeff, diffusion = sde.sde(t_eps)
    score = score_fn(x_final, jnp.full((1, 1), sde.eps, x_final.dtype))
    score = jnp.nan_to_num(score, nan=0.0, posinf=0.0, neginf=0.0)
    drift = drift_coeff * x_final - (diffusion**2) * score  # reverse-SDE drift
    return x_final + drift * ((1.0 - sde.eps) / num_steps)


def score_matching_loss(
    score_fn_with_feat: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    key: jax.Array,
    feat: jax.Array,
    gt_pose: jax.Array,
    sde: SDE,
    repeat_num: int = 20,
) -> jax.Array:
    """Denoising score-matching loss, vectorized over ``repeat_num`` draws.

    Reference loss_fn (score_based_model.py:11-42) averaged over repeat_num
    serial draws (:117-128); here the draws fold into the batch axis of one
    denoiser call — identical expectation, one fused kernel.

    score_fn_with_feat(feat, x, t) -> score, shapes ((N,F),(N,D),(N,1))->(N,D).
    """
    bs, pose_dim = gt_pose.shape
    k_t, k_z = jax.random.split(key)
    n = repeat_num * bs
    random_t = jax.random.uniform(k_t, (n, 1)) * (1.0 - sde.eps) + sde.eps
    feat_r = jnp.tile(feat, (repeat_num, 1))
    gt_r = jnp.tile(gt_pose, (repeat_num, 1))
    mu, std = sde.marginal_prob(gt_r, random_t)
    std = std.reshape(n, 1)
    z = jax.random.normal(k_z, (n, pose_dim))
    perturbed = mu + z * std
    est_score = score_fn_with_feat(feat_r, perturbed, random_t)
    target_score = -z / std
    weighting = std**2
    per_sample = jnp.sum(weighting * (est_score - target_score) ** 2, axis=-1)
    return jnp.mean(per_sample)
