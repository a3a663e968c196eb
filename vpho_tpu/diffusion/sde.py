"""Score-SDE definitions (VE / VP / sub-VP / EDM), pure JAX.

Mirrors the function bundle of the reference ``lib/model/sde.py:80-116``
(hyperparameters from score_sde): each SDE exposes ``marginal_prob(x, t)``,
``sde(t) -> (drift_coeff, diffusion_coeff)`` and ``prior(key, shape)``, plus
the integration window ``(eps, T)``.  Everything is traceable so the sampler
and the score-matching loss stay inside one jitted graph.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SDE:
    name: str
    eps: float
    T: float
    marginal_prob: Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]
    sde: Callable[[jax.Array], Tuple[jax.Array, jax.Array]]
    prior: Callable[..., jax.Array]


def init_sde(sde_mode: str = "ve") -> SDE:
    """Build the SDE bundle. Defaults match the reference (``args.py:191`` ve)."""
    if sde_mode == "ve":
        sigma_min, sigma_max, eps, T = 0.01, 50.0, 1e-5, 1.0
        log_ratio = math.log(sigma_max) - math.log(sigma_min)

        def marginal_prob(x, t):
            std = sigma_min * (sigma_max / sigma_min) ** t
            return x, std

        def sde_fn(t):
            sigma = sigma_min * (sigma_max / sigma_min) ** t
            drift = jnp.zeros_like(sigma)
            diffusion = sigma * jnp.sqrt(jnp.asarray(2.0 * log_ratio, dtype=jnp.result_type(t, jnp.float32)))
            return drift, diffusion

        def prior(key, shape, T=T):
            _, std = marginal_prob(None, jnp.asarray(T))
            return jax.random.normal(key, shape) * std

    elif sde_mode == "edm":
        sigma_min, sigma_max, eps = 0.002, 80.0, 0.002
        T = sigma_max

        def marginal_prob(x, t):
            return x, t

        def sde_fn(t):
            return jnp.zeros_like(t), jnp.sqrt(2.0 * t)

        def prior(key, shape, T=T):
            return jax.random.normal(key, shape) * sigma_max

    elif sde_mode in ("vp", "subvp"):
        beta_0, beta_1, eps, T = 0.1, 20.0, 1e-3, 1.0

        def marginal_prob(x, t):
            log_mean_coeff = -0.25 * t**2 * (beta_1 - beta_0) - 0.5 * t * beta_0
            mean = jnp.exp(log_mean_coeff) * x if x is not None else None
            if sde_mode == "vp":
                std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
            else:
                std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
            return mean, std

        def sde_fn(t):
            beta_t = beta_0 + t * (beta_1 - beta_0)
            drift = -0.5 * beta_t
            if sde_mode == "vp":
                diffusion = jnp.sqrt(beta_t)
            else:
                discount = 1.0 - jnp.exp(-2 * beta_0 * t - (beta_1 - beta_0) * t**2)
                diffusion = jnp.sqrt(beta_t * discount)
            return drift, diffusion

        def prior(key, shape, T=T):
            return jax.random.normal(key, shape)

    else:
        raise NotImplementedError(f"unknown sde_mode: {sde_mode}")

    return SDE(name=sde_mode, eps=eps, T=T, marginal_prob=marginal_prob, sde=sde_fn, prior=prior)
