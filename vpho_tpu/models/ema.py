"""Parameter EMA helper (reference lib/model/ema.py, imported by VPHO.py:20
but never instantiated on the live path — provided for inventory parity and
actually usable here).

Functional flavor: ``ema_init`` / ``ema_update`` operate on param pytrees and
compose with any optax train loop; ``num_updates``-aware decay matches the
torch implementation's ``min(decay, (1 + n) / (10 + n))`` warmup.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any
    num_updates: jax.Array  # int32 scalar


def ema_init(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.asarray, params),
                    num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_params, decay: float = 0.999) -> EMAState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    upd = jax.tree.map(lambda e, p: e * d + p * (1.0 - d), state.params, new_params)
    return EMAState(params=upd, num_updates=n)


def ema_swap(state: EMAState, params):
    """Return (ema_params, backup) to evaluate with the shadow weights."""
    return state.params, params
