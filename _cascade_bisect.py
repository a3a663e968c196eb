"""One-off: bisect the hand-cascade stage on the real chip.

Variants (BENCH_VARIANTS csv filter):
  full_eigh   - the real 4-level cascade, eigh quat mean
  full_power  - same, power-iteration quat mean
  fk_only     - 4 chained joints-FK passes over (B, 2S) (the cascade's FK load)
  no_heat     - cascade with heat sampling replaced by a joint-coord sum
  no_quat     - cascade with the quaternion average replaced by a plain
                weighted arithmetic mean of the axis-angles (NOT equivalent
                math - timing only)
"""
import json, os, time
import jax, jax.numpy as jnp

from vpho_tpu.models import vpho as V, aggregation as agg
from vpho_tpu.models.vpho import ModelConfig
from vpho_tpu.models.mano import hand_joints_meters
from vpho_tpu.utils import transforms as T

cfg = ModelConfig(sample_num=100, sampling_steps=50, topk_hand=30, topk_obj=10, patch_size=256)
ctx = V.make_context(cfg)
B, S, K = 64, 100, 30
k0 = jax.random.PRNGKey(0)
pose = jax.random.normal(k0, (B, S, 48)) * 0.1
reg = jax.random.normal(k0, (B, 48)) * 0.1
shape = jax.random.normal(k0, (B, S, 10)) * 0.1
rjf = jax.random.normal(k0, (B, 3))
intr = jnp.broadcast_to(jnp.array([[500., 0, 128], [0, 500., 128], [0, 0, 1]]), (B, 3, 3))
hm = jax.random.uniform(k0, (B, 21, 64, 64))
bbox = jnp.broadcast_to(jnp.array([0., 0., 256., 256.]), (B, 4))


def timed(name, fn, iters=7):
    only = os.environ.get("BENCH_VARIANTS", "")
    if only and name not in only.split(","):
        return
    jfn = jax.jit(fn)
    out = jfn(pose, jnp.float32(0)); jax.block_until_ready(out)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = jfn(pose, jnp.float32(1 + i)); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(json.dumps({name: round(ts[len(ts) // 2] * 1e3, 2)}), flush=True)


def cascade(p, seed):
    p = p + (seed * 1e-6).astype(p.dtype)
    return agg.hand_heatmap_cascade(ctx.mano, p, reg, shape, rjf, intr, hm, bbox, K)["agg_vert"]


def fk_only(p, seed):
    p = p + (seed * 1e-6).astype(p.dtype)
    p2 = jnp.concatenate([p, p], axis=1)
    s2 = jnp.concatenate([shape, shape], axis=1)
    acc = jnp.float32(0)
    for _ in range(4):
        j = hand_joints_meters(ctx.mano, p2, s2)
        acc = acc + j.sum()
        p2 = p2 + (acc * 1e-9).astype(p2.dtype)  # serialize the 4 passes
    return acc


timed("fk_only", fk_only)
T.QUAT_MEAN_IMPL = "eigh"
timed("full_eigh", cascade)
T.QUAT_MEAN_IMPL = "power"
timed("full_power", cascade)

# monkeypatched variants (timing-only)
_orig_hv = agg.heat_values
_orig_avg = T.average_quaternion

def fake_heat(heatmap, pt2d, observe_index):
    return pt2d[..., jnp.asarray(list(observe_index)), :].sum(-1)

agg.heat_values = fake_heat
T.QUAT_MEAN_IMPL = "eigh"
timed("no_heat", cascade)
agg.heat_values = _orig_hv

def fake_avg(Q, W=None, impl=None):
    if W is None:
        W = jnp.ones_like(Q[..., 0])
    m = (Q * W[..., None]).sum(-2) / (W.sum(-1)[..., None] + 1e-8)
    return m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-8)

T.average_quaternion = fake_avg
agg.T.average_quaternion = fake_avg
timed("no_quat", cascade)
T.average_quaternion = _orig_avg
