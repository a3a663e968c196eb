"""Micro-probe: where do ~5 ms per 12800-wide joints-FK go on the chip?"""
import json, os, time
import jax, jax.numpy as jnp
from jax import lax
from vpho_tpu.models import vpho as V
from vpho_tpu.models.vpho import ModelConfig
from vpho_tpu.models.mano import hand_joints_meters, _compose_chain, _rodrigues
from vpho_tpu.utils.transforms import axis_angle_to_matrix

cfg = ModelConfig()
ctx = V.make_context(cfg)
N = 12800
k0 = jax.random.PRNGKey(0)
pose = jax.random.normal(k0, (N, 48)) * 0.1
shape = jax.random.normal(k0, (N, 10)) * 0.1

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

def fk(p, s):
    p = p + (s * 1e-6).astype(p.dtype)
    return hand_joints_meters(ctx.mano, p, shape).sum()
timed("fk_joints_once", fk)

def rodr(p, s):
    p = p + (s * 1e-6).astype(p.dtype)
    return axis_angle_to_matrix(p.reshape(N, 16, 3)).sum()
timed("rodrigues_once", rodr)

def chain(p, s):
    p = p + (s * 1e-6).astype(p.dtype)
    rots = axis_angle_to_matrix(p.reshape(N, 16, 3))
    j_rest = jnp.broadcast_to(jnp.linspace(0., 1., 48).reshape(16, 3), (N, 16, 3))
    A_rot, A_t = _compose_chain(rots, j_rest)
    return A_rot.sum() + A_t.sum()
timed("rodrigues_plus_chain", chain)

# SoA rodrigues: quaternion -> 9 rotation planes, everything (N*16,) flat
def rodr_soa(p, s):
    p = p + (s * 1e-6).astype(p.dtype)
    aa = p.reshape(N * 16, 3)
    ang = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * ang
    sinc = jnp.where(ang > 1e-8, jnp.sin(half) / jnp.maximum(ang, 1e-12), 0.5)
    w = jnp.cos(half)[..., 0]
    x, y, z = (aa * sinc).T
    # rotation matrix components from the unit quaternion (w,x,y,z)
    r00 = 1 - 2*(y*y + z*z); r01 = 2*(x*y - z*w); r02 = 2*(x*z + y*w)
    r10 = 2*(x*y + z*w); r11 = 1 - 2*(x*x + z*z); r12 = 2*(y*z - x*w)
    r20 = 2*(x*z - y*w); r21 = 2*(y*z + x*w); r22 = 1 - 2*(x*x + y*y)
    out = jnp.stack([r00,r01,r02,r10,r11,r12,r20,r21,r22], 0)  # (9, N*16)
    return out.sum()
timed("rodrigues_soa", rodr_soa)
