"""Regression heads, cross-attention physics module, and the object layer.

Ports (Flax / functional JAX) of:
  * HeadMano (lib/model/head_mano.py:30-133) — MLP -> 16x rot6d + 10 shape
  * HeadObject (lib/model/head_object.py:9-121) — differentiable YCB "mesh
    layer"; here a pure function over the stacked ``YCBRegistry`` indexed by
    integer ids (one take instead of the reference's per-name getattr loop)
  * CrossModule (lib/model/cross_module.py:91-137) — hand/object token
    exchange with a gravity token
  * HeadPhysics (lib/model/physics.py:648-721) + its loss suite
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import transforms as T
from .layers import TransformerEncoderLayer, linear_init, nerf_embed, sinusoid_table
from .ycb import YCBRegistry

Dense = lambda f, name=None: nn.Dense(f, kernel_init=linear_init,
                                      bias_init=nn.initializers.zeros, name=name)


class HeadMano(nn.Module):
    """MANO parameter regression head (head_mano.py:30-76).

    1024 -> 1024 -> 512 (LeakyReLU) -> {16x6 pose, 10 shape}; the rot6d pose
    is converted to axis-angle before returning (matching the reference
    interface to FK and the cascade aggregator).
    """

    @nn.compact
    def __call__(self, x):
        bs = x.shape[0]
        h = Dense(1024)(x)
        h = nn.leaky_relu(h, 0.01)
        h = Dense(512)(h)
        h = nn.leaky_relu(h, 0.01)
        pose6d = Dense(16 * 6)(h).reshape(bs, 16, 6)
        pose_aa = T.matrix_to_axis_angle(T.rotation_6d_to_matrix(pose6d)).reshape(bs, 48)
        shape = Dense(10)(h)
        return pose_aa, shape


def mano_losses(pd_pose, pd_shape, pd_vert, pd_joint,
                gt_pose, gt_shape, gt_vert, gt_joint, is_right) -> Dict[str, jax.Array]:
    """HeadMano.get_loss (head_mano.py:89-133): vert/joint MSE, pose loss in
    rot6d space, shape loss over right hands only (rescaled by right count)."""
    vert_loss = jnp.mean((pd_vert - gt_vert) ** 2)
    joint_loss = jnp.mean((pd_joint - gt_joint) ** 2)
    pose_loss = jnp.mean((T.mano_aa_to_6d(pd_pose) - T.mano_aa_to_6d(gt_pose)) ** 2)
    right = is_right.astype(pd_shape.dtype)[:, None]
    n_right = jnp.maximum(right.sum(), 1.0)
    shape_mse = jnp.sum(((pd_shape - gt_shape) ** 2) * right) / (n_right * pd_shape.shape[-1])
    # reference rescales by right_num / bs (head_mano.py:121-122)
    shape_loss = shape_mse / pd_shape.shape[0] * n_right
    return {
        "vert_loss": vert_loss,
        "joint_loss": joint_loss,
        "mano_pose_loss": pose_loss,
        "mano_shape_loss": shape_loss,
    }


# ---------------------------------------------------------------------------
# object layer (functional HeadObject)
# ---------------------------------------------------------------------------


def object_points(registry: YCBRegistry, obj_ids: jax.Array, data_name: str) -> jax.Array:
    """Select the per-object point set: (B, V, 3) by integer id (0-based)."""
    if data_name == "keypoint":
        pts = registry.kpt3d
    elif data_name == "verts":
        pts = registry.verts_sampled
    elif data_name == "verts_full":
        pts = registry.verts_full
    elif data_name == "CoM":
        pts = registry.com[:, None, :]
    else:
        raise ValueError(data_name)
    return jnp.take(pts, obj_ids, axis=0)


def object_transform(registry: YCBRegistry, pose9d: jax.Array, obj_ids: jax.Array,
                     data_name: str = "keypoint") -> jax.Array:
    """Apply rot6d+trans pose(s) to an object's canonical points.

    pose9d: (B, ..., 9); obj_ids: (B,) -> (B, ..., V, 3).
    (HeadObject.forward, head_object.py:36-61.)
    """
    pts = object_points(registry, obj_ids, data_name)           # (B, V, 3)
    rotmat = T.rotation_6d_to_matrix(pose9d[..., :6])           # (B, ..., 3, 3)
    new = jnp.einsum("bvi,b...ji->b...vj", pts, rotmat,
                     precision=jax.lax.Precision.HIGHEST)
    return new + pose9d[..., None, 6:]


def flip_pt3d(pt3d: jax.Array, is_right: jax.Array) -> jax.Array:
    """Mirror x for left-hand samples (head_object.py:63-67)."""
    return T.flip_point3d(pt3d, ~is_right)


def to_axsym_pose(registry: YCBRegistry, pose: jax.Array, obj_ids: jax.Array) -> jax.Array:
    """Reframe a camera pose into the axial-symmetry frame (head_object.py:69-95)."""
    shift = jnp.take(registry.shift, obj_ids, axis=0)           # (B, 3, 4)
    r, t = shift[..., :3, :3], shift[..., :3, 3]
    inv_r = jnp.swapaxes(r, -1, -2)
    inv_t = -jnp.einsum("...ij,...j->...i", inv_r, t)
    inv_rt = jnp.concatenate([inv_r, inv_t[..., None]], axis=-1)
    obj_rt = T.obj_9d_to_mat(pose)
    return T.obj_mat_to_9d(T.matmul_for_rt(obj_rt, inv_rt))


def to_cam_pose(registry: YCBRegistry, pose: jax.Array, obj_ids: jax.Array) -> jax.Array:
    """Inverse of ``to_axsym_pose`` (head_object.py:97-121)."""
    shift = jnp.take(registry.shift, obj_ids, axis=0)
    obj_rt = T.obj_9d_to_mat(pose)
    return T.obj_mat_to_9d(T.matmul_for_rt(obj_rt, shift))


# ---------------------------------------------------------------------------
# cross module + physics head
# ---------------------------------------------------------------------------


class CrossModule(nn.Module):
    """Hand/object feature exchange with a gravity token (cross_module.py:91-137).

    Inputs are the (B, 8, 8, 256) encoder maps (NHWC); each is 3x3-conv
    projected then reshaped channel-major into 32 tokens of dim ``hid_dim``.
    A 1-layer post-norm transformer (d=hid_dim, 2 heads) mixes
    [hand(32) | obj(32) | gravity(1)] tokens.  Attention runs over TOKENS
    (see TransformerEncoderLayer docstring for the deliberate fix of the
    reference's batch-axis attention).
    """

    hid_dim: int = 512
    num_force: int = 32
    dtype: Any = None
    # "tokens" (default): attention over the 65 tokens, positional encoding
    # over token index — the deliberate fix (DEVIATIONS.md D1).
    # "batch": bit-faithful replica of the reference's sequence-first feed
    # (cross_module.py:104-134): torch's TransformerEncoder without
    # batch_first treats (bs, 65, d) as (seq=bs, batch=65), so attention
    # mixes SAMPLES at each token position and the positional table indexes
    # the sample slot.  Needed to reproduce a reference-trained checkpoint's
    # physics-cue inputs exactly (--cross_attention_axis batch).
    attention_axis: str = "tokens"

    @nn.compact
    def __call__(self, x_hand, x_obj, gravity, train: bool = False):
        B, H, W, C = x_hand.shape
        proj_dim = int(self.hid_dim / (H * W / self.num_force))
        kinit = nn.initializers.kaiming_normal()
        ph = nn.Conv(proj_dim, (3, 3), padding=1, kernel_init=kinit, dtype=self.dtype)(x_hand)
        po = nn.Conv(proj_dim, (3, 3), padding=1, kernel_init=kinit, dtype=self.dtype)(x_obj)
        # channel-major (B, C, H, W).view(B, 32, -1) token grouping
        tok_h = jnp.transpose(ph, (0, 3, 1, 2)).reshape(B, self.num_force, self.hid_dim)
        tok_o = jnp.transpose(po, (0, 3, 1, 2)).reshape(B, self.num_force, self.hid_dim)

        if gravity.ndim == 2:
            gravity = gravity[:, None, :]
        g = nerf_embed(gravity, multires=10)                    # (B, 1, 63)
        g = nn.Dense(self.hid_dim, kernel_init=kinit, bias_init=nn.initializers.zeros)(g)

        x = jnp.concatenate([tok_h, tok_o, g], axis=1)          # (B, 65, hid)
        layer = TransformerEncoderLayer(d_model=self.hid_dim, n_heads=2,
                                        dtype=self.dtype)
        if self.attention_axis == "batch":
            pe = sinusoid_table(B, self.hid_dim, x.dtype)       # pe[sample]
            x = x + pe[:, None].astype(x.dtype)
            x = nn.Dropout(0.1, deterministic=not train)(x)
            x = jnp.swapaxes(x, 0, 1)                           # (65, B, hid)
            x = layer(x, train=train)
            x = jnp.swapaxes(x, 0, 1)
        else:
            pe = sinusoid_table(x.shape[1], self.hid_dim, x.dtype)
            x = x + pe[None].astype(x.dtype)
            x = nn.Dropout(0.1, deterministic=not train)(x)
            x = layer(x, train=train)
        x = x.astype(jnp.float32)  # physics head consumes f32 tokens
        y_hand, y_obj, y_gravity = jnp.split(x, [self.num_force, 2 * self.num_force], axis=1)
        return y_hand, y_obj, y_gravity


def friction_anchor_dirs(num_anchor: int = 8, friction_coeff: float = 0.8) -> jax.Array:
    """(8, 3) friction-cone anchor directions (physics.py:692-698):
    (cos, sin, 1)/8 with the tangential xy scaled by the friction coeff."""
    ang = jnp.arange(num_anchor) * (2 * jnp.pi / num_anchor)
    anchor = jnp.stack([jnp.cos(ang), jnp.sin(ang), jnp.ones_like(ang)], axis=-1) / num_anchor
    return anchor * jnp.array([friction_coeff, friction_coeff, 1.0])


def local_force_from_scale_weight(scale: jax.Array, weight: jax.Array,
                                  friction_coeff: float = 0.8) -> jax.Array:
    """(physics.py:546-557) force = normalize(weight-blended anchor dir) * |scale|.

    NOTE: the reference softmaxes ``weight`` twice (once in fc_weight's
    Sequential, once here); we preserve that double-softmax for parity.
    """
    scale = jnp.abs(scale)
    weight = jax.nn.softmax(weight, axis=-1)
    anchor = friction_anchor_dirs(8, friction_coeff)            # (8, 3)
    direction = jnp.einsum("...ij,jk->...ik", weight, anchor)
    direction = T.normalize(direction)  # NaN-safe gradient at exact zero
    return direction * scale[..., None]


class HeadPhysics(nn.Module):
    """Per-anchor contact force + object CoM from cross-module tokens
    (physics.py:648-721)."""

    hid_dim: int = 512

    @nn.compact
    def __call__(self, x_hand, x_obj):
        """x_hand/x_obj: (B, 32, hid_dim) refined tokens."""
        def mlp(x, out, name):
            h = Dense(self.hid_dim, name=f"{name}_0")(x)
            h = nn.leaky_relu(h, 0.01)
            return Dense(out, name=f"{name}_1")(h)

        scale = mlp(x_hand, 1, "fc_scale")[..., 0]              # (B, 32)
        weight = jax.nn.softmax(mlp(x_obj, 8, "fc_weight"), axis=-1)
        com = mlp(x_obj, 3, "fc_CoM")                           # (B, 32, 3)
        force_local = local_force_from_scale_weight(scale, weight)
        return {"force_local": force_local, "scale": scale, "weight": weight, "CoM": com}


def physics_losses(gt_force_point, pd_force_global, gt_com, pd_com,
                   gt_force_local, pd_force_local, gt_gravity, is_grasped) -> Dict[str, jax.Array]:
    """HeadForce2.get_loss (physics.py:456-498) with HeadPhysics semantics.

    gt_gravity: (B, 1, 3); is_grasped: (B,) float/bool; pd_com: (B, 32, 3).
    """
    grasp = is_grasped.astype(pd_force_global.dtype)
    resultant = pd_force_global.sum(1, keepdims=True) + gt_gravity  # (B, 1, 3)
    # norm(x)**2 written as sum(x**2): norm's gradient is NaN at exactly 0
    force_loss = jnp.mean(jnp.sum(resultant**2, axis=-1)[:, 0] * grasp**2)

    total = pd_force_global.sum(1, keepdims=True)
    cos_proj = jnp.einsum("...i,...i->...", total, gt_gravity)[:, 0]
    gravity_balance = (cos_proj + 1.0) * grasp
    gravity_loss = jnp.mean(gravity_balance**2)

    arm = gt_force_point - gt_com                                # (B, 32, 3)
    torque = jnp.cross(arm, pd_force_global).sum(1)
    torque_loss = jnp.mean(jnp.sum(torque**2, axis=-1) * grasp**2)

    supervised_loss = jnp.mean((pd_force_local - gt_force_local) ** 2)
    com_loss = jnp.mean((pd_com - jnp.broadcast_to(gt_com, pd_com.shape)) ** 2)
    return {
        "force_loss": force_loss,
        "gravity_loss": gravity_loss,
        "torque_loss": torque_loss,
        "supervised_loss": supervised_loss,
        "CoM_loss": com_loss,
    }


class HeadObjectRegress(nn.Module):
    """Direct object 9D pose regression head (head_object_regress.py:8-31).

    Defined in the reference but not instantiated by the live vpho_net
    (eval tolerates its absence, train_diff_hand_obj.py:256-257); provided
    here with its loss suite so the regression-object variant is available.
    """

    @nn.compact
    def __call__(self, x):
        h = Dense(1024)(x)
        h = nn.leaky_relu(h, 0.01)
        h = Dense(512)(h)
        h = nn.leaky_relu(h, 0.01)
        rot6d = Dense(6)(h)
        trans = Dense(3)(h)
        return jnp.concatenate([rot6d, trans], axis=-1)


def object_regress_losses(pd_pose, pd_vert, pd_kpt, gt_pose, gt_vert, gt_kpt):
    """HeadObjectRegress.get_loss (head_object_regress.py:34-57)."""
    return {
        "obj_reg_vert_loss": jnp.mean((pd_vert - gt_vert) ** 2),
        "obj_reg_kpt_loss": jnp.mean((pd_kpt - gt_kpt) ** 2),
        "obj_reg_rot6d_loss": jnp.mean((pd_pose[:, :6] - gt_pose[:, :6]) ** 2),
        "obj_reg_trans_loss": jnp.mean((pd_pose[:, 6:] - gt_pose[:, 6:]) ** 2),
    }
