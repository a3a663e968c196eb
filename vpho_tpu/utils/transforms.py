"""Rotation / projection / alignment primitives (pure JAX, jit/vmap friendly).

TPU-native re-implementation of the geometry layer the reference builds from
pytorch3d rotation conversions plus ``lib/utils/transform_fn.py``.  All ops are
batched, functional, and compile to a handful of fused VPU/MXU kernels; none of
the reference's numpy/torch dual paths survive here.

Conventions (kept identical to the reference so downstream numerics match):
  * quaternions are real-first ``(w, x, y, z)`` (pytorch3d convention)
  * rot6d is the first two ROWS of the rotation matrix, flattened
    (pytorch3d ``matrix_to_rotation_6d``) and decoded by Gram-Schmidt
  * camera projection is ``uv = (K @ xyz)[:2] / z`` with K acting on the right
    as ``pt3d @ K^T`` (reference ``transform_fn.py:6-20``)

Reference parity notes are cited as ``file:line`` of the upstream repo.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_HI = lax.Precision.HIGHEST

# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------


def safe_sqrt(x: jax.Array) -> jax.Array:
    """sqrt(max(x, 0)) with a ZERO subgradient at x <= 0 instead of inf/NaN.

    jnp.sqrt'(0) = inf, and in reverse-mode a 0 cotangent times an inf local
    gradient is NaN — which then poisons gradients of every co-computed
    output through shared layers (0 * NaN contamination).  Values are
    bit-identical to jnp.sqrt(jnp.maximum(x, 0)).
    """
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """L2-normalize along ``axis`` with epsilon guard (NaN-safe gradient at
    the zero vector — see safe_sqrt)."""
    n = safe_sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return v / (n + eps)


# ---------------------------------------------------------------------------
# axis-angle <-> matrix / quaternion  (pytorch3d-compatible)
# ---------------------------------------------------------------------------


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues formula. aa: (..., 3) -> (..., 3, 3).

    Small angles use a 2nd-order Taylor expansion of sin/cos factors so the
    function is smooth and differentiable at zero (matching pytorch3d).
    """
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def axis_angle_to_quaternion(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 4) real-first quaternion.

    Uses a clamped sqrt for the angle so gradients at exactly zero rotation
    are finite (jnp.linalg.norm has a NaN gradient at 0).
    """
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, 1e-24))
    half = angle * 0.5
    small = angle < 1e-6
    # sin(x/2)/x ~ 1/2 - x^2/48 for small x
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    quat = jnp.concatenate([jnp.cos(half), aa * sin_half_over_angle], axis=-1)
    return quat


def quaternion_to_axis_angle(quat: jax.Array) -> jax.Array:
    """(..., 4) real-first quaternion -> (..., 3) axis-angle."""
    norms = safe_sqrt(jnp.sum(quat[..., 1:] ** 2, axis=-1, keepdims=True))
    half_angles = jnp.arctan2(norms, quat[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < 1e-6
    # x/sin(x/2) expanded: 2 + angle^2/12 ... -> sin(x/2)/x ~ 1/2 - x^2/48
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half_angles) / jnp.where(small, 1.0, angles)
    )
    return quat[..., 1:] / sin_half_over_angle


def quaternion_to_matrix(quat: jax.Array) -> jax.Array:
    """(..., 4) real-first unit quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return o.reshape(quat.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    # identical values to sqrt(max(x, 0)); NaN-safe gradient where a
    # candidate denominator is exactly 0 (e.g. the three non-selected
    # quaternion candidates of an exact-identity rotation)
    return safe_sqrt(x)


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) real-first quaternion (pytorch3d algorithm).

    Branchless: builds the four candidate quaternions and selects the one with
    the largest denominator, so it is safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 4)

    flr = jnp.asarray(0.1, dtype=m.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    return quat


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


# ---------------------------------------------------------------------------
# rot6d  (Zhou et al., pytorch3d row convention)
# ---------------------------------------------------------------------------


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3); rows are the Gram-Schmidt frame."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two rows flattened."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


# ---------------------------------------------------------------------------
# quaternion averaging (reference transform_fn.py:101-125, GenPose-derived)
# ---------------------------------------------------------------------------


# Implementation switch for the dominant-eigenvector solve inside
# average_quaternion: "eigh" (LAPACK-style, XLA's TPU lowering is a
# sequential QR loop) or "power" (matrix-squaring subspace iteration —
# pure batched 4x4 matmuls, MXU/VPU work).  Module-level so the many
# aggregation call sites need no plumbing; set it BEFORE tracing (jit
# captures the choice at trace time).  CLI: --quat_mean_impl.
#
# This is the one piece of global mutable config in the codebase; use
# set_quat_mean_impl() rather than assigning directly — it detects the
# two-configs-in-one-process footgun (a trace already captured a
# DIFFERENT value, which the new assignment cannot retroactively change)
# and warns loudly instead of silently splitting behavior.
QUAT_MEAN_IMPL = "eigh"
_QUAT_IMPL_TRACED: set = set()


def set_quat_mean_impl(impl: str) -> None:
    global QUAT_MEAN_IMPL
    if impl not in ("eigh", "power"):
        raise ValueError(f"quat_mean_impl must be eigh|power, got {impl!r}")
    if _QUAT_IMPL_TRACED and impl not in _QUAT_IMPL_TRACED:
        import warnings

        warnings.warn(
            f"quat_mean_impl set to {impl!r} but traces already captured "
            f"{sorted(_QUAT_IMPL_TRACED)} — existing jitted functions keep "
            f"the old choice; embed one config per process (or pass "
            f"impl= explicitly)", stacklevel=2)
    QUAT_MEAN_IMPL = impl


def dominant_eigvec_4x4_power(A: jax.Array, squarings: int = 5) -> jax.Array:
    """Dominant eigenvector of PSD (..., 4, 4) matrices by repeated squaring.

    A^(2^k) collapses every column onto the dominant eigenvector q (column i
    scales as lambda_max^(2^k) q_i q); the largest-norm column is then a
    numerically safe representative — q cannot be orthogonal to ALL four
    basis columns, so unlike fixed-start power iteration there is no bad
    start vector.  Each squaring renormalizes by the max |entry| to avoid
    overflow; 5 squarings = A^32, ample for the spectral gaps of coherent
    quaternion clusters (ambiguous clusters have no meaningful average for
    either impl).  Batched matmuls + reductions only — no sequential QR.
    """
    P = A
    for _ in range(squarings):
        P = P / (jnp.max(jnp.abs(P), axis=(-2, -1), keepdims=True) + 1e-30)
        P = jnp.einsum("...ij,...jk->...ik", P, P, precision=_HI)
    norms = jnp.sum(P * P, axis=-2)  # squared column norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(P, best[..., None, None], axis=-1)[..., 0]
    return normalize(v)


def average_quaternion(Q: jax.Array, W: jax.Array | None = None,
                       impl: str | None = None) -> jax.Array:
    """Weighted quaternion average over the -2 axis via eigen decomposition.

    Q: (..., N, 4) real-first; W: (..., N) or None.
    Returns (..., 4) with non-negative real part.
    ``impl`` overrides the module default ``QUAT_MEAN_IMPL`` (eigh|power).
    """
    if W is None:
        W = jnp.ones_like(Q[..., 0])
    weight_sum = jnp.sum(W, axis=-1, keepdims=True)  # (..., 1)
    oriented = jnp.where(Q[..., :1] > 0, 1.0, -1.0) * Q
    A = jnp.einsum("...ni,...nj->...nij", oriented, oriented, precision=_HI)
    A = jnp.sum(A * W[..., None, None], axis=-3)
    A = A / weight_sum[..., None]
    chosen = impl or QUAT_MEAN_IMPL
    if impl is None:
        _QUAT_IMPL_TRACED.add(chosen)
    if chosen == "power":
        q_avg = dominant_eigvec_4x4_power(A)
    else:
        # largest-eigenvalue eigenvector == last column of eigh's eigenvectors
        _, vecs = jnp.linalg.eigh(A)
        q_avg = vecs[..., -1]
    return jnp.where(q_avg[..., :1] > 0, 1.0, -1.0) * q_avg


def average_rot6d(rot6d: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Average rot6d candidates over the -2 axis (reference aggregation.py:50-56)."""
    if weights is None:
        weights = jnp.ones_like(rot6d[..., 0]) / rot6d.shape[-2]
    quat = matrix_to_quaternion(rotation_6d_to_matrix(rot6d))
    quat_mean = average_quaternion(quat, weights)
    return matrix_to_rotation_6d(quaternion_to_matrix(quat_mean))


# ---------------------------------------------------------------------------
# camera projection (reference transform_fn.py:6-39)
# ---------------------------------------------------------------------------


def project_pt3d_to_pt2d(pt3d: jax.Array, cam_intrinsic: jax.Array) -> jax.Array:
    """pt3d: (..., 3); cam_intrinsic: (..., 3, 3) -> (..., 2)."""
    pt2d = jnp.matmul(pt3d, jnp.swapaxes(cam_intrinsic, -1, -2), precision=_HI)
    return pt2d[..., :-1] / pt2d[..., -1:]


def project_points_batched(pt3d: jax.Array, cam_intrinsic: jax.Array) -> jax.Array:
    """Batched projection with broadcast over candidate axes.

    pt3d: (B, ..., 3); cam_intrinsic: (B, 3, 3).
    Mirrors reference aggregation.py:24-32 (``project_point_by_cam_intrinsic``).
    """
    pt2d = jnp.einsum("b...i,bji->b...j", pt3d, cam_intrinsic, precision=_HI)
    return pt2d[..., :2] / pt2d[..., 2:]


def inverse_project_uvd_to_xyz(uvd: jax.Array, cam_intrinsic: jax.Array) -> jax.Array:
    """uvd: (..., 3); K: (..., 3, 3) -> xyz (..., 3)."""
    ones = jnp.ones_like(uvd[..., -1:])
    homog = jnp.concatenate([uvd[..., :-1], ones], axis=-1)
    xyz = jnp.matmul(homog, jnp.swapaxes(jnp.linalg.inv(cam_intrinsic), -1, -2), precision=_HI)
    return xyz * uvd[..., -1:]


# ---------------------------------------------------------------------------
# rigid alignment (Umeyama w/ scale; reference transform_fn.py:43-66)
# ---------------------------------------------------------------------------


def rigid_align(A: jax.Array, B: jax.Array) -> jax.Array:
    """Procrustes-align point set A (N,3) onto B (N,3) with scale.

    Batched via vmap by callers. Matches reference ``rigid_align`` /
    ``rigid_transform_3D`` (hand_fn.py:476-498) numerics.
    """
    n = A.shape[-2]
    centroid_A = jnp.mean(A, axis=-2, keepdims=True)
    centroid_B = jnp.mean(B, axis=-2, keepdims=True)
    H = jnp.matmul(jnp.swapaxes(A - centroid_A, -1, -2), B - centroid_B, precision=_HI) / n
    U, s, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    flip = jnp.where(det < 0, -1.0, 1.0)
    s = s.at[..., -1].multiply(flip)
    Vt = Vt.at[..., 2, :].multiply(flip[..., None])
    R = jnp.matmul(jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2), precision=_HI)
    varP = jnp.sum(jnp.var(A, axis=-2), axis=-1)
    c = jnp.sum(s, axis=-1) / varP
    t = centroid_B - c[..., None, None] * jnp.matmul(centroid_A, jnp.swapaxes(R, -1, -2), precision=_HI)
    return c[..., None, None] * jnp.matmul(A, jnp.swapaxes(R, -1, -2), precision=_HI) + t


# ---------------------------------------------------------------------------
# 9D object pose helpers (reference transform_fn.py:85-97, 128-152)
# ---------------------------------------------------------------------------


def obj_9d_to_mat(obj_9d: jax.Array) -> jax.Array:
    """(..., 9) rot6d+trans -> (..., 3, 4)."""
    rotmat = rotation_6d_to_matrix(obj_9d[..., :6])
    return jnp.concatenate([rotmat, obj_9d[..., 6:9, None]], axis=-1)


def obj_mat_to_9d(obj_rt: jax.Array) -> jax.Array:
    rot6d = matrix_to_rotation_6d(obj_rt[..., :3, :3])
    return jnp.concatenate([rot6d, obj_rt[..., :3, 3]], axis=-1)


def matmul_for_rt(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """Compose (..., 3, 4) rigid transforms: T1 ∘ T2."""
    r1, t1 = T1[..., :3, :3], T1[..., :3, 3]
    r2, t2 = T2[..., :3, :3], T2[..., :3, 3]
    new_r = jnp.einsum("...ij,...jk->...ik", r1, r2, precision=_HI)
    new_t = jnp.einsum("...ij,...j->...i", r1, t2, precision=_HI) + t1
    return jnp.concatenate([new_r, new_t[..., None]], axis=-1)


# MANO param pack/unpack between axis-angle (48+10) and rot6d (96+10)
# (reference head_mano.py:10-26)


def mano_aa_to_6d(mano_params: jax.Array) -> jax.Array:
    """(..., 48+extra) -> (..., 96+extra): 16 joints aa -> rot6d."""
    s = mano_params.shape[:-1]
    aa = mano_params[..., :48].reshape(s + (16, 3))
    d6 = matrix_to_rotation_6d(axis_angle_to_matrix(aa)).reshape(s + (96,))
    return jnp.concatenate([d6, mano_params[..., 48:]], axis=-1)


def mano_6d_to_aa(mano_6d: jax.Array) -> jax.Array:
    """(..., 96+extra) -> (..., 48+extra)."""
    s = mano_6d.shape[:-1]
    d6 = mano_6d[..., : 16 * 6].reshape(s + (16, 6))
    aa = matrix_to_axis_angle(rotation_6d_to_matrix(d6)).reshape(s + (48,))
    return jnp.concatenate([aa, mano_6d[..., 16 * 6 :]], axis=-1)


# numpy, NOT jnp: a module-level device array would initialize the default
# JAX backend at import time — before a CLI entry point can force the
# platform (jnp ops coerce numpy operands, so usage is unchanged)
OPENGL_TO_OPENCV = np.array(
    [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], dtype=np.float32
)


def flip_point3d(pt3d: jax.Array, is_flip: jax.Array) -> jax.Array:
    """Negate x for flagged batch elements (reference VPHO.py:359-364).

    pt3d: (B, ..., 3); is_flip: (B,) bool.
    """
    sign = jnp.where(is_flip.reshape((pt3d.shape[0],) + (1,) * (pt3d.ndim - 1)), -1.0, 1.0)
    mask = jnp.concatenate([sign * jnp.ones_like(pt3d[..., :1]), jnp.ones_like(pt3d[..., 1:])], axis=-1)
    return pt3d * mask
