"""SO(3)/SE(3) on unit quaternions, batched, pure JAX.

TPU-native replacement for the reference's minkindr pose types
(reference: 3rd/minkindr/include/kindr/minimal/quat-transformation.h:49,
rotation-quaternion.h). Quaternions are stored ``[w, x, y, z]``; twists are
``[v(3), w(3)]`` (translation first), matching the Jacobian conventions used
by the reference frontend (src/svo_common/include/svo/common/frame.h
``jacobian_xyz2uv``: d(p)/d(twist) = [I | -skew(p)]).

All functions broadcast over arbitrary leading batch dimensions. Small-angle
branches use Taylor expansions selected with ``jnp.where`` so everything is
jit/vmap/grad-safe in float32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternion primitives (wxyz)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    # v' = v + 2 * qv x (qv x v + qw * v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv + qw * v)
    return v + 2.0 * (qw * uv + jnp.cross(qv, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix → unit quaternion (wxyz). Branch-free Shepperd method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(w2, xw, yw, zw):
        return jnp.stack([w2, xw, yw, zw], axis=-1)

    # Four candidate constructions; pick the numerically best per element.
    q0 = mk(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = mk(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = mk(m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21)
    q3 = mk(m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11)

    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    best = jnp.argmax(cands, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4 cand, 4]
    q = jnp.take_along_axis(qs, best[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def matrix_to_quat_np(m) -> "np.ndarray":
    """Host (numpy) rotation matrix → wxyz quaternion — for per-frame
    host paths where one eager device op would pay tunnel dispatch
    latency (e.g. the motion prior in the device pipelines)."""
    import numpy as np
    m = np.asarray(m, np.float64)
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    cands = [tr, m[0, 0] - m[1, 1] - m[2, 2],
             m[1, 1] - m[0, 0] - m[2, 2], m[2, 2] - m[0, 0] - m[1, 1]]
    i = int(np.argmax(cands))
    if i == 0:
        q = np.array([1.0 + tr, m[2, 1] - m[1, 2], m[0, 2] - m[2, 0],
                      m[1, 0] - m[0, 1]])
    elif i == 1:
        q = np.array([m[2, 1] - m[1, 2], 1.0 + m[0, 0] - m[1, 1] - m[2, 2],
                      m[0, 1] + m[1, 0], m[0, 2] + m[2, 0]])
    elif i == 2:
        q = np.array([m[0, 2] - m[2, 0], m[0, 1] + m[1, 0],
                      1.0 + m[1, 1] - m[0, 0] - m[2, 2],
                      m[1, 2] + m[2, 1]])
    else:
        q = np.array([m[1, 0] - m[0, 1], m[0, 2] + m[2, 0],
                      m[1, 2] + m[2, 1],
                      1.0 + m[2, 2] - m[0, 0] - m[1, 1]])
    q = q / np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q.astype(np.float32)


def skew(v: jax.Array) -> jax.Array:
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle vector → quaternion (wxyz)."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    half = 0.5 * theta
    small = theta2 < 1e-8
    # sin(half)/theta, with Taylor sin(x/2)/x ≈ 1/2 - x^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0,
                  jnp.sin(half) / jnp.maximum(theta, _EPS))
    qw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([qw, k * w], axis=-1))


def so3_log(q: jax.Array) -> jax.Array:
    """Quaternion (wxyz) → axis-angle vector."""
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)  # w >= 0 → theta in [0, pi]
    qw = jnp.clip(q[..., 0:1], -1.0, 1.0)
    qv = q[..., 1:4]
    # grad-safe norm: jnp.linalg.norm has a NaN gradient at exactly 0,
    # which poisons jacfwd through residuals evaluated at the identity
    sin_half = jnp.sqrt(jnp.sum(qv * qv, axis=-1, keepdims=True) + 1e-24)
    half = jnp.arctan2(sin_half, qw)
    small = sin_half < 1e-6
    # theta / sin(theta/2) ≈ 2 + theta^2/12 for small theta
    k = jnp.where(small, 2.0 + (2.0 * half) ** 2 / 12.0,
                  2.0 * half / jnp.maximum(sin_half, _EPS))
    return k * qv


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3): exp((w+dw)^) ≈ exp(J_l dw) exp(w^)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    W = skew(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    return eye + a * W + b * W2


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

class SE3(NamedTuple):
    """Rigid transform T: x_out = R(q) x + t. Batched over leading dims."""

    q: jax.Array  # [..., 4] wxyz
    t: jax.Array  # [..., 3]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        q = jnp.broadcast_to(quat_identity(dtype), batch_shape + (4,))
        t = jnp.zeros(batch_shape + (3,), dtype)
        return SE3(q, t)

    @staticmethod
    def from_matrix(m: jax.Array) -> "SE3":
        return SE3(matrix_to_quat(m[..., :3, :3]), m[..., :3, 3])

    def as_matrix(self) -> jax.Array:
        r = quat_to_matrix(self.q)
        top = jnp.concatenate([r, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
            top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    def rotation_matrix(self) -> jax.Array:
        return quat_to_matrix(self.q)

    def apply(self, x: jax.Array) -> jax.Array:
        return quat_rotate(self.q, x) + self.t

    def rotate(self, x: jax.Array) -> jax.Array:
        return quat_rotate(self.q, x)

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: (self @ other)(x) = self(other(x))."""
        return SE3(
            quat_normalize(quat_multiply(self.q, other.q)),
            quat_rotate(self.q, other.t) + self.t,
        )

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return self.compose(other)
        return self.apply(other)

    def inverse(self) -> "SE3":
        qinv = quat_conjugate(self.q)
        return SE3(qinv, -quat_rotate(qinv, self.t))

    def normalized(self) -> "SE3":
        return SE3(quat_normalize(self.q), self.t)


def se3_exp(twist: jax.Array) -> SE3:
    """Twist [v(3), w(3)] → SE3 (full exponential with V-matrix)."""
    v, w = twist[..., 0:3], twist[..., 3:6]
    q = so3_exp(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return SE3(q, t)


def se3_log(T: SE3) -> jax.Array:
    """SE3 → twist [v, w]."""
    w = so3_log(T.q)
    # invert left Jacobian
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    W = skew(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    small = theta2 < 1e-8
    half = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / theta2,
    )
    Vinv = eye - 0.5 * W + cot_term * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([v, w], axis=-1)


def se3_boxplus(T: SE3, twist: jax.Array) -> SE3:
    """Left-multiplicative update: exp(twist) ∘ T (GN solver convention)."""
    return se3_exp(twist).compose(T)


def se3_distance(a: SE3, b: SE3) -> tuple[jax.Array, jax.Array]:
    """(translation distance, rotation angle in radians) between two poses."""
    dt = jnp.linalg.norm(a.t - b.t, axis=-1)
    dq = quat_multiply(quat_conjugate(a.q), b.q)
    ang = jnp.linalg.norm(so3_log(dq), axis=-1)
    return dt, ang


def se3_interpolate(a: SE3, b: SE3, alpha) -> SE3:
    """Geodesic interpolation a ⊕ alpha * log(a⁻¹ b) (used for IMU/cam sync)."""
    d = a.inverse().compose(b)
    tw = se3_log(d)
    return a.compose(se3_exp(alpha * tw))
