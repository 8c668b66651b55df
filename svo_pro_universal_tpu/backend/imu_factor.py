"""IMU preintegration factor: covariance propagation + bias Jacobians +
residual for sliding-window VI bundle adjustment.

TPU-native equivalent of the reference's OKVIS-style ImuError
(reference: extra/svo_ceres_backend/src/imu_error.cpp — propagation with
covariance :292-547, redoPreintegration on bias change :72-290, Evaluate
:549-750; header imu_error.hpp:93-200). Differences by design: the
preintegration runs as one `lax.scan` carrying (Δq, Δv, Δp, P, bias
Jacobians); residual Jacobians w.r.t. the 15-dof local state come from
`jax.jacfwd` instead of 700 lines of hand-derived blocks — exact, and XLA
fuses them into the same program.

Residual convention (Forster et al. / OKVIS):
  r_R = log( (Δq · Exp(J_q_bg · δbg))⁻¹ · q_i⁻¹ · q_j )
  r_v = R_i⁻¹ (v_j − v_i − g Δt) − (Δv + J_v_bg δbg + J_v_ba δba)
  r_p = R_i⁻¹ (p_j − p_i − v_i Δt − ½ g Δt²) − (Δp + J_p_bg δbg + J_p_ba δba)
  r_bg = bg_j − bg_i ;  r_ba = ba_j − ba_i
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.frontend.imu_handler import ImuWindow
from svo_pro_universal_tpu.utils.transform import (
    quat_conjugate, quat_multiply, quat_normalize, quat_rotate,
    quat_to_matrix, skew, so3_exp, so3_log)

GRAVITY = jnp.array([0.0, 0.0, -9.81])


class PreintFactor(NamedTuple):
    """Preintegrated IMU measurement between states i and j."""
    delta_q: jax.Array      # [4]
    delta_v: jax.Array      # [3]
    delta_p: jax.Array      # [3]
    dt: jax.Array           # scalar
    # first-order bias sensitivity (at the linearization bias)
    J_q_bg: jax.Array       # [3, 3] d(log Δq)/d(bg)
    J_v_bg: jax.Array       # [3, 3]
    J_v_ba: jax.Array       # [3, 3]
    J_p_bg: jax.Array       # [3, 3]
    J_p_ba: jax.Array       # [3, 3]
    bias_gyr: jax.Array     # [3] linearization gyro bias
    bias_acc: jax.Array     # [3]
    cov: jax.Array          # [9, 9] covariance of (r_R, r_v, r_p)


def preintegrate_with_cov(window: ImuWindow, bias_gyr: jax.Array,
                          bias_acc: jax.Array, sigma_gyr_c: float,
                          sigma_acc_c: float) -> PreintFactor:
    """Preintegration with covariance + bias Jacobians in one scan
    (reference: imu_error.cpp propagation :292-547)."""
    dts = jnp.diff(window.t)
    pair_ok = window.valid[:-1] & window.valid[1:]
    dts = jnp.where(pair_ok, jnp.maximum(dts, 0.0), 0.0)

    def body(carry, x):
        q, v, p, P, Jq, Jvg, Jva, Jpg, Jpa, dts_sum = carry
        dt, w, a = x
        R = quat_to_matrix(q)
        dq = so3_exp(w * dt)
        dR = quat_to_matrix(dq)
        a_r = R @ a

        # state propagation (second order for p)
        p_new = p + v * dt + 0.5 * a_r * dt * dt
        v_new = v + a_r * dt
        q_new = quat_normalize(quat_multiply(q, dq))

        # error-state transition for (δθ, δv, δp) — δθ body-frame right
        # perturbation of Δq (Forster supplementary eq. for iterative cov)
        A = jnp.zeros((9, 9))
        A = A.at[0:3, 0:3].set(dR.T)
        A = A.at[3:6, 0:3].set(-R @ skew(a) * dt)
        A = A.at[3:6, 3:6].set(jnp.eye(3))
        A = A.at[6:9, 0:3].set(-0.5 * R @ skew(a) * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3))
        # noise input: gyro → δθ, acc → δv/δp
        B = jnp.zeros((9, 6))
        B = B.at[0:3, 0:3].set(jnp.eye(3) * dt)
        B = B.at[3:6, 3:6].set(R * dt)
        B = B.at[6:9, 3:6].set(0.5 * R * dt * dt)
        Q = jnp.diag(jnp.concatenate([
            jnp.full((3,), sigma_gyr_c ** 2), jnp.full((3,), sigma_acc_c ** 2)
        ])) / jnp.maximum(dt, 1e-6)          # continuous → discrete
        P_new = A @ P @ A.T + B @ Q @ B.T
        P_new = jnp.where(dt > 0, P_new, P)

        # bias Jacobians (first order)
        Jq_new = dR.T @ Jq - jnp.eye(3) * dt        # d δθ / d bg
        Jvg_new = Jvg - R @ skew(a) @ Jq * dt       # d Δv / d bg
        Jva_new = Jva - R * dt                      # d Δv / d ba
        Jpg_new = Jpg + Jvg * dt - 0.5 * R @ skew(a) @ Jq * dt * dt
        Jpa_new = Jpa + Jva * dt - 0.5 * R * dt * dt

        keep = dt > 0
        out = [jnp.where(keep, n, o) for n, o in (
            (q_new, q), (v_new, v), (p_new, p), (P_new, P),
            (Jq_new, Jq), (Jvg_new, Jvg), (Jva_new, Jva),
            (Jpg_new, Jpg), (Jpa_new, Jpa))]
        return tuple(out) + (dts_sum + dt,), None

    z3 = jnp.zeros((3, 3))
    init = (jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), jnp.zeros(3),
            jnp.zeros((9, 9)), z3, z3, z3, z3, z3, jnp.asarray(0.0))
    xs = (dts, window.gyro[:-1] - bias_gyr, window.acc[:-1] - bias_acc)
    (q, v, p, P, Jq, Jvg, Jva, Jpg, Jpa, dt_sum), _ = jax.lax.scan(
        body, init, xs)
    # regularize: keep invertible even for empty windows
    P = P + jnp.eye(9) * 1e-10
    return PreintFactor(q, v, p, dt_sum, Jq, Jvg, Jva, Jpg, Jpa,
                        bias_gyr, bias_acc, P)


def imu_residual(factor: PreintFactor,
                 q_i: jax.Array, p_i: jax.Array, v_i: jax.Array,
                 bg_i: jax.Array, ba_i: jax.Array,
                 q_j: jax.Array, p_j: jax.Array, v_j: jax.Array,
                 bg_j: jax.Array, ba_j: jax.Array,
                 gravity: jax.Array = GRAVITY) -> jax.Array:
    """15-dim residual (r_R, r_v, r_p, r_bg, r_ba). States are
    T_world_body poses (q, p) + velocity + biases."""
    dbg = bg_i - factor.bias_gyr
    dba = ba_i - factor.bias_acc
    dt = factor.dt
    R_i_T = quat_to_matrix(q_i).T

    dq_corr = quat_multiply(factor.delta_q, so3_exp(factor.J_q_bg @ dbg))
    q_err = quat_multiply(quat_conjugate(dq_corr),
                          quat_multiply(quat_conjugate(q_i), q_j))
    r_R = so3_log(q_err)
    dv_corr = factor.delta_v + factor.J_v_bg @ dbg + factor.J_v_ba @ dba
    r_v = R_i_T @ (v_j - v_i - gravity * dt) - dv_corr
    dp_corr = factor.delta_p + factor.J_p_bg @ dbg + factor.J_p_ba @ dba
    r_p = R_i_T @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dp_corr
    return jnp.concatenate([r_R, r_v, r_p, bg_j - bg_i, ba_j - ba_i])


def imu_information(factor: PreintFactor, sigma_gyr_bias_c: float,
                    sigma_acc_bias_c: float) -> jax.Array:
    """[15,15] information matrix: inverse preintegration covariance for
    (r_R, r_v, r_p) + random-walk information for the bias residuals."""
    info9 = jnp.linalg.inv(factor.cov)
    info9 = 0.5 * (info9 + info9.T)
    dt = jnp.maximum(factor.dt, 1e-3)
    ibg = jnp.eye(3) / (sigma_gyr_bias_c ** 2 * dt)
    iba = jnp.eye(3) / (sigma_acc_bias_c ** 2 * dt)
    out = jnp.zeros((15, 15))
    out = out.at[:9, :9].set(info9)
    out = out.at[9:12, 9:12].set(ibg)
    out = out.at[12:15, 12:15].set(iba)
    return out
