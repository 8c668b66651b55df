"""IMU handling: measurement buffer, rotation priors, gravity init,
frontend preintegration.

TPU-native replacement for the reference's ImuHandler
(reference: src/svo/src/imu_handler.cpp — PreintegratedImuMeasurement
:51-68 second-order integration, getRelativeRotationPrior:270-297,
getInitialAttitude:458-489, getMeasurementsContainingEdges:~100-160,
temporal stationarity check; options imu_handler.h:49-66; calibration
svo_common imu_calibration.h:14-140). The mutex-guarded deque becomes a
host-side numpy ring; per-frame integration runs as a fixed-budget masked
`lax.scan` so it lives inside the jitted VIO step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.cameras.rig import ImuInitialization, ImuParams
from svo_pro_universal_tpu.utils.transform import (
    SE3, matrix_to_quat, quat_multiply, quat_normalize, quat_rotate, so3_exp)


class ImuWindow(NamedTuple):
    """Fixed-capacity measurement window for jitted integration."""
    t: jax.Array        # [M] seconds
    gyro: jax.Array     # [M, 3]
    acc: jax.Array      # [M, 3]
    valid: jax.Array    # [M] bool


class Preintegrated(NamedTuple):
    """Frontend preintegration Δ(R, v, p) over a window (reference
    :51-68; biases fixed, no covariance — the backend variant carries the
    full covariance)."""
    delta_q: jax.Array   # [4] wxyz, R_i←j
    delta_v: jax.Array   # [3]
    delta_p: jax.Array   # [3]
    dt: jax.Array        # scalar


def preintegrate(window: ImuWindow, gyro_bias: jax.Array,
                 acc_bias: jax.Array) -> Preintegrated:
    """Second-order preintegration over the masked window (one lax.scan)."""
    dts = jnp.diff(window.t)
    pair_ok = window.valid[:-1] & window.valid[1:]
    dts = jnp.where(pair_ok, jnp.maximum(dts, 0.0), 0.0)

    def body(carry, x):
        q, v, p, dt_sum = carry
        dt, w, a = x
        a_r = quat_rotate(q, a)
        p = p + v * dt + 0.5 * a_r * dt * dt
        v = v + a_r * dt
        q = quat_normalize(quat_multiply(q, so3_exp(w * dt)))
        return (q, v, p, dt_sum + dt), None

    init = (jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(0.0))
    xs = (dts, window.gyro[:-1] - gyro_bias, window.acc[:-1] - acc_bias)
    (q, v, p, dt_sum), _ = jax.lax.scan(body, init, xs)
    return Preintegrated(q, v, p, dt_sum)


def gyro_rotation_prior(window: ImuWindow, gyro_bias: jax.Array
                        ) -> jax.Array:
    """Relative body rotation q_i←j over the window from gyro only
    (reference: getRelativeRotationPrior imu_handler.cpp:270-297)."""
    dts = jnp.diff(window.t)
    pair_ok = window.valid[:-1] & window.valid[1:]
    dts = jnp.where(pair_ok, jnp.maximum(dts, 0.0), 0.0)

    def body(q, x):
        dt, w = x
        return quat_normalize(quat_multiply(q, so3_exp(w * dt))), None

    q, _ = jax.lax.scan(body, jnp.array([1.0, 0.0, 0.0, 0.0]),
                        (dts, window.gyro[:-1] - gyro_bias))
    return q


def initial_attitude_from_gravity(acc: jax.Array) -> jax.Array:
    """q_body_world aligning measured specific force with +z gravity
    (reference: getInitialAttitude imu_handler.cpp:458-489)."""
    z = acc / jnp.maximum(jnp.linalg.norm(acc), 1e-9)
    p = jnp.array([1.0, 0.0, 0.0])
    p_alt = jnp.array([0.0, 1.0, 0.0])
    p = jnp.where(jnp.abs(jnp.dot(z, p)) > jnp.abs(jnp.dot(z, p_alt)),
                  p_alt, p)
    y = jnp.cross(z, p)
    y = y / jnp.maximum(jnp.linalg.norm(y), 1e-9)
    x = jnp.cross(y, z)
    C = jnp.stack([x, y, z], axis=1)   # world axes in body coords
    return matrix_to_quat(C)


class ImuHandler:
    """Host-side measurement buffer + jitted integration (replaces the
    mutex-guarded deque, imu_handler.h:166-189)."""

    def __init__(self, params: Optional[ImuParams] = None,
                 init: Optional[ImuInitialization] = None,
                 window_size: int = 256):
        self.params = params or ImuParams()
        self.init = init or ImuInitialization()
        self.window_size = window_size
        self._t = []
        self._gyro = []
        self._acc = []
        self.gyro_bias = jnp.asarray(self.init.omega_bias, jnp.float32)
        self.acc_bias = jnp.asarray(self.init.acc_bias, jnp.float32)
        self._bias_np_cache = None      # (id(gyro_bias), np value)

    def _gyro_bias_np(self) -> np.ndarray:
        """Host copy of the gyro bias, re-fetched only when it changes."""
        if (self._bias_np_cache is None
                or self._bias_np_cache[0] is not self.gyro_bias):
            self._bias_np_cache = (self.gyro_bias,
                                   np.asarray(self.gyro_bias))
        return self._bias_np_cache[1]

    def add_measurement(self, t: float, gyro, acc) -> None:
        self._t.append(float(t))
        self._gyro.append(np.asarray(gyro, np.float32))
        self._acc.append(np.asarray(acc, np.float32))
        # bound host memory: drop very old entries
        if len(self._t) > 20000:
            self._t = self._t[-10000:]
            self._gyro = self._gyro[-10000:]
            self._acc = self._acc[-10000:]

    def window_between(self, t0: float, t1: float) -> ImuWindow:
        """Fixed-size padded window covering [t0, t1] with edge samples
        (reference: getMeasurementsContainingEdges). Timestamps are shifted
        by the cam-IMU delay."""
        d = self.params.delay_imu_cam
        t0, t1 = t0 - d, t1 - d
        ts = np.asarray(self._t, np.float64)
        m = self.window_size
        if len(ts) == 0:
            z = np.zeros((m, 3), np.float32)
            return ImuWindow(jnp.zeros((m,)), jnp.asarray(z), jnp.asarray(z),
                             jnp.zeros((m,), bool))
        i0 = max(int(np.searchsorted(ts, t0, "right")) - 1, 0)
        i1 = min(int(np.searchsorted(ts, t1, "left")) + 1, len(ts))
        sel = slice(i0, min(i1, i0 + m))
        tt = ts[sel]
        n = len(tt)
        t_pad = np.full((m,), tt[-1] if n else 0.0, np.float64)
        t_pad[:n] = tt
        g = np.zeros((m, 3), np.float32)
        a = np.zeros((m, 3), np.float32)
        g[:n] = np.stack(self._gyro[sel])
        a[:n] = np.stack(self._acc[sel])
        v = np.zeros((m,), bool)
        v[:n] = True
        # relative times keep f32 precision on device
        t_rel = (t_pad - t_pad[0]).astype(np.float32)
        return ImuWindow(jnp.asarray(t_rel), jnp.asarray(g), jnp.asarray(a),
                         jnp.asarray(v))

    def window_packed(self, t0: float, t1: float) -> np.ndarray:
        """Like :meth:`window_between` but ONE packed numpy [M, 8] array
        (t_rel, gyro×3, acc×3, valid) with times RELATIVE to ``t1`` —
        a single host→device upload per frame instead of four (each
        upload pays tunnel latency on the per-frame path)."""
        d = self.params.delay_imu_cam
        t0s, t1s = t0 - d, t1 - d
        m = self.window_size
        out = np.zeros((m, 8), np.float32)
        ts = np.asarray(self._t, np.float64)
        if len(ts) == 0:
            return out
        i0 = max(int(np.searchsorted(ts, t0s, "right")) - 1, 0)
        i1 = min(int(np.searchsorted(ts, t1s, "left")) + 1, len(ts))
        sel = slice(i0, min(i1, i0 + m))
        tt = ts[sel]
        n = len(tt)
        if n == 0:
            return out
        # relative to the delay-SHIFTED endpoint t1s: the device mask
        # compares against camera-clock boundaries (last_kf_ts − ts, 0],
        # so with delay_imu_cam ≠ 0 an un-shifted t_rel would offset the
        # integrated interval by the delay at both ends (ADVICE r3 low)
        out[:n, 0] = (tt - t1s).astype(np.float32)
        out[n:, 0] = out[n - 1, 0]
        out[:n, 1:4] = np.stack(self._gyro[sel])
        out[:n, 4:7] = np.stack(self._acc[sel])
        out[:n, 7] = 1.0
        return out

    def relative_rotation_prior(self, t0: float, t1: float,
                                T_cam_body: SE3) -> SE3:
        """Camera-frame rotation prior R_cam1_cam0 from gyro integration
        (reference: getRelativeRotationPrior + frame_handler usage)."""
        w = self.window_between(t0, t1)
        q_b0_b1 = gyro_rotation_prior(w, self.gyro_bias)
        # T_c1_c0 = T_cam_body · (R_b0_b1)⁻¹ · T_cam_body⁻¹  (rotation only)
        q_cb = T_cam_body.q
        q = quat_multiply(
            q_cb, quat_multiply(
                jnp.array([1.0, -1.0, -1.0, -1.0]) * q_b0_b1,
                jnp.array([1.0, -1.0, -1.0, -1.0]) * q_cb))
        return SE3(quat_normalize(q), jnp.zeros(3))

    def relative_rotation_prior_np(self, t0: float, t1: float,
                                   R_cam_body: np.ndarray) -> np.ndarray:
        """Host-side (numpy) gyro integration → R_c1_c0 rotation matrix.

        Used on the per-frame host path where a device round-trip per prior
        would dominate (the reference computes this on the CPU too,
        imu_handler.cpp:270-297)."""
        d = self.params.delay_imu_cam
        ts = np.asarray(self._t, np.float64)
        if len(ts) < 2:
            return np.eye(3)
        i0 = max(int(np.searchsorted(ts, t0 - d, "right")) - 1, 0)
        i1 = min(int(np.searchsorted(ts, t1 - d, "left")) + 1, len(ts))
        R = np.eye(3)
        # CACHED numpy bias: np.asarray(device_array) here would be a
        # device→host read EVERY frame (~25 ms on the axon tunnel and it
        # permanently degrades dispatch latency — measured: VIO bench
        # collapsed 131→20 fps through exactly this line)
        bg = self._gyro_bias_np()
        for k in range(i0, i1 - 1):
            dt = ts[k + 1] - ts[k]
            if dt <= 0:
                continue
            w = (np.asarray(self._gyro[k]) - bg) * dt
            th = np.linalg.norm(w)
            if th < 1e-12:
                continue
            a = w / th
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                          [-a[1], a[0], 0]])
            R = R @ (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K)
        # R is R_b0_b1; camera-frame relative: R_c1_c0 = R_cb · R_b0_b1ᵀ · R_cbᵀ
        return R_cam_body @ R.T @ R_cam_body.T

    def initial_attitude(self, t: float) -> Optional[jax.Array]:
        """q_body_world from the accelerometer nearest to t."""
        if not self._t:
            return None
        i = int(np.argmin(np.abs(np.asarray(self._t) - t)))
        return initial_attitude_from_gravity(jnp.asarray(self._acc[i]))

    def is_stationary(self, t: float, window_sec: float = 0.5,
                      acc_sigma_thresh: float = 0.1,
                      gyr_sigma_thresh: float = 0.06) -> Optional[bool]:
        """Temporal stationarity check (reference: checkTemporalStatus,
        imu_handler.cpp — std-dev of acc/gyro over a trailing window)."""
        ts = np.asarray(self._t)
        sel = (ts >= t - window_sec) & (ts <= t)
        if sel.sum() < 5:
            return None
        acc = np.stack(self._acc)[sel]
        gyr = np.stack(self._gyro)[sel]
        return bool(np.all(acc.std(axis=0) < acc_sigma_thresh)
                    and np.all(gyr.std(axis=0) < gyr_sigma_thresh))
