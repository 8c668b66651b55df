"""IMU handler tests: preintegration vs direct integration on synthetic
trajectories (the strategy of the reference's test_imu_error.cpp:66)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.frontend import imu_handler as ih
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_rotate, quat_to_matrix, so3_exp, quat_multiply, quat_normalize)

G = 9.81


def synth_imu(duration=1.0, rate=200.0, omega=(0.3, -0.2, 0.5),
              acc_body=(0.5, 0.2, -0.3)):
    """Constant body rates: analytic ground truth via fine integration."""
    n = int(duration * rate) + 1
    ts = np.arange(n) / rate
    gyro = np.tile(np.asarray(omega, np.float32), (n, 1))
    acc = np.tile(np.asarray(acc_body, np.float32), (n, 1))
    return ts, gyro, acc


def fine_integrate(ts, gyro, acc, substeps=10):
    q = jnp.array([1.0, 0, 0, 0])
    v = jnp.zeros(3)
    p = jnp.zeros(3)
    for i in range(len(ts) - 1):
        dt = (ts[i + 1] - ts[i]) / substeps
        for _ in range(substeps):
            a_r = quat_rotate(q, jnp.asarray(acc[i]))
            p = p + v * dt + 0.5 * a_r * dt * dt
            v = v + a_r * dt
            q = quat_normalize(quat_multiply(q, so3_exp(jnp.asarray(gyro[i]) * dt)))
    return q, v, p


def test_preintegration_matches_fine_integration():
    ts, gyro, acc = synth_imu()
    w = ih.ImuWindow(jnp.asarray(ts, jnp.float32), jnp.asarray(gyro),
                     jnp.asarray(acc), jnp.ones(len(ts), bool))
    pre = ih.preintegrate(w, jnp.zeros(3), jnp.zeros(3))
    q_ref, v_ref, p_ref = fine_integrate(ts, gyro, acc)
    assert float(pre.dt) == pytest.approx(1.0, abs=1e-4)
    np.testing.assert_allclose(np.asarray(pre.delta_q),
                               np.asarray(q_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pre.delta_v),
                               np.asarray(v_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(pre.delta_p),
                               np.asarray(p_ref), atol=5e-3)


def test_preintegration_respects_bias():
    ts, gyro, acc = synth_imu(omega=(0.1, 0.0, 0.0), acc_body=(0, 0, 0))
    w = ih.ImuWindow(jnp.asarray(ts, jnp.float32), jnp.asarray(gyro),
                     jnp.asarray(acc), jnp.ones(len(ts), bool))
    pre = ih.preintegrate(w, jnp.array([0.1, 0.0, 0.0]), jnp.zeros(3))
    # bias exactly cancels the rate → identity rotation
    np.testing.assert_allclose(np.asarray(pre.delta_q),
                               [1, 0, 0, 0], atol=1e-5)


def test_gravity_attitude():
    # gravity reading straight up (+z body) → identity-ish alignment
    q = ih.initial_attitude_from_gravity(jnp.array([0.0, 0.0, 9.81]))
    Rz = quat_to_matrix(q) @ jnp.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(Rz), [0, 0, 1], atol=1e-5)
    # tilted gravity: world z must map to the measured direction
    g = jnp.array([2.0, -1.0, 9.0])
    q2 = ih.initial_attitude_from_gravity(g)
    Rz2 = quat_to_matrix(q2) @ jnp.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(Rz2),
                               np.asarray(g / jnp.linalg.norm(g)), atol=1e-5)


def test_handler_window_and_rotation_prior():
    h = ih.ImuHandler()
    rate = 200.0
    omega = np.array([0.0, 0.0, 0.8], np.float32)
    for i in range(int(rate) + 1):
        h.add_measurement(i / rate, omega, np.array([0, 0, 9.81], np.float32))
    w = h.window_between(0.2, 0.7)
    assert int(w.valid.sum()) >= int(0.5 * rate)
    prior = h.relative_rotation_prior(0.2, 0.7, SE3.identity())
    # body rotated 0.8*0.5 = 0.4 rad about z; prior = R_c1_c0 = inverse
    from svo_pro_universal_tpu.utils.transform import so3_log
    ang = np.asarray(so3_log(prior.q))
    np.testing.assert_allclose(ang, [0, 0, -0.4], atol=0.02)


def test_stationarity_detection(rng):
    h = ih.ImuHandler()
    for i in range(200):
        h.add_measurement(i / 200.0,
                          rng.normal(0, 0.005, 3).astype(np.float32),
                          np.array([0, 0, 9.81], np.float32)
                          + rng.normal(0, 0.01, 3).astype(np.float32))
    assert h.is_stationary(0.9) is True
    h2 = ih.ImuHandler()
    for i in range(200):
        h2.add_measurement(i / 200.0,
                           rng.normal(0, 0.5, 3).astype(np.float32),
                           rng.normal(0, 2.0, 3).astype(np.float32))
    assert h2.is_stationary(0.9) is False
