"""Backend interface: keyframe feed, marginalization bookkeeping, and
pose correction quality through the sliding window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.backend import window_ba as wba
from svo_pro_universal_tpu.backend.interface import BackendInterface
from svo_pro_universal_tpu.cameras.rig import ImuParams
from svo_pro_universal_tpu.frontend.imu_handler import ImuHandler
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_conjugate, quat_multiply, quat_normalize, quat_rotate,
    so3_exp)

from test_window_ba import simulate_vi, RATE

G = np.array([0.0, 0.0, -9.81])


@pytest.mark.slow
def test_interface_refines_noisy_keyframe_poses(rng):
    n_states = 8                      # exceeds the window → marginalization
    states, segs = simulate_vi(n_states=n_states, state_dt=0.25)
    # landmarks + observations
    lm = rng.uniform([-2, -2, 1.5], [2, 2, 6], (60, 3)).astype(np.float32)

    params = ImuParams()
    imu = ImuHandler(params)
    # feed the full IMU stream once
    t_abs = 0.0
    for k, seg in enumerate(segs):
        base = states["t"][k]
        tt = np.asarray(seg.t) + base
        for i in range(len(tt) - (1 if k < len(segs) - 1 else 0)):
            imu.add_measurement(tt[i], np.asarray(seg.gyro[i]),
                                np.asarray(seg.acc[i]))

    backend = BackendInterface(
        cam_focal=300.0, T_cam_body=SE3.identity(), num_keyframes=5,
        imu_params=params,
        opts=wba.BAOptions(max_iter=6, gravity=(0.0, 0.0, -9.81)))

    errs_in, errs_out = [], []
    for k in range(n_states):
        q, p = states["q"][k], states["p"][k]
        # frontend-style noisy pose (first pose exact: gauge)
        if k == 0:
            dq = jnp.array([1.0, 0, 0, 0])
            dp = jnp.zeros(3)
        else:
            dq = so3_exp(jnp.asarray(
                rng.normal(0, 0.01, 3).astype(np.float32)))
            dp = jnp.asarray(rng.normal(0, 0.03, 3).astype(np.float32))
        T_w_b_noisy = SE3(quat_normalize(quat_multiply(q, dq)), p + dp)
        T_cam_world = T_w_b_noisy.inverse()

        # observations: true bearings in the body/cam frame
        pb = quat_rotate(quat_conjugate(q),
                         jnp.asarray(lm) - p[None])
        vis = np.asarray(pb[:, 2] > 0.3)
        f = np.asarray(pb / jnp.linalg.norm(pb, axis=-1, keepdims=True))
        lids = np.where(vis, np.arange(60), -1)
        lm_noisy = lm + rng.normal(0, 0.02, lm.shape).astype(np.float32)

        out = backend.add_keyframe(
            float(states["t"][k]), T_cam_world, lids, f, lm_noisy,
            imu_handler=imu)
        assert out is not None
        T_corr_w_b = out.T_cam_world.inverse()     # T_cam_body = I
        errs_in.append(float(jnp.linalg.norm(dp)))
        errs_out.append(float(jnp.linalg.norm(T_corr_w_b.t - p)))

    # skip the exact first pose; corrected poses must beat the noisy feed
    assert np.mean(errs_out[1:]) < 0.5 * np.mean(errs_in[1:]), (
        errs_in, errs_out)
    # marginalization happened (window capacity 5 < 8 keyframes)
    assert backend.n_states == 5
    assert bool(backend.window.has_prior)
