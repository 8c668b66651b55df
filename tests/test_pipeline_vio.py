"""End-to-end mono VIO: rendered frames + physically consistent IMU."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.cameras.rig import ImuParams
from svo_pro_universal_tpu.frontend.frame_handler import (
    FrameHandlerVIO, Stage)
from svo_pro_universal_tpu.frontend.imu_handler import ImuHandler
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_conjugate, quat_multiply, quat_normalize, quat_rotate,
    so3_exp)

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config

G_W = np.array([0.0, -9.81, 0.0], np.float32)   # world gravity (cam y up)
IMU_RATE = 200.0
CAM_RATE = 10.0


def simulate(duration=2.4, seed=0):
    """Integrate a smooth body trajectory; emit IMU stream + camera poses.

    World = body/camera frame at t=0 (T_cam_body = identity)."""
    def omega(t):
        return np.array([0.02 * np.sin(t), 0.04, -0.03 * np.cos(t)])

    def acc_w(t):
        return np.array([0.5 * np.cos(1.5 * t), 0.2 * np.sin(t),
                         0.15 * np.cos(0.7 * t)])

    dt = 1.0 / IMU_RATE
    n = int(duration * IMU_RATE)
    q = jnp.array([1.0, 0, 0, 0])
    v = jnp.asarray([0.08, 0.0, 0.02])
    p = jnp.zeros(3)
    imu_stream, cam_poses, cam_ts = [], [], []
    per_frame = int(IMU_RATE / CAM_RATE)
    for i in range(n + 1):
        t = i * dt
        a = acc_w(t)
        w = omega(t)
        acc_meas = quat_rotate(quat_conjugate(q),
                               jnp.asarray(a - G_W, jnp.float32))
        imu_stream.append((t, w.astype(np.float32), np.asarray(acc_meas)))
        if i % per_frame == 0:
            T_w_b = SE3(q, p)
            cam_poses.append(T_w_b.inverse())    # T_cam_world
            cam_ts.append(t)
        # integrate
        p = p + v * dt + 0.5 * jnp.asarray(a) * dt * dt
        v = v + jnp.asarray(a) * dt
        q = quat_normalize(quat_multiply(q, so3_exp(jnp.asarray(w * dt,
                                                                jnp.float32))))
    return imu_stream, cam_poses, cam_ts


@pytest.mark.slow
def test_vio_pipeline_tracks_and_uses_backend():
    cfg = make_config()
    cfg.backend.num_keyframes = 5
    cfg.backend.max_iterations = 3
    imu = ImuHandler(ImuParams())
    handler = FrameHandlerVIO(cfg, CAM, imu_handler=imu,
                              imu_params=ImuParams(),
                              gravity=tuple(G_W))

    imu_stream, cam_poses, cam_ts = simulate()
    est, gt_pos = [], []
    i_imu = 0
    for k, (T, ts) in enumerate(zip(cam_poses, cam_ts)):
        while i_imu < len(imu_stream) and imu_stream[i_imu][0] <= ts:
            t, w, a = imu_stream[i_imu]
            handler.add_imu_measurement(t, w, a)
            i_imu += 1
        img = render_sphere_view(T)
        res = handler.add_image(img, ts)
        est.append(res.T_world_cam)
        gt_pos.append(np.asarray(T.inverse().t))

    assert handler.stage == Stage.TRACKING
    assert "backend_chi2" in handler.stats, "backend never ran"

    # ATE with sim3 alignment over the tracked segment
    start = next(i for i, m in enumerate(est)
                 if np.linalg.norm(m[:3, 3]) > 1e-8)
    gt = np.stack(gt_pos[start:])
    ep = np.stack([m[:3, 3] for m in est[start:]])
    from svo_pro_universal_tpu.evaluation import ate_rmse
    rmse, a = ate_rmse(ep, gt, align="sim3")
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=-1).sum()
    assert rmse < 0.15 * max(traj_len, 0.1), (rmse, traj_len, a.s)
