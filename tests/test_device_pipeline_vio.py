"""Zero-readback device VIO pipeline: frontend + window BA in one jitted
step (frontend/pipeline_vio.py) vs the same VI sequence the host VIO
test uses — nothing transfers until the final drain."""

import numpy as np
import pytest

from svo_pro_universal_tpu.cameras.rig import ImuParams
from svo_pro_universal_tpu.frontend.frame_handler import Stage
from svo_pro_universal_tpu.frontend.pipeline_vio import DevicePipelineVIO
from svo_pro_universal_tpu.frontend.imu_handler import ImuHandler

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config
from test_pipeline_vio import G_W, IMU_RATE

import jax.numpy as jnp
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_conjugate, quat_multiply, quat_normalize, quat_rotate,
    so3_exp)


def simulate_fast(duration=2.4, v0=(0.25, 0.0, 0.06)):
    """Like test_pipeline_vio.simulate but ~3× faster translation —
    the mono frontend needs ~25 mm/frame of parallax at this scene depth
    (the slower VI sim starves the depth filter even without a backend)."""
    def omega(t):
        return np.array([0.02 * np.sin(t), 0.04, -0.03 * np.cos(t)])

    def acc_w(t):
        return np.array([1.0 * np.cos(1.5 * t), 0.4 * np.sin(t),
                         0.3 * np.cos(0.7 * t)])

    dt = 1.0 / IMU_RATE
    n = int(duration * IMU_RATE)
    q = jnp.array([1.0, 0, 0, 0])
    v = jnp.asarray(list(v0))
    p = jnp.zeros(3)
    imu_stream, cam_poses, cam_ts = [], [], []
    per_frame = int(IMU_RATE / 10.0)
    for i in range(n + 1):
        t = i * dt
        a = acc_w(t)
        w = omega(t)
        acc_meas = quat_rotate(quat_conjugate(q),
                               jnp.asarray(a - G_W, jnp.float32))
        imu_stream.append((t, w.astype(np.float32), np.asarray(acc_meas)))
        if i % per_frame == 0:
            cam_poses.append(SE3(q, p).inverse())
            cam_ts.append(t)
        p = p + v * dt + 0.5 * jnp.asarray(a) * dt * dt
        v = v + jnp.asarray(a) * dt
        q = quat_normalize(quat_multiply(
            q, so3_exp(jnp.asarray(w * dt, jnp.float32))))
    return imu_stream, cam_poses, cam_ts


@pytest.mark.slow
def test_device_vio_zero_readback_tracks():
    cfg = make_config()
    cfg.backend.num_keyframes = 5
    cfg.backend.max_iterations = 3
    # this toy scene's landmark count dips to ~10 mid-run before the
    # seed-conversion wave replenishes it (the host handler rides the
    # same trough); the quality gate must not cut to RELOC there
    cfg.base.quality_min_fts = 8
    imu = ImuHandler(ImuParams())
    h = DevicePipelineVIO(cfg, CAM, imu_handler=imu,
                          imu_params=ImuParams(), trace_capacity=64,
                          gravity=tuple(G_W))

    imu_stream, cam_poses, cam_ts = simulate_fast()
    i_imu = 0
    for T, ts in zip(cam_poses, cam_ts):
        while i_imu < len(imu_stream) and imu_stream[i_imu][0] <= ts:
            t, w, a = imu_stream[i_imu]
            imu.add_measurement(t, w, a)
            i_imu += 1
        out = h.add_image(render_sphere_view(T), ts)
        assert out is None              # async: nothing comes back

    mats, meta = h.drain()
    stages = meta[:, 0].astype(int)
    first_track = int(np.argmax(stages == Stage.TRACKING.value))
    assert stages[first_track] == Stage.TRACKING.value
    assert (stages[first_track:] == Stage.TRACKING.value).all()
    assert meta[first_track:, 2].sum() >= 2      # keyframes happened

    # the backend actually ran: window has >1 state absorbed
    assert int(np.asarray(h.world.backend_k)) >= 2
    chi2 = float(np.asarray(h.world.backend_chi2))
    assert np.isfinite(chi2) and chi2 > 0.0

    gt = np.stack([np.asarray(T.inverse().t)
                   for T in cam_poses[first_track:]])
    ep = mats[first_track:, :3, 3]
    from svo_pro_universal_tpu.evaluation import ate_rmse
    rmse, a = ate_rmse(ep, gt, align="sim3")
    traj_len = np.linalg.norm(np.diff(gt, axis=0), axis=-1).sum()
    assert rmse < 0.15 * max(traj_len, 0.1), (rmse, traj_len, a.s)


@pytest.mark.slow
def test_device_vio_batched_feed_matches_single():
    """Throughput mode (add_images_batched: one upload + one scanned
    dispatch per B frames) must produce EXACTLY the same world state as
    per-frame feeding — it is the same step program under lax.scan."""
    def run(batched):
        cfg = make_config()
        cfg.backend.num_keyframes = 5
        cfg.base.quality_min_fts = 8
        imu = ImuHandler(ImuParams())
        h = DevicePipelineVIO(cfg, CAM, imu_handler=imu,
                              imu_params=ImuParams(), trace_capacity=32,
                              gravity=tuple(G_W))
        imu_stream, cam_poses, cam_ts = simulate_fast(duration=1.6)
        frames = [np.asarray(render_sphere_view(T)) for T in cam_poses]
        i_imu = 0
        B = 4
        for b0 in range(0, len(frames), B):
            b1 = min(b0 + B, len(frames))
            ts_end = cam_ts[b1 - 1]
            while (i_imu < len(imu_stream)
                   and imu_stream[i_imu][0] <= ts_end):
                t, w, a = imu_stream[i_imu]
                imu.add_measurement(t, w, a)
                i_imu += 1
            if batched:
                h.add_images_batched(frames[b0:b1], cam_ts[b0:b1])
            else:
                for t in range(b0, b1):
                    h.add_image(frames[t], cam_ts[t])
        mats, meta = h.drain()
        return mats, meta

    m1, meta1 = run(batched=False)
    m2, meta2 = run(batched=True)
    assert meta1.shape == meta2.shape
    # the scanned and per-frame programs are the SAME step function but
    # separate XLA compilations — fusion order shifts f32 rounding and
    # the pipeline amplifies it into small feature-count differences.
    # Assert structural equivalence, not bit equality.
    np.testing.assert_array_equal(meta1[:, 0], meta2[:, 0])   # stages
    assert abs(meta1[:, 2].sum() - meta2[:, 2].sum()) <= 2    # keyframes
    assert np.median(np.abs(meta1[:, 1] - meta2[:, 1])) <= 8  # n_tracked
    # trajectories agree to a fraction of the scene scale (the rounding
    # divergence compounds over frames — observed ~5 cm by frame 16 on
    # this 2 m-depth scene)
    d = np.linalg.norm(m1[:, :3, 3] - m2[:, :3, 3], axis=-1)
    assert np.max(d) < 0.1, np.max(d)
