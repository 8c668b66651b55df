"""Zero-readback STEREO VIO device pipeline (VERDICT r3 item 5): stereo
frontend + IMU factors + sliding-window backend in one jitted step, one
stacked upload per frame. Metric (unaligned) ATE — stereo + IMU leave no
gauge freedom to hide behind."""

import numpy as np
import pytest

from svo_pro_universal_tpu.cameras.rig import ImuParams
from svo_pro_universal_tpu.frontend.frame_handler import Stage
from svo_pro_universal_tpu.frontend.imu_handler import ImuHandler
from svo_pro_universal_tpu.frontend.pipeline_stereo_vio import (
    DevicePipelineStereoVIO)
from svo_pro_universal_tpu.utils.transform import SE3

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config
from test_pipeline_stereo import T_BODY_CAM0, T_BODY_CAM1
from test_pipeline_vio import G_W
from test_device_pipeline_vio import simulate_fast


def stereo_pair(T_cam0_world: SE3):
    img0 = render_sphere_view(T_cam0_world)
    T_cam1_world = T_BODY_CAM1.inverse().compose(T_cam0_world)
    img1 = render_sphere_view(T_cam1_world)
    return img0, img1


@pytest.mark.slow
def test_device_stereo_vio_zero_readback_metric():
    cfg = make_config()
    cfg.pipeline_is_stereo = True
    cfg.stereo.mean_depth_inv = 1.0 / 2.0
    cfg.stereo.min_depth_inv = 1.0 / 0.5
    cfg.stereo.max_depth_inv = 1.0 / 10.0
    cfg.backend.num_keyframes = 5
    cfg.backend.max_iterations = 3
    imu = ImuHandler(ImuParams())
    h = DevicePipelineStereoVIO(cfg, CAM, CAM, T_BODY_CAM0, T_BODY_CAM1,
                                imu_handler=imu, imu_params=ImuParams(),
                                trace_capacity=64, gravity=tuple(G_W))

    imu_stream, cam_poses, cam_ts = simulate_fast(duration=2.4)
    i_imu = 0
    for T, ts in zip(cam_poses, cam_ts):
        while i_imu < len(imu_stream) and imu_stream[i_imu][0] <= ts:
            t, w, a = imu_stream[i_imu]
            imu.add_measurement(t, w, a)
            i_imu += 1
        img0, img1 = stereo_pair(T)
        out = h.add_image_pair(img0, img1, ts)
        assert out is None                  # async: nothing comes back

    mats, meta = h.drain()
    stages = meta[:, 0].astype(int)
    start = int(np.argmax(stages == Stage.TRACKING.value))
    assert start <= 1, "stereo init must be immediate"
    assert (stages[start:] == Stage.TRACKING.value).all()
    assert meta[start:, 2].sum() >= 2       # keyframes happened

    # the backend actually ran with IMU factors
    assert int(np.asarray(h.world.backend_k)) >= 2
    chi2 = float(np.asarray(h.world.backend_chi2))
    assert np.isfinite(chi2) and chi2 > 0.0

    gt_pos = np.stack([np.asarray(T.inverse().t)
                       for T in cam_poses[start:]])
    est_pos = mats[start:, :3, 3]
    gt_rel = gt_pos - gt_pos[0]
    est_rel = est_pos - est_pos[0]
    # metric, UNALIGNED
    ate = np.sqrt(np.mean(np.sum((gt_rel - est_rel) ** 2, axis=-1)))
    traj_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=-1).sum()
    assert ate < 0.15 * max(traj_len, 0.1), (ate, traj_len)
