"""End-to-end stereo VO on the synthetic sphere+plane scene.

Unlike the mono test, stereo has metric scale from frame one: ATE is
checked WITHOUT scale alignment.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.frontend.frame_handler import (
    FrameHandlerStereo, Stage)
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config, trajectory

BASELINE = 0.11   # EuRoC-like stereo baseline (m)
T_BODY_CAM0 = SE3.identity()
T_BODY_CAM1 = SE3(jnp.array([1.0, 0, 0, 0]),
                  jnp.array([BASELINE, 0.0, 0.0]))


def stereo_pair(T_cam0_world: SE3):
    img0 = render_sphere_view(T_cam0_world)
    T_cam1_world = T_BODY_CAM1.inverse().compose(T_cam0_world)
    img1 = render_sphere_view(T_cam1_world)
    return img0, img1


@pytest.mark.slow
def test_stereo_pipeline_metric_scale():
    cfg = make_config()
    cfg.pipeline_is_stereo = True
    cfg.stereo.mean_depth_inv = 1.0 / 2.0
    cfg.stereo.min_depth_inv = 1.0 / 0.5
    cfg.stereo.max_depth_inv = 1.0 / 10.0
    n_frames = 20
    gt = trajectory(n_frames)
    handler = FrameHandlerStereo(cfg, CAM, CAM, T_BODY_CAM0, T_BODY_CAM1)

    est, start = [], None
    for t in range(n_frames):
        img0, img1 = stereo_pair(gt[t])
        res = handler.add_image_pair(img0, img1, t * 0.05)
        est.append(res.T_world_cam)
        if handler.stage == Stage.TRACKING and start is None:
            start = t

    assert start is not None and start <= 1, "stereo init must be immediate"
    assert handler.stage == Stage.TRACKING

    gt_pos = np.stack([np.asarray(p.inverse().t) for p in gt[start:]])
    est_pos = np.stack([m[:3, 3] for m in est[start:]])
    gt_rel = gt_pos - gt_pos[0]
    est_rel = est_pos - est_pos[0]
    ate = np.sqrt(np.mean(np.sum((gt_rel - est_rel) ** 2, axis=-1)))
    traj_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=-1).sum()
    # metric, unaligned: scale error shows up directly here
    assert ate < 0.15 * max(traj_len, 0.1), (ate, traj_len)
    # explicit scale check over the whole trajectory
    s = np.sum(gt_rel * est_rel) / max(np.sum(est_rel * est_rel), 1e-12)
    assert 0.85 < s < 1.18, s
