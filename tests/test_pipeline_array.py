"""End-to-end 3-camera array VO on the synthetic scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.frontend.frame_handler import (
    FrameHandlerArray, Stage)
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config, trajectory

T_BODY_CAMS = [
    SE3.identity(),
    SE3(jnp.array([1.0, 0, 0, 0]), jnp.array([0.11, 0.0, 0.0])),
    SE3(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.09, 0.0])),
]


def bundle(T_cam0_world: SE3):
    imgs = []
    for T_bc in T_BODY_CAMS:
        T_ci_world = T_bc.inverse().compose(T_cam0_world)
        imgs.append(render_sphere_view(T_ci_world))
    return imgs


@pytest.mark.slow
def test_array_pipeline_tracks_with_metric_scale():
    cfg = make_config()
    cfg.stereo.mean_depth_inv = 1.0 / 2.0
    cfg.stereo.min_depth_inv = 1.0 / 0.5
    cfg.stereo.max_depth_inv = 1.0 / 10.0
    n_frames = 18
    gt = trajectory(n_frames)
    handler = FrameHandlerArray(cfg, [CAM, CAM, CAM], T_BODY_CAMS)

    est, start = [], None
    for t in range(n_frames):
        res = handler.add_image_bundle(bundle(gt[t]), t * 0.05)
        est.append(res.T_world_cam)
        if handler.stage == Stage.TRACKING and start is None:
            start = t

    assert start is not None and start <= 1
    assert handler.stage == Stage.TRACKING
    gt_pos = np.stack([np.asarray(p.inverse().t) for p in gt[start:]])
    est_pos = np.stack([m[:3, 3] for m in est[start:]])
    gt_rel = gt_pos - gt_pos[0]
    est_rel = est_pos - est_pos[0]
    ate = np.sqrt(np.mean(np.sum((gt_rel - est_rel) ** 2, axis=-1)))
    traj_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=-1).sum()
    assert ate < 0.15 * max(traj_len, 0.1), (ate, traj_len)
