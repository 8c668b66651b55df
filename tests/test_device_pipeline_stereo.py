"""Zero-readback stereo device pipeline: metric scale from frame one,
joint two-camera alignment, stereo re-triangulation at keyframes — one
stacked upload per frame, trajectory drained once at the end."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.frontend.frame_handler import Stage
from svo_pro_universal_tpu.frontend.pipeline_stereo import (
    DevicePipelineStereo)

from synthetic_utils import CAM
from test_pipeline_mono import make_config, trajectory
from test_pipeline_stereo import (
    BASELINE, T_BODY_CAM0, T_BODY_CAM1, stereo_pair)


@pytest.mark.slow
def test_device_stereo_pipeline_metric_scale():
    cfg = make_config()
    cfg.pipeline_is_stereo = True
    cfg.stereo.mean_depth_inv = 1.0 / 2.0
    cfg.stereo.min_depth_inv = 1.0 / 0.5
    cfg.stereo.max_depth_inv = 1.0 / 10.0
    n_frames = 20
    gt = trajectory(n_frames)
    h = DevicePipelineStereo(cfg, CAM, CAM, T_BODY_CAM0, T_BODY_CAM1,
                             trace_capacity=64)
    for t in range(n_frames):
        img0, img1 = stereo_pair(gt[t])
        out = h.add_image_pair(img0, img1, t * 0.05)
        assert out is None                  # async: nothing comes back

    mats, meta = h.drain()
    stages = meta[:, 0].astype(int)
    start = int(np.argmax(stages == Stage.TRACKING.value))
    assert start <= 1, "stereo init must be immediate"
    assert (stages[start:] == Stage.TRACKING.value).all()

    gt_pos = np.stack([np.asarray(p.inverse().t) for p in gt[start:]])
    est_pos = mats[start:, :3, 3]
    gt_rel = gt_pos - gt_pos[0]
    est_rel = est_pos - est_pos[0]
    # metric, UNALIGNED: stereo scale errors show up directly
    ate = np.sqrt(np.mean(np.sum((gt_rel - est_rel) ** 2, axis=-1)))
    traj_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=-1).sum()
    assert ate < 0.15 * max(traj_len, 0.1), (ate, traj_len)
