"""Zero-readback N-camera array device pipeline (VERDICT r3 item 5:
"an array pipeline test with ≥3 cameras"): one stacked [3H+1, W] upload
per frame, joint 3-camera alignment, per-pair metric triangulation."""

import numpy as np
import pytest

from svo_pro_universal_tpu.frontend.frame_handler import Stage
from svo_pro_universal_tpu.frontend.pipeline_array import (
    DevicePipelineArray)

from synthetic_utils import CAM
from test_pipeline_mono import make_config, trajectory
from test_pipeline_array import T_BODY_CAMS, bundle


@pytest.mark.slow
def test_device_array_pipeline_three_cameras():
    cfg = make_config()
    cfg.stereo.mean_depth_inv = 1.0 / 2.0
    cfg.stereo.min_depth_inv = 1.0 / 0.5
    cfg.stereo.max_depth_inv = 1.0 / 10.0
    n_frames = 18
    gt = trajectory(n_frames)
    h = DevicePipelineArray(cfg, [CAM, CAM, CAM], T_BODY_CAMS,
                            trace_capacity=64)
    for t in range(n_frames):
        out = h.add_image_bundle(bundle(gt[t]), t * 0.05)
        assert out is None                  # async: nothing comes back

    mats, meta = h.drain()
    stages = meta[:, 0].astype(int)
    start = int(np.argmax(stages == Stage.TRACKING.value))
    assert start <= 1, "array init must be immediate"
    assert (stages[start:] == Stage.TRACKING.value).all()

    gt_pos = np.stack([np.asarray(p.inverse().t) for p in gt[start:]])
    est_pos = mats[start:, :3, 3]
    gt_rel = gt_pos - gt_pos[0]
    est_rel = est_pos - est_pos[0]
    # metric, UNALIGNED: multi-camera scale errors show up directly
    ate = np.sqrt(np.mean(np.sum((gt_rel - est_rel) ** 2, axis=-1)))
    traj_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=-1).sum()
    assert ate < 0.15 * max(traj_len, 0.1), (ate, traj_len)
