"""SLAM pipeline: loop trajectory → loop closure + PGO correction."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.backend.loop_closing import LoopClosingOptions
from svo_pro_universal_tpu.frontend.frame_handler import Stage
from svo_pro_universal_tpu.frontend.slam import FrameHandlerSLAM
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config


def loop_trajectory(n_frames=40, period=28, radius=0.28):
    """1.4 loops: the tail revisits viewpoints that became keyframes after
    initialization (the first few frames are consumed by the two-view
    bootstrap and never enter the keyframe database)."""
    poses = []
    for t in range(n_frames):
        a = 2 * np.pi * t / period
        tw = np.array([radius * np.sin(a), 0.1 * np.sin(2 * a),
                       radius * (1 - np.cos(a)) * 0.5,
                       0.01 * np.sin(a), 0.05 * np.sin(a), 0.0], np.float32)
        poses.append(se3_exp(jnp.asarray(tw)))
    return poses


@pytest.mark.slow
def test_slam_closes_loop_and_corrects():
    cfg = make_config()
    cfg.base.kfselect_min_num_frames_between_kfs = 1
    cfg.base.kfselect_min_disparity = 8.0
    handler = FrameHandlerSLAM(
        cfg, CAM,
        lc_opts=LoopClosingOptions(min_temporal_gap=6, min_similarity=0.8,
                                   min_inliers=12),
        use_global_map=True)
    gt = loop_trajectory()
    for t, T in enumerate(gt):
        res = handler.add_image(render_sphere_view(T), t * 0.1)

    assert handler.stage == Stage.TRACKING
    assert handler._pgo_n >= 6, handler._pgo_n
    assert handler.n_loops_closed >= 1, "no loop closure fired"
    traj = handler.pgo_trajectory()
    assert traj.shape[0] == handler._pgo_n
    # global map absorbed the keyframes
    assert handler.global_map is not None and len(handler.global_map) >= 6
