"""End-to-end mono VO on a synthetic rendered plane sequence.

The minimal analogue of the reference's EuRoC smoke runs: known camera
trajectory over a textured fronto-parallel plane, rendered exactly; the
pipeline must initialize, track, select keyframes, and keep ATE small.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.config import Config
from svo_pro_universal_tpu.frontend.frame_handler import (
    FrameHandlerMono, Stage, TrackingQuality)
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp

from synthetic_utils import CAM, PLANE_Z, render_plane_view

H, W = CAM.height, CAM.width


def corner_rich_image(seed=7):
    """Smooth texture + scattered bright blocks → strong FAST corners."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (110.0 + 30 * np.sin(x / 9.0) * np.cos(y / 7.0)
           + 20 * np.sin((x + y) / 13.0))
    for _ in range(120):
        cy, cx = rng.integers(4, H - 4), rng.integers(4, W - 4)
        s = rng.integers(2, 4)
        img[cy:cy + s, cx:cx + s] += rng.uniform(40, 90)
    return jnp.asarray(np.clip(img, 0, 255).astype(np.float32))


def trajectory(n_frames):
    """Ground-truth T_cam_world per frame (world = frame-0 camera)."""
    poses = []
    for t in range(n_frames):
        tw = np.array([0.025 * t, 0.012 * np.sin(t * 0.3), 0.004 * t,
                       0.002 * np.sin(t * 0.2), 0.003 * t * 0.1, 0.001 * t],
                      np.float32)
        poses.append(se3_exp(jnp.asarray(tw)))
    return poses


def make_config():
    cfg = Config()
    cfg.capacity.max_fts = 256
    cfg.capacity.max_kfs = 6
    cfg.capacity.max_points = 1024
    cfg.n_pyr_levels = 4          # KLT range ±32px for initialization
    cfg.detector.cell_size = 10
    cfg.detector.threshold_primary = 5.0
    cfg.init.init_min_features = 40
    cfg.init.init_min_tracked = 30
    cfg.init.init_min_inliers = 25
    cfg.init.init_min_disparity = 12.0
    cfg.init.reproj_error_thresh = 1.0
    cfg.depth_filter.seed_convergence_sigma2_thresh = 30.0
    cfg.init.expected_avg_depth = float(PLANE_Z)
    cfg.base.quality_min_fts = 15
    cfg.base.kfselect_numkfs_lower_thresh = 40
    cfg.base.kfselect_numkfs_upper_thresh = 120
    cfg.base.kfselect_min_disparity = 12.0
    cfg.base.kfselect_min_dist_metric = 0.05
    cfg.base.kfselect_min_angle = 6.0
    cfg.reprojector.max_n_features_per_frame = 180
    cfg.reprojector.cell_size = 10
    cfg.img_align.max_level = 2
    cfg.img_align.min_level = 0
    return cfg


@pytest.mark.slow
def test_mono_pipeline_tracks_synthetic_sequence():
    from synthetic_utils import render_sphere_view
    n_frames = 25
    gt = trajectory(n_frames)
    handler = FrameHandlerMono(make_config(), CAM)

    est, valid_from = [], None
    for t in range(n_frames):
        img = render_sphere_view(gt[t])
        res = handler.add_image(img, t * 0.05)
        est.append(res.T_world_cam)
        if handler.stage == Stage.TRACKING and valid_from is None:
            valid_from = t

    assert valid_from is not None and valid_from < 12, \
        f"never initialized (stage={handler.stage})"
    assert handler.stage == Stage.TRACKING

    # ATE with scale alignment (mono): compare positions from init frame on
    gt_pos = np.stack([np.asarray(p.inverse().t) for p in gt[valid_from:]])
    est_pos = np.stack([m[:3, 3] for m in est[valid_from:]])
    # align: translate both to start, fit scale on distances
    gt_rel = gt_pos - gt_pos[0]
    est_rel = est_pos - est_pos[0]
    denom = np.sum(est_rel * est_rel)
    s = np.sum(gt_rel * est_rel) / max(denom, 1e-12)
    ate = np.sqrt(np.mean(np.sum((gt_rel - s * est_rel) ** 2, axis=-1)))
    traj_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=-1).sum()
    # frontend-only VO bound; tightens once the sliding-window BA lands
    assert ate < 0.12 * max(traj_len, 0.1), (ate, traj_len, s)
    # monocular gauge: scale within the expected-depth prior's ballpark
    assert 0.5 < s < 2.0, s
