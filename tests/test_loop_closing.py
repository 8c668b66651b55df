"""Loop closing: place recognition + geometric verification on the
synthetic sphere scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.backend import loop_closing as lc
from svo_pro_universal_tpu.cameras.projections import backproject
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp, so3_log, \
    quat_multiply, quat_conjugate

from synthetic_utils import CAM, render_sphere_view, sphere_depth_along
from test_pipeline_mono import corner_rich_image


def make_snapshot(T_cam_world: SE3):
    """Snapshot with DETECTED corners (the same physical corners appear in
    overlapping views — grid positions would not correspond)."""
    from svo_pro_universal_tpu.ops import detector as det
    from svo_pro_universal_tpu.ops.pyramid import build_pyramid
    img = render_sphere_view(T_cam_world)
    pyr = build_pyramid(img, 3)
    cs = 12
    n_cols = -(-CAM.width // cs)
    n_rows = -(-CAM.height // cs)
    d = det.detect_features(pyr, jnp.zeros((n_cols * n_rows,), bool), cs,
                            n_cols, n_rows, max_features=96,
                            threshold_primary=8.0, detector_type="fast")
    f = backproject(CAM, d.px)
    depth, ok = sphere_depth_along(T_cam_world, f)
    return lc.snapshot_keyframe(img, d.px, f, depth,
                                d.valid & jnp.asarray(np.asarray(ok))), img


def test_descriptor_similarity_structure():
    T0 = SE3.identity()
    T_near = se3_exp(jnp.asarray([0.03, 0.01, 0.0, 0.0, 0.0, 0.01]))
    T_far = se3_exp(jnp.asarray([0.7, 0.3, -0.3, 0.1, 0.4, 0.3]))
    d0 = lc.global_descriptor(render_sphere_view(T0))
    d_near = lc.global_descriptor(render_sphere_view(T_near))
    d_far = lc.global_descriptor(render_sphere_view(T_far))
    assert float(d0 @ d_near) > 0.95
    assert float(d0 @ d_far) < float(d0 @ d_near) - 0.05


@pytest.mark.slow
def test_loop_detection_and_constraint_accuracy():
    opts = lc.LoopClosingOptions(min_temporal_gap=4, min_similarity=0.8,
                                 min_inliers=15)
    closer = lc.LoopClosing(opts)
    # trajectory leaves and returns near the start
    away = [se3_exp(jnp.asarray([0.12 * t, 0.02 * t, 0.0,
                                 0.0, 0.01 * t, 0.0], jnp.float32))
            for t in range(6)]
    T_return = se3_exp(jnp.asarray([0.08, -0.03, 0.02,
                                    0.005, -0.01, 0.008], jnp.float32))
    poses = away + [T_return]

    constraint = None
    for k, T in enumerate(poses):
        snap, _ = make_snapshot(T)
        out = closer.add_keyframe(k, snap, CAM.focal_length)
        if out is not None:
            constraint = out
    assert constraint is not None, "loop not detected"
    assert constraint.kf_id_from == 6
    assert constraint.kf_id_to in (0, 1)

    T_old = poses[constraint.kf_id_to]
    T_true = poses[6].compose(T_old.inverse())
    # translation direction + metric scale
    t_est = np.asarray(constraint.T_cur_old.t)
    t_true = np.asarray(T_true.t)
    cos = np.dot(t_est, t_true) / (
        np.linalg.norm(t_est) * np.linalg.norm(t_true) + 1e-12)
    assert cos > 0.9, (t_est, t_true)
    assert np.linalg.norm(t_est) == pytest.approx(
        np.linalg.norm(t_true), rel=0.6)
    dq = so3_log(quat_multiply(quat_conjugate(constraint.T_cur_old.q),
                               T_true.q))
    assert float(jnp.linalg.norm(dq)) < 0.05


def test_no_false_loop_on_distinct_views():
    opts = lc.LoopClosingOptions(min_temporal_gap=2, min_similarity=0.9)
    closer = lc.LoopClosing(opts)
    for t in range(6):
        T = se3_exp(jnp.asarray([0.4 * t, 0.1 * t, -0.1 * t,
                                 0.02 * t, 0.06 * t, 0.0], jnp.float32))
        snap, _ = make_snapshot(T)
        out = closer.add_keyframe(t, snap, CAM.focal_length)
        assert out is None
