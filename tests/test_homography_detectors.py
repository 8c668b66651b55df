"""Homography init on a planar scene + extra detector variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.frontend import initialization as init
from svo_pro_universal_tpu.ops import detector as det
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp, so3_log, \
    quat_multiply, quat_conjugate

from synthetic_utils import CAM


def planar_correspondences(rng, n=80, plane_z=2.5, slope=(0.3, -0.2)):
    """Points on a plane seen from two views (degenerate for 8pt E)."""
    uv = rng.uniform([-0.4, -0.3], [0.4, 0.3], (n, 2)).astype(np.float32)
    nvec = np.array([slope[0], slope[1], 1.0], np.float32)
    f = np.concatenate([uv, np.ones((n, 1), np.float32)], -1)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    depth = plane_z / (f @ nvec)
    pts = jnp.asarray(f * depth[:, None])
    f_ref = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    return pts, f_ref


def test_homography_init_on_planar_scene(rng):
    pts, f_ref = planar_correspondences(rng)
    T_true = se3_exp(jnp.asarray([0.25, -0.1, 0.05, 0.02, 0.05, -0.03]))
    p_cur = T_true.apply(pts)
    f_cur = p_cur / jnp.linalg.norm(p_cur, axis=-1, keepdims=True)
    res = init.homography_relative_pose(
        f_ref, f_cur, jnp.ones(pts.shape[0], bool),
        jax.random.PRNGKey(0), CAM.focal_length)
    assert int(res.n_inliers) > 60
    t_est = np.asarray(res.T_cur_ref.t)
    t_true = np.asarray(T_true.t) / np.linalg.norm(np.asarray(T_true.t))
    assert abs(float(np.dot(t_est, t_true))) > 0.99
    dq = so3_log(quat_multiply(quat_conjugate(res.T_cur_ref.q), T_true.q))
    assert float(jnp.linalg.norm(dq)) < 0.01


def _edge_image():
    img = np.zeros((64, 96), np.float32)
    img[:, 48:] = 180.0
    img[20:40, 10:30] = 120.0
    return jnp.asarray(img)


def test_canny_score_fires_on_edges_only():
    s = np.asarray(det.canny_score_map(_edge_image()))
    assert s[:, 46:50].max() > 100.0        # strong vertical edge
    assert s[5:15, 60:90].max() == 0.0      # flat region


def test_sobel_and_gradhm_scores():
    img = _edge_image()
    dx, dy = det.sobel_gradient(img)
    assert float(jnp.abs(dx[32, 47])) > 300.0
    hm = np.asarray(det.grad_huang_mumford_score_map(img))
    assert hm[32, 47] > 100.0
    assert hm[5, 70] == pytest.approx(0.0, abs=1e-3)
    # saturation: score bounded by 255
    assert hm.max() <= 255.0


@pytest.mark.parametrize("kind", ["sobel", "canny", "gradhm", "allpixels",
                                  "grid_grad"])
def test_detector_variants_run(kind):
    img = _edge_image()
    pyr = build_pyramid(img, 3)
    cs = 16
    n_cols, n_rows = 6, 4
    out = det.detect_features(
        pyr, jnp.zeros((n_cols * n_rows,), bool), cs, n_cols, n_rows,
        max_features=24, threshold_primary=10.0, threshold_secondary=50.0,
        detector_type=kind)
    assert bool(np.asarray(out.valid).any())
