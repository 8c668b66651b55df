"""Two-view initializer RANSAC + reprojector tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.cameras.projections import backproject, project
from svo_pro_universal_tpu.common import types as ftypes
from svo_pro_universal_tpu.common.frame import make_empty_frame
from svo_pro_universal_tpu.common.point import add_observations, allocate, make_pool
from svo_pro_universal_tpu.frontend import initialization as init
from svo_pro_universal_tpu.frontend import reprojector as repro
from svo_pro_universal_tpu.frontend.map import (
    insert_keyframe, make_ring, overlap_mask)
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp, se3_log

from synthetic_utils import (
    CAM, PLANE_Z, grid_features, render_plane_view, textured_image)

FT = ftypes.FeatureType


def bearings_for_scene(rng, n=120):
    pts = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.0, 1.0, n),
                    rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
    pts = jnp.asarray(pts)
    f_ref = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    return pts, f_ref


def test_ransac_8pt_recovers_pose(rng):
    pts, f_ref = bearings_for_scene(rng)
    T_true = se3_exp(jnp.array([0.3, -0.1, 0.1, 0.02, -0.04, 0.03]))
    p_cur = T_true.apply(pts)
    f_cur = p_cur / jnp.linalg.norm(p_cur, axis=-1, keepdims=True)
    res = init.ransac_relative_pose(
        f_ref, f_cur, jnp.ones(pts.shape[0], bool),
        jax.random.PRNGKey(0), CAM.focal_length)
    assert int(res.n_inliers) > 100
    # translation is scale-free: compare directions + rotation
    t_est = np.asarray(res.T_cur_ref.t)
    t_true = np.asarray(T_true.t) / np.linalg.norm(np.asarray(T_true.t))
    assert np.abs(np.dot(t_est, t_true)) > 0.999
    dq = np.asarray(se3_log(SE3(res.T_cur_ref.q, jnp.zeros(3)).inverse()
                            .compose(SE3(T_true.q, jnp.zeros(3)))))
    assert np.linalg.norm(dq[3:]) < 2e-3


def test_ransac_8pt_with_outliers(rng):
    pts, f_ref = bearings_for_scene(rng)
    n = pts.shape[0]
    T_true = se3_exp(jnp.array([0.2, 0.1, 0.0, 0.0, 0.02, -0.01]))
    p_cur = T_true.apply(pts)
    f_cur = np.array(p_cur / jnp.linalg.norm(p_cur, axis=-1, keepdims=True))
    f_cur[:25] = rng.normal(size=(25, 3)).astype(np.float32)
    f_cur[:25] /= np.linalg.norm(f_cur[:25], axis=-1, keepdims=True)
    f_cur[:25, 2] = np.abs(f_cur[:25, 2])
    res = init.ransac_relative_pose(
        f_ref, jnp.asarray(f_cur), jnp.ones(n, bool),
        jax.random.PRNGKey(1), CAM.focal_length)
    inl = np.asarray(res.inliers)
    assert inl[25:].mean() > 0.9
    assert inl[:25].mean() < 0.2
    t_est = np.asarray(res.T_cur_ref.t)
    t_true = np.asarray(T_true.t) / np.linalg.norm(np.asarray(T_true.t))
    assert np.abs(np.dot(t_est, t_true)) > 0.995


def test_two_point_with_rotation_prior(rng):
    pts, f_ref = bearings_for_scene(rng)
    T_true = se3_exp(jnp.array([0.25, 0.05, -0.1, 0.01, 0.03, -0.02]))
    p_cur = T_true.apply(pts)
    f_cur = p_cur / jnp.linalg.norm(p_cur, axis=-1, keepdims=True)
    from svo_pro_universal_tpu.utils.transform import quat_to_matrix
    res = init.two_point_relative_pose(
        f_ref, f_cur, jnp.ones(pts.shape[0], bool),
        quat_to_matrix(T_true.q), jax.random.PRNGKey(2), CAM.focal_length)
    t_est = np.asarray(res.T_cur_ref.t)
    t_true = np.asarray(T_true.t) / np.linalg.norm(np.asarray(T_true.t))
    assert np.dot(t_est, t_true) > 0.999
    assert int(res.n_inliers) > 100


def test_rescale_to_mean_depth():
    T = SE3(jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 0.0, 0.0]))
    depths = jnp.array([1.0, 2.0, 3.0, 4.0, 100.0])
    inl = jnp.array([True, True, True, True, False])
    T2, d2, s = init.rescale_to_mean_depth(T, depths, inl, 5.0)
    assert float(s) == 2.5
    assert float(T2.t[0]) == 2.5


def _build_ring_with_kf():
    """One keyframe observing the textured plane with landmark-backed
    features."""
    img_ref = textured_image()
    pyr = build_pyramid(img_ref, 4)
    px, f, depth = grid_features(n_grid=6)
    n = px.shape[0]
    max_fts = 64
    kf = make_empty_frame(pyr, max_fts)
    pool = make_pool(256, 8)
    pts_w = f * depth[:, None]    # kf at identity → world = cam
    pool, slots = allocate(pool, pts_w, jnp.ones((n,), bool))
    pool = add_observations(pool, slots, jnp.zeros((n,), jnp.int32),
                            jnp.arange(n, dtype=jnp.int32),
                            jnp.ones((n,), bool))
    kf = kf._replace(
        px=kf.px.at[:n].set(px),
        f=kf.f.at[:n].set(f),
        ftype=kf.ftype.at[:n].set(int(FT.CORNER)),
        landmark_id=kf.landmark_id.at[:n].set(slots),
        is_keyframe=jnp.asarray(True),
    )
    ring = make_ring(kf, 5)
    ring = insert_keyframe(ring, kf, jnp.asarray(0))
    return img_ref, ring, pool, n


@pytest.mark.slow
def test_reprojector_matches_landmarks():
    img_ref, ring, pool, n = _build_ring_with_kf()
    T_cur_world = se3_exp(jnp.array([0.05, -0.03, 0.04, 0.01, -0.01, 0.02]))
    img_cur = render_plane_view(img_ref, T_cur_world)
    pyr_cur = build_pyramid(img_cur, 4)

    cs = 30
    n_cols = -(-CAM.width // cs)
    n_rows = -(-CAM.height // cs)
    res = repro.reproject(
        ring, pool, T_cur_world, pyr_cur,
        CAM, overlap_mask(ring, T_cur_world, 5),
        jnp.zeros((n_cols * n_rows,), bool), n_cols, n_rows,
        max_search_level=2,
        opts=repro.ReprojectorOptions(cell_size=cs,
                                      max_n_features_per_frame=64))
    v = np.asarray(res.valid)
    assert v.sum() >= 15, v.sum()
    # matched positions should equal exact projections of the landmarks
    xyz = np.asarray(res.xyz_world)[v]
    px_m = np.asarray(res.px)[v]
    uv_true, _ = project(CAM, T_cur_world.apply(jnp.asarray(xyz)))
    err = np.linalg.norm(px_m - np.asarray(uv_true), axis=-1)
    assert np.median(err) < 0.3, np.median(err)
    # landmark ids propagated
    assert (np.asarray(res.landmark_id)[v] >= 0).all()
