"""Pose optimizer + structure optimizer tests with exact synthetic geometry."""

import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.ops import pose_optimizer as po
from svo_pro_universal_tpu.ops import structure_optimizer as so
from svo_pro_universal_tpu.cameras.projections import Camera, backproject
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp, se3_log

CAM = Camera.pinhole(150.0, 150.0, 80.0, 60.0, 160, 120)


def scene_points(rng, n=60):
    pts = np.stack([
        rng.uniform(-1.5, 1.5, n), rng.uniform(-1.0, 1.0, n),
        rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
    return jnp.asarray(pts)


def observe(T_body_world, pts_w, T_cam_body=None, noise=0.0, rng=None):
    T_cam_body = T_cam_body or SE3.identity()
    p_cam = T_cam_body.apply(T_body_world.apply(pts_w))
    f = p_cam / jnp.linalg.norm(p_cam, axis=-1, keepdims=True)
    if noise > 0:
        d = jnp.asarray(rng.normal(0, noise, f.shape).astype(np.float32))
        f = f + d
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    return f


def make_featset(pts_w, f, n_edge=0):
    n = pts_w.shape[0]
    is_edge = jnp.arange(n) < n_edge
    return po.PoseOptFeatures(
        xyz_world=pts_w, f=f,
        grad=jnp.tile(jnp.array([[1.0, 0.0]]), (n, 1)),
        level=jnp.zeros((n,), jnp.int32),
        is_edgelet=is_edge, valid=jnp.ones((n,), bool),
        T_cam_body=SE3.identity(), cam=CAM)


def pose_err(T_est, T_true):
    e = np.asarray(se3_log(T_est.inverse().compose(T_true)))
    return np.linalg.norm(e[:3]), np.linalg.norm(e[3:])


def test_pose_opt_recovers_perturbed_pose(rng):
    pts = scene_points(rng)
    T_true = se3_exp(jnp.array([0.1, -0.05, 0.2, 0.02, -0.03, 0.05]))
    f = observe(T_true, pts)
    T_init = se3_exp(jnp.array([0.02, 0.03, -0.02, 0.01, 0.01, -0.02])
                     ).compose(T_true)
    res = po.optimize_pose([make_featset(pts, f)], T_init)
    dt, dr = pose_err(res.T_body_world, T_true)
    assert dt < 1e-3 and dr < 1e-3, (dt, dr)
    assert int(res.n_inliers) == pts.shape[0]


def test_pose_opt_rejects_outliers(rng):
    pts = scene_points(rng, n=80)
    T_true = se3_exp(jnp.array([0.0, 0.0, 0.1, 0.0, 0.02, 0.0]))
    f = observe(T_true, pts, noise=5e-4, rng=rng)
    # corrupt 15 observations badly
    f_np = np.asarray(f).copy()
    f_np[:15] = f_np[:15] + rng.normal(0, 0.1, (15, 3)).astype(np.float32)
    f_np /= np.linalg.norm(f_np, axis=-1, keepdims=True)
    # pose-opt runs after sparse image alignment → init is already close
    T_init = se3_exp(jnp.array([0.01, -0.008, 0.008, 0.0, 0.0, 0.004])
                     ).compose(T_true)
    res = po.optimize_pose([make_featset(pts, jnp.asarray(f_np))], T_init)
    dt, dr = pose_err(res.T_body_world, T_true)
    assert dt < 8e-3 and dr < 4e-3, (dt, dr)
    inl = np.asarray(res.inlier[0])
    assert inl[15:].mean() > 0.9       # inliers kept
    assert inl[:15].mean() < 0.3       # gross outliers dropped
    assert float(res.error_after_px) < float(res.error_before_px)


def test_pose_opt_edgelets_contribute(rng):
    pts = scene_points(rng, n=40)
    T_true = se3_exp(jnp.array([0.05, 0.0, 0.0, 0.0, 0.0, 0.02]))
    f = observe(T_true, pts)
    T_init = SE3.identity().compose(
        se3_exp(jnp.array([0.02, -0.01, 0.01, 0.005, 0.0, -0.01]))
    ).compose(T_true)
    res = po.optimize_pose([make_featset(pts, f, n_edge=15)], T_init)
    dt, dr = pose_err(res.T_body_world, T_true)
    assert dt < 2e-3 and dr < 2e-3, (dt, dr)


def test_pose_opt_prior_only(rng):
    pts = scene_points(rng, n=10)
    T_true = se3_exp(jnp.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.0]))
    f = observe(T_true, pts)
    fs = make_featset(pts, f)
    fs = fs._replace(valid=jnp.zeros_like(fs.valid))
    T_prior = se3_exp(jnp.array([0.2, -0.1, 0.05, 0.02, 0.0, -0.01]))
    res = po.optimize_pose(
        [fs], SE3.identity(),
        po.PoseOptOptions(prior_lambda=1.0), T_prior=T_prior)
    dt, dr = pose_err(res.T_body_world, T_prior)
    assert dt < 1e-4 and dr < 1e-4, (dt, dr)


def test_structure_opt_refines_points(rng):
    n_pts, n_obs = 30, 6
    pts_true = scene_points(rng, n_pts)
    # observers on a circle around origin
    poses = []
    for k in range(n_obs):
        tw = jnp.asarray([0.4 * np.cos(k), 0.4 * np.sin(k), 0.1 * k,
                          0.0, 0.02 * k, 0.0], jnp.float32)
        poses.append(se3_exp(tw))
    T_stack = SE3(
        jnp.tile(jnp.stack([p.q for p in poses])[None], (n_pts, 1, 1)),
        jnp.tile(jnp.stack([p.t for p in poses])[None], (n_pts, 1, 1)))
    f_obs = []
    for k in range(n_obs):
        f_obs.append(observe(poses[k], pts_true))
    f_obs = jnp.stack(f_obs, axis=1)          # [P, O, 3]
    mask = jnp.ones((n_pts, n_obs), bool)

    pts_noisy = pts_true + jnp.asarray(
        rng.normal(0, 0.05, (n_pts, 3)).astype(np.float32))
    res = so.optimize_points(pts_noisy, f_obs, T_stack, mask,
                             jnp.ones((n_pts,), bool), n_iter=8)
    err0 = np.linalg.norm(np.asarray(pts_noisy - pts_true), axis=-1)
    err1 = np.linalg.norm(np.asarray(res.xyz - pts_true), axis=-1)
    assert np.median(err1) < 0.05 * np.median(err0), (np.median(err0),
                                                      np.median(err1))
