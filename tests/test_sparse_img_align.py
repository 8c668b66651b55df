"""Sparse image alignment on a synthetic textured plane with exact geometry."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.cameras.projections import (
    Camera, backproject, project)
from svo_pro_universal_tpu.ops import sparse_img_align as sia
from svo_pro_universal_tpu.ops.interp import bilinear
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp, se3_log

H, W = 120, 160
CAM = Camera.pinhole(150.0, 150.0, W / 2, H / 2, W, H)
PLANE_Z = 2.0


def ref_image():
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (120.0 + 40 * np.sin(x / 7.0) * np.cos(y / 5.0)
           + 30 * np.sin((x + y) / 11.0) + 20 * np.cos(x / 3.0 + y / 13.0))
    return jnp.asarray(img)


def render_view(img_ref, T_cur_ref: SE3, gain=1.0, offset=0.0):
    """Render the cur view of the textured plane z_ref = PLANE_Z."""
    yy, xx = jnp.mgrid[0:H, 0:W]
    uv = jnp.stack([xx, yy], -1).reshape(-1, 2).astype(jnp.float32)
    f_cur = backproject(CAM, uv)
    T_ref_cur = T_cur_ref.inverse()
    d = T_ref_cur.rotate(f_cur)
    lam = (PLANE_Z - T_ref_cur.t[2]) / d[:, 2]
    p_ref = T_ref_cur.t[None] + lam[:, None] * d
    uv_ref, _ = project(CAM, p_ref)
    vals, _ = bilinear(img_ref, uv_ref)
    return (vals.reshape(H, W) * gain + offset).astype(jnp.float32)


def make_inputs(img_ref, img_cur, n_grid=12):
    us = np.linspace(20, W - 20, n_grid)
    vs = np.linspace(20, H - 20, n_grid)
    uu, vv = np.meshgrid(us, vs)
    px = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32))
    f = backproject(CAM, px)
    depth = PLANE_Z / f[:, 2]          # distance along the bearing
    return sia.CameraInput(
        pyr_ref=build_pyramid(img_ref, 4),
        pyr_cur=build_pyramid(img_cur, 4),
        px_ref=px, f_ref=f, depth_ref=depth,
        valid=jnp.ones((px.shape[0],), bool),
        T_cam_body=SE3.identity(), cam=CAM)


def check_recovery(T_true: SE3, state: sia.AlignState, tol_t=2e-3, tol_r=2e-3):
    err = se3_log(state.T_icur_iref.inverse().compose(T_true))
    err = np.asarray(err)
    assert np.linalg.norm(err[:3]) < tol_t, err
    assert np.linalg.norm(err[3:]) < tol_r, err


def test_align_recovers_small_motion():
    img_ref = ref_image()
    twist = jnp.array([0.02, -0.015, 0.03, 0.004, -0.006, 0.003])
    T_cur_ref = se3_exp(twist)
    img_cur = render_view(img_ref, T_cur_ref)
    inp = make_inputs(img_ref, img_cur)
    opts = sia.SparseImgAlignOptions(max_level=3, min_level=0, max_iter=15)
    state, stats = sia.run([inp], sia.make_state(), opts)
    assert int(stats.n_tracked) > 100
    check_recovery(T_cur_ref, state)


def test_align_larger_motion_coarse_to_fine():
    img_ref = ref_image()
    twist = jnp.array([0.08, 0.05, -0.04, 0.0, 0.0, 0.02])
    T_cur_ref = se3_exp(twist)
    img_cur = render_view(img_ref, T_cur_ref)
    inp = make_inputs(img_ref, img_cur)
    opts = sia.SparseImgAlignOptions(max_level=3, min_level=0, max_iter=20)
    state, _ = sia.run([inp], sia.make_state(), opts)
    check_recovery(T_cur_ref, state, tol_t=5e-3, tol_r=5e-3)


def test_align_with_illumination_change():
    img_ref = ref_image()
    twist = jnp.array([0.02, 0.0, 0.01, 0.0, 0.0, 0.005])
    T_cur_ref = se3_exp(twist)
    img_cur = render_view(img_ref, T_cur_ref, gain=1.08, offset=-12.0)
    inp = make_inputs(img_ref, img_cur)
    opts = sia.SparseImgAlignOptions(
        max_level=3, min_level=0, max_iter=20,
        estimate_alpha=True, estimate_beta=True)
    state, _ = sia.run([inp], sia.make_state(), opts)
    check_recovery(T_cur_ref, state, tol_t=4e-3, tol_r=4e-3)
    # residual model: cur*(1+alpha)+beta == ref  →  1+alpha ≈ 1/1.08
    assert float(state.alpha) == pytest.approx(1 / 1.08 - 1, abs=0.02)


def test_prior_pulls_state_without_features():
    img = ref_image()
    inp = make_inputs(img, img)
    inp = inp._replace(valid=jnp.zeros_like(inp.valid))
    T_prior = se3_exp(jnp.array([0.05, -0.02, 0.01, 0.01, 0.02, -0.01]))
    opts = sia.SparseImgAlignOptions(
        max_level=2, min_level=2, max_iter=15,
        prior_lambda_rot=1.0, prior_lambda_trans=1.0)
    state, _ = sia.run([inp], sia.make_state(), opts, T_prior=T_prior)
    check_recovery(T_prior, state, tol_t=1e-4, tol_r=1e-4)


def test_align_jit_compiles_once():
    import jax
    img_ref = ref_image()
    T_cur_ref = se3_exp(jnp.array([0.02, 0.0, 0.0, 0.0, 0.0, 0.0]))
    img_cur = render_view(img_ref, T_cur_ref)
    inp = make_inputs(img_ref, img_cur)
    opts = sia.SparseImgAlignOptions(max_level=3, min_level=0)

    @jax.jit
    def step(inp, state):
        return sia.run([inp], state, opts)

    state, stats = step(inp, sia.make_state())
    check_recovery(T_cur_ref, state, tol_t=5e-3, tol_r=5e-3)
