"""Patch warp, ZMSSD, and subpixel alignment tests on synthetic imagery."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.cameras.projections import Camera
from svo_pro_universal_tpu.ops import alignment as al
from svo_pro_universal_tpu.ops import patch_warp as pw
from svo_pro_universal_tpu.ops.interp import extract_patches
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.utils.transform import SE3, so3_exp


def smooth_image(h=120, w=160):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (120.0 + 40 * np.sin(x / 7.0) * np.cos(y / 5.0)
           + 30 * np.sin((x + y) / 11.0) + 20 * np.cos(x / 3.0 + y / 13.0))
    return img.astype(np.float32)


def test_zmssd_invariant_to_brightness_offset(rng):
    a = jnp.asarray(rng.uniform(0, 255, (5, 64)).astype(np.float32))
    assert np.allclose(np.asarray(pw.zmssd(a, a)), 0.0, atol=1e-3)
    assert np.allclose(np.asarray(pw.zmssd(a, a + 17.0)), 0.0, atol=1e-2)
    b = jnp.asarray(rng.uniform(0, 255, (5, 64)).astype(np.float32))
    assert np.all(np.asarray(pw.zmssd(a, b)) > 1.0)


def test_best_search_level():
    def A(d):
        return jnp.array([[[np.sqrt(d), 0.0], [0.0, np.sqrt(d)]]])
    assert int(pw.best_search_level(A(1.0), 2)[0]) == 0
    assert int(pw.best_search_level(A(3.5), 2)[0]) == 1
    assert int(pw.best_search_level(A(12.1), 2)[0]) == 2
    assert int(pw.best_search_level(A(100.0), 2)[0]) == 2  # clamped


def test_warp_patches_identity_matches_extract():
    img = jnp.asarray(smooth_image())
    centers = jnp.array([[40.0, 50.0], [80.0, 60.0]])
    A = jnp.tile(jnp.eye(2)[None], (2, 1, 1))
    lvl = jnp.zeros((2,), jnp.int32)
    warped, ok = pw.warp_patches(A, img, centers, lvl, 8)
    direct, ok2 = extract_patches(img, centers, 8)
    assert np.asarray(ok).all() and np.asarray(ok2).all()
    np.testing.assert_allclose(np.asarray(warped), np.asarray(direct),
                               atol=1e-3)


def test_affine_warp_matrix_identity_for_same_view():
    cam = Camera.pinhole(300.0, 300.0, 80.0, 60.0, 160, 120)
    px = jnp.array([[80.0, 60.0], [100.0, 40.0]])
    from svo_pro_universal_tpu.cameras.projections import backproject
    f = backproject(cam, px)
    depth = jnp.array([2.0, 3.0])
    A = pw.affine_warp_matrix(cam, cam, px, f, depth, SE3.identity(),
                              jnp.zeros(2, jnp.int32))
    np.testing.assert_allclose(np.asarray(A), np.tile(np.eye(2), (2, 1, 1)),
                               atol=1e-3)


def test_affine_warp_matrix_scale_when_approaching():
    cam = Camera.pinhole(300.0, 300.0, 80.0, 60.0, 160, 120)
    px = jnp.array([[80.0, 60.0]])
    f = jnp.array([[0.0, 0.0, 1.0]])
    depth = jnp.array([4.0])
    # cur camera 2m closer along z → scale factor 4/(4-2) = 2
    T_cur_ref = SE3(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.0, -2.0]))
    A = np.asarray(pw.affine_warp_matrix(cam, cam, px, f, depth, T_cur_ref,
                                         jnp.zeros(1, jnp.int32)))[0]
    np.testing.assert_allclose(A, 2.0 * np.eye(2), atol=1e-2)


def _template_at(img, centers, patch_size):
    border, ok = al.extract_patch_with_border(img, centers, patch_size)
    assert np.asarray(ok).all()
    return al.patch_with_border_to_inner(border, patch_size)


def test_align2d_recovers_subpixel_shift():
    img = jnp.asarray(smooth_image())
    true_px = jnp.array([[40.0, 50.0], [84.0, 61.0], [120.0, 30.0]])
    patch, dx, dy = _template_at(img, true_px, 8)
    init = true_px + jnp.array([[1.5, -1.0], [-2.0, 1.2], [0.7, 1.9]])
    res = al.align2d(img, patch, dx, dy, init, n_iter=20)
    assert np.asarray(res.converged).all()
    # extraction floors the center, so recovered position matches floor(px)
    np.testing.assert_allclose(np.asarray(res.px), np.floor(true_px),
                               atol=0.05)


def test_align2d_with_illumination_offset():
    img = jnp.asarray(smooth_image())
    true_px = jnp.array([[60.0, 40.0]])
    patch, dx, dy = _template_at(img, true_px, 8)
    bright = img + 25.0  # constant offset between frames
    init = true_px + jnp.array([[1.0, -1.5]])
    res = al.align2d(bright, patch, dx, dy, init, n_iter=20,
                     affine_est_offset=True)
    assert np.asarray(res.converged).all()
    np.testing.assert_allclose(np.asarray(res.px), np.floor(true_px), atol=0.1)
    assert np.asarray(res.mean_diff)[0] == pytest.approx(-25.0, abs=1.0)


def test_align1d_moves_only_along_direction():
    img = jnp.asarray(smooth_image())
    true_px = jnp.array([[70.0, 55.0]])
    patch, dx, dy = _template_at(img, true_px, 8)
    direction = jnp.array([[1.0, 0.0]])
    init = true_px + jnp.array([[2.0, 0.0]])
    res = al.align1d(img, direction, patch, dx, dy, init, n_iter=20)
    assert np.asarray(res.converged).all()
    assert np.asarray(res.px)[0, 0] == pytest.approx(70.0, abs=0.1)
    assert np.asarray(res.px)[0, 1] == pytest.approx(55.0, abs=1e-5)


def test_align_pyr_2d_recovers_large_shift():
    base = smooth_image(160, 200)
    shift = (12, 7)  # (dx, dy) integer so shifted image is exact
    cur = np.roll(np.roll(base, shift[1], axis=0), shift[0], axis=1)
    pyr_ref = build_pyramid(jnp.asarray(base), 4)
    pyr_cur = build_pyramid(jnp.asarray(cur), 4)
    px_ref = jnp.array([[80.0, 64.0], [120.0, 96.0]])
    res = al.align_pyr_2d(pyr_ref, pyr_cur, px_ref, px_ref, max_level=3,
                          min_level=0)
    assert np.asarray(res.converged).all()
    expect = np.asarray(px_ref) + np.array(shift)
    np.testing.assert_allclose(np.asarray(res.px), expect, atol=0.2)
