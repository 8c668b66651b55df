"""Epipolar matcher + depth filter tests on the synthetic plane scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.common import seed as seed_mod
from svo_pro_universal_tpu.common.types import FeatureType
from svo_pro_universal_tpu.ops import depth_filter as df
from svo_pro_universal_tpu.ops import matcher as m
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp

from synthetic_utils import (
    CAM, PLANE_Z, grid_features, render_plane_view, textured_image)


def test_depth_from_triangulation_exact():
    T = SE3(jnp.array([1.0, 0, 0, 0]), jnp.array([-0.3, 0.0, 0.0]))
    p_ref = jnp.array([[0.2, -0.1, 2.0], [0.0, 0.3, 3.0]])
    f_ref = p_ref / jnp.linalg.norm(p_ref, axis=-1, keepdims=True)
    p_cur = T.apply(p_ref)
    f_cur = p_cur / jnp.linalg.norm(p_cur, axis=-1, keepdims=True)
    depth, ok = m.depth_from_triangulation(T, f_ref, f_cur)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(
        np.asarray(depth), np.linalg.norm(np.asarray(p_ref), axis=-1),
        rtol=1e-4)


def test_compute_tau_positive_and_shrinks_with_baseline():
    f = jnp.array([[0.0, 0.0, 1.0]])
    z = jnp.array([2.0])
    angle = jnp.arctan(1.0 / (2 * 150.0)) * 2.0
    taus = []
    for base in (0.05, 0.2, 0.5):
        T_ref_cur = SE3(jnp.array([1.0, 0, 0, 0]),
                        jnp.array([base, 0.0, 0.0]))
        taus.append(float(df.compute_tau(T_ref_cur, f, z, angle)[0]))
    assert all(t > 0 for t in taus)
    assert taus[0] > taus[1] > taus[2]  # more baseline → less depth error


def test_vogiatzis_update_converges_to_measurement():
    n = 4
    state = seed_mod.make(jnp.full((n,), 1.0), jnp.full((n,), 0.5))
    mu_range = jnp.asarray(1.0 / 0.5)
    z_true = 1.0 / 2.0  # true inverse depth
    apply = jnp.ones((n,), bool)
    for _ in range(30):
        z = jnp.full((n,), z_true)
        state, div = df.update_vogiatzis(state, z, jnp.full((n,), 1e-4),
                                         mu_range, apply)
        assert not np.asarray(div).any()
    np.testing.assert_allclose(np.asarray(state[:, 0]), z_true, atol=1e-2)
    assert np.all(np.asarray(state[:, 1]) < 1e-3)  # variance collapsed
    # inlier ratio a/(a+b) should be high after consistent measurements
    a, b = np.asarray(state[:, 2]), np.asarray(state[:, 3])
    assert np.all(a / (a + b) > 0.7)


def test_vogiatzis_outlier_measurements_lower_inlier_ratio():
    n = 1
    state = seed_mod.make(jnp.full((n,), 1.0), jnp.full((n,), 0.5))
    mu_range = jnp.asarray(2.0)
    apply = jnp.ones((n,), bool)
    rng = np.random.default_rng(0)
    for _ in range(30):
        z = jnp.asarray(rng.uniform(0.1, 2.0, size=(n,)).astype(np.float32))
        state, _ = df.update_vogiatzis(state, z, jnp.full((n,), 1e-4),
                                       mu_range, apply)
    a, b = np.asarray(state[:, 2]), np.asarray(state[:, 3])
    assert np.all(a / (a + b) < 0.5)


def _match_setup(twist, d_bracket=(0.8, 4.0), n_grid=8):
    img_ref = textured_image()
    T_cur_ref = se3_exp(jnp.asarray(twist, jnp.float32))
    img_cur = render_plane_view(img_ref, T_cur_ref)
    pyr_ref = build_pyramid(img_ref, 4)
    pyr_cur = build_pyramid(img_cur, 4)
    px, f, depth = grid_features(n_grid=n_grid)
    n = px.shape[0]
    return (img_ref, T_cur_ref, px, f, depth, n, pyr_ref, pyr_cur)


def test_epipolar_match_recovers_depth():
    (img_ref, T_cur_ref, px, f, depth, n,
     pyr_ref, pyr_cur) = _match_setup([0.15, 0.0, 0.0, 0.0, 0.0, 0.0])
    match = m.find_epipolar_matches(
        pyr_ref, pyr_cur, CAM, CAM, T_cur_ref,
        px, f, jnp.zeros((n, 2)), jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.int32),
        d_estimate_inv=jnp.full((n,), 1.0 / 3.0),   # wrong initial estimate
        d_min_inv=jnp.full((n,), 1.0 / 0.8),
        d_max_inv=jnp.full((n,), 1.0 / 6.0),
        valid=jnp.ones((n,), bool), max_search_level=2)
    suc = np.asarray(match.success)
    assert suc.mean() > 0.7, suc.mean()
    err = np.abs(np.asarray(match.depth) - np.asarray(depth))[suc]
    assert np.median(err) < 0.03, np.median(err)


def test_update_seeds_converges_to_true_depth():
    img_ref = textured_image()
    pyr_ref = build_pyramid(img_ref, 4)
    px, f, depth_true = grid_features(n_grid=8)
    n = px.shape[0]

    depth_min, depth_mean = 0.5, 4.0     # poor initialization
    state = seed_mod.make(jnp.full((n,), depth_mean), jnp.full((n,), depth_min))
    mu_range = jnp.asarray(1.0 / depth_min)
    ftype = jnp.full((n,), int(FeatureType.CORNER_SEED), jnp.int32)

    baselines = [(0.15, 0.0), (-0.12, 0.05), (0.1, -0.1), (-0.15, -0.05),
                 (0.08, 0.12), (-0.1, 0.1), (0.13, 0.04), (-0.09, -0.11)]
    for bx, by in baselines:
        T_cur_ref = se3_exp(jnp.asarray([bx, by, 0, 0, 0, 0], jnp.float32))
        img_cur = render_plane_view(img_ref, T_cur_ref)
        pyr_cur = build_pyramid(img_cur, 4)
        res = df.update_seeds(
            pyr_ref, pyr_cur, CAM, CAM, T_cur_ref,
            px, f, jnp.zeros((n, 2)), jnp.zeros((n,), jnp.int32),
            ftype, state, mu_range, max_search_level=2,
            sigma2_convergence_threshold=30.0)
        state, ftype = res.seed_state, res.ftype
        all_converged = (np.asarray(ftype)
                         == int(FeatureType.CORNER_SEED_CONVERGED)).all()
        assert int(res.n_updated) > 0 or all_converged

    inv_true = 1.0 / np.asarray(depth_true)
    inv_est = np.asarray(state[:, 0])
    conv = np.asarray(ftype) == int(FeatureType.CORNER_SEED_CONVERGED)
    assert conv.mean() > 0.5, conv.mean()
    err = np.abs(inv_est - inv_true)[conv]
    assert np.median(err) < 0.02, np.median(err)
