"""Multi-host global map: map-block-partitioned BA over a [host x chip]
mesh (DCN axis) matches the single-device solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.backend.global_map import GlobalMap, \
    GlobalMapOptions
from svo_pro_universal_tpu.parallel.mesh import (
    FEATURE_AXIS, HOST_AXIS, make_mesh_2d)
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_conjugate, quat_rotate, so3_exp)


def _feed(gm, rng, lm, n_kf=10):
    chi2 = None
    true_p = []
    for k in range(n_kf):
        tw = jnp.asarray([0.15 * k, 0.05 * np.sin(k), 0.02 * k,
                          0.0, 0.02 * k, 0.01 * k], jnp.float32)
        T_w_b = SE3(so3_exp(tw[3:]), tw[:3])
        true_p.append(np.asarray(T_w_b.t))
        dp = (rng.normal(0, 0.03, 3).astype(np.float32)
              if k > 0 else np.zeros(3, np.float32))
        T_cam_world = SE3(T_w_b.q, T_w_b.t + dp).inverse()
        pb = quat_rotate(quat_conjugate(T_w_b.q),
                         jnp.asarray(lm) - T_w_b.t[None])
        f = np.asarray(pb / jnp.linalg.norm(pb, axis=-1, keepdims=True))
        lids = np.where(np.asarray(pb[:, 2] > 0.3), np.arange(len(lm)), -1)
        lm_noisy = lm + rng.normal(0, 0.02, lm.shape).astype(np.float32)
        out = gm.add_keyframe(k, T_cam_world, lids, f, lm_noisy)
        chi2 = out if out is not None else chi2
    return chi2, np.stack(true_p)


@pytest.mark.parametrize("shape,axes", [
    ((2, 4), (HOST_AXIS, FEATURE_AXIS)),   # 2 hosts x 4 chips over DCN+ICI
    ((8, 1), (HOST_AXIS,)),                # pure multi-host partitioning
])
@pytest.mark.slow
def test_dcn_partitioned_global_map_matches_single(shape, axes):
    if len(jax.devices()) < shape[0] * shape[1]:
        pytest.skip("needs 8 virtual devices")
    opts = GlobalMapOptions(max_keyframes=12, max_landmarks=256,
                            max_obs=4096, optimize_every=100, ba_iters=6)
    lm = np.random.default_rng(7).uniform(
        [-2, -2, 2], [2, 2, 6], (80, 3)).astype(np.float32)

    gm_ref = GlobalMap(300.0, SE3.identity(), opts)
    rng = np.random.default_rng(11)
    _feed(gm_ref, rng, lm)
    chi_ref = gm_ref.force_optimize()

    mesh = make_mesh_2d(shape[0], shape[1])
    gm_dcn = GlobalMap(300.0, SE3.identity(), opts, mesh=mesh,
                       mesh_axes=axes)
    rng = np.random.default_rng(11)
    _feed(gm_dcn, rng, lm)
    chi_dcn = gm_dcn.force_optimize()

    p_ref, _ = gm_ref.keyframe_poses()
    p_dcn, _ = gm_dcn.keyframe_poses()
    np.testing.assert_allclose(p_dcn, p_ref, atol=5e-4)
    assert abs(chi_dcn - chi_ref) < 0.02 * max(chi_ref, 1.0)

    # landmark feedback unaffected by the partitioned layout
    u_ref, x_ref = gm_ref.optimized_landmarks()
    u_dcn, x_dcn = gm_dcn.optimized_landmarks()
    assert set(u_dcn.tolist()) == set(u_ref.tolist())
    order_r = np.argsort(u_ref)
    order_d = np.argsort(u_dcn)
    np.testing.assert_allclose(x_dcn[order_d], x_ref[order_r], atol=5e-4)


def test_dcn_global_map_accuracy(rng):
    """Partitioned solve also actually refines the noisy poses."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    opts = GlobalMapOptions(max_keyframes=12, max_landmarks=256,
                            max_obs=4096, optimize_every=3, ba_iters=6)
    lm = rng.uniform([-2, -2, 2], [2, 2, 6], (80, 3)).astype(np.float32)
    mesh = make_mesh_2d(2, 4)
    gm = GlobalMap(300.0, SE3.identity(), opts, mesh=mesh,
                   mesh_axes=(HOST_AXIS, FEATURE_AXIS))
    chi2, true_p = _feed(gm, rng, lm)
    assert chi2 is not None, "BA never ran"
    gm.force_optimize()
    p_opt, _ = gm.keyframe_poses()
    errs = np.linalg.norm(p_opt - true_p, axis=-1)
    assert errs[1:].mean() < 0.03, errs
