"""Global map: keyframe absorption + large-window vision-only BA."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.backend.global_map import GlobalMap, \
    GlobalMapOptions
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_conjugate, quat_normalize, quat_multiply, quat_rotate,
    so3_exp)


def test_global_map_refines_absorbed_keyframes(rng):
    lm = rng.uniform([-2, -2, 2], [2, 2, 6], (80, 3)).astype(np.float32)
    n_kf = 10
    gm = GlobalMap(300.0, SE3.identity(),
                   GlobalMapOptions(max_keyframes=16, optimize_every=3,
                                    ba_iters=6))
    chi2 = None
    true_p = []
    for k in range(n_kf):
        # ground-truth pose on an arc
        tw = jnp.asarray([0.15 * k, 0.05 * np.sin(k), 0.02 * k,
                          0.0, 0.02 * k, 0.01 * k], jnp.float32)
        T_w_b = SE3(so3_exp(tw[3:]), tw[:3])
        true_p.append(np.asarray(T_w_b.t))
        # noisy pose fed in (except the first: gauge)
        dp = (rng.normal(0, 0.03, 3).astype(np.float32)
              if k > 0 else np.zeros(3, np.float32))
        T_w_b_noisy = SE3(T_w_b.q, T_w_b.t + dp)
        T_cam_world = T_w_b_noisy.inverse()
        pb = quat_rotate(quat_conjugate(T_w_b.q),
                         jnp.asarray(lm) - T_w_b.t[None])
        vis = np.asarray(pb[:, 2] > 0.3)
        f = np.asarray(pb / jnp.linalg.norm(pb, axis=-1, keepdims=True))
        lids = np.where(vis, np.arange(80), -1)
        lm_noisy = lm + rng.normal(0, 0.02, lm.shape).astype(np.float32)
        out = gm.add_keyframe(k, T_cam_world, lids, f, lm_noisy)
        if out is not None:
            chi2 = out
    assert len(gm) == n_kf
    assert chi2 is not None, "BA never ran"
    gm.force_optimize()

    p_opt, ids = gm.keyframe_poses()
    errs = np.linalg.norm(p_opt - np.stack(true_p), axis=-1)
    # fed noise ~0.045 mean norm; BA reduces it (a ~0.025 common-mode
    # offset remains — gauge/conditioning item tracked for round 2)
    assert errs[1:].mean() < 0.03, errs

    # fixed-landmark feedback query
    T_query = SE3.identity()
    lids_out, pos = gm.fixed_landmarks(T_query, max_out=20)
    assert len(lids_out) > 0
    assert (lids_out >= 0).all()
