"""Pose-graph optimization: loop-closure correction of accumulated drift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.backend import pgo
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp, se3_log


def circle_poses(n, radius=2.0):
    """Ground truth: poses around a circle, heading tangent."""
    out = []
    for k in range(n):
        a = 2 * np.pi * k / n
        tw = jnp.asarray([radius * np.cos(a), radius * np.sin(a), 0.0,
                          0.0, 0.0, a], jnp.float32)
        out.append(se3_exp(tw))
    return out


@pytest.mark.slow
def test_pgo_zero_residual_at_truth():
    n = 12
    gt = circle_poses(n)
    g = pgo.make_graph(16, 32)
    for k, T in enumerate(gt):
        g = g._replace(q=g.q.at[k].set(T.q), t=g.t.at[k].set(T.t),
                       node_valid=g.node_valid.at[k].set(True))
    slot = 0
    for k in range(n - 1):
        T_ij = gt[k].inverse().compose(gt[k + 1])
        g = pgo.add_constraint(g, slot, k, k + 1, T_ij)
        slot += 1
    g2, chi2 = pgo.optimize(g, max_iter=5)
    assert float(chi2) < 1e-8


def test_pgo_corrects_drift_with_loop_closure(rng):
    n = 12
    gt = circle_poses(n)
    g = pgo.make_graph(16, 32)
    # odometry with systematic drift: each relative measurement slightly off
    drift = se3_exp(jnp.asarray([0.08, 0.03, 0.01, 0.005, 0.0, 0.04]))
    est = [gt[0]]
    for k in range(n - 1):
        T_ij_meas = gt[k].inverse().compose(gt[k + 1]).compose(drift)
        est.append(est[-1].compose(T_ij_meas))
    for k in range(n):
        g = g._replace(q=g.q.at[k].set(est[k].q), t=g.t.at[k].set(est[k].t),
                       node_valid=g.node_valid.at[k].set(True))
    slot = 0
    for k in range(n - 1):
        T_ij_meas = gt[k].inverse().compose(gt[k + 1]).compose(drift)
        g = pgo.add_constraint(g, slot, k, k + 1, T_ij_meas)
        slot += 1
    # drift at the end before closure
    err_before = float(jnp.linalg.norm(est[-1].t - gt[-1].t))
    assert err_before > 0.05

    # loop closure: accurate constraint last → first
    T_loop = gt[-1].inverse().compose(gt[0])
    g = pgo.add_constraint(g, slot, n - 1, 0, T_loop,
                           weight_rot=100.0, weight_trans=100.0)
    g2, chi2 = jax.jit(lambda x: pgo.optimize(x, max_iter=25))(g)

    # optimized trajectory distributes the drift: end pose near truth
    err_after = float(jnp.linalg.norm(g2.t[n - 1] - gt[-1].t))
    assert err_after < 0.35 * err_before, (err_before, err_after)
    # average node error improves
    e0 = np.mean([float(jnp.linalg.norm(est[k].t - gt[k].t))
                  for k in range(n)])
    e1 = np.mean([float(jnp.linalg.norm(g2.t[k] - gt[k].t))
                  for k in range(n)])
    # the biased odometry constraints still pull toward the drifted shape;
    # PGO restores global consistency (endpoint) and mildly improves the rest
    assert e1 < e0, (e0, e1)
