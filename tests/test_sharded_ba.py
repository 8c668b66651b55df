"""Distributed BA over the virtual 8-device mesh vs single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from svo_pro_universal_tpu.backend import window_ba as wba
from svo_pro_universal_tpu.parallel.mesh import FEATURE_AXIS
from svo_pro_universal_tpu.parallel.sharded_ba import (
    distributed_optimize, partition_observations)
from svo_pro_universal_tpu.utils.transform import SE3, so3_exp, \
    quat_normalize, quat_multiply

from test_window_ba import _make_window, simulate_vi


@pytest.mark.slow  # compile-bound on the virtual 8-device mesh
def test_distributed_ba_matches_single_device(rng):
    states, segs = simulate_vi()
    w = _make_window(states, segs, obs_noise=5e-4)
    # perturb
    S = w.S
    dq = [jnp.array([1.0, 0, 0, 0])]
    for _ in range(S - 1):
        dq.append(so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3).astype(np.float32))))
    w = w._replace(
        q=quat_normalize(quat_multiply(w.q, jnp.stack(dq))),
        p=w.p + jnp.asarray(np.concatenate(
            [np.zeros((1, 3)), rng.normal(0, 0.04, (S - 1, 3))]
        ).astype(np.float32)))

    opts = wba.BAOptions(max_iter=5)
    cam = SE3.identity()
    focal = jnp.asarray(300.0)

    # single-device (on the same partitioned window for identical obs sets)
    wp, _dropped = partition_observations(w, 8)
    w_single, chi_single = wba.optimize(wp, cam, focal, opts)

    mesh = Mesh(np.array(jax.devices()[:8]), (FEATURE_AXIS,))
    w_multi, chi_multi = distributed_optimize(wp, cam, focal, mesh, opts)

    np.testing.assert_allclose(np.asarray(w_multi.p),
                               np.asarray(w_single.p), atol=2e-4)
    np.testing.assert_allclose(np.asarray(w_multi.q),
                               np.asarray(w_single.q), atol=2e-4)
    assert abs(float(chi_multi) - float(chi_single)) < \
        0.02 * max(float(chi_single), 1.0)


def test_partition_preserves_observations():
    states, segs = simulate_vi()
    w = _make_window(states, segs)
    n_before = int(jnp.sum(w.obs_valid.astype(jnp.int32)))
    wp, _dropped = partition_observations(w, 8)
    n_after = int(jnp.sum(wp.obs_valid.astype(jnp.int32)))
    assert n_after == n_before     # capacity 512/8=64 per shard is enough
    per = w.L // 8
    lm = np.asarray(wp.obs_lm)
    ok = np.asarray(wp.obs_valid)
    per_obs = w.obs_state.shape[0] // 8
    for d in range(8):
        sl = slice(d * per_obs, (d + 1) * per_obs)
        sel = ok[sl]
        assert (lm[sl][sel] // per == d).all()
    assert _dropped == 0


def test_partition_counts_drops():
    """Overflowing a shard's slice must be reported, not silent (ADVICE r2:
    contiguous slot assignment clusters obs in one shard's slice)."""
    w = wba.make_window(3, 16, 16)     # per-shard slice = 2 obs
    # 6 valid observations, all of landmarks in shard 0's slot range [0, 2)
    w = w._replace(
        obs_state=w.obs_state.at[:6].set(0),
        obs_lm=w.obs_lm.at[:6].set(jnp.asarray([0, 1, 0, 1, 0, 1])),
        obs_valid=w.obs_valid.at[:6].set(True))
    wp, dropped = partition_observations(w, 8)
    assert dropped == 4
    assert int(jnp.sum(wp.obs_valid.astype(jnp.int32))) == 2
