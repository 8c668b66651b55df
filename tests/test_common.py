"""Common data model: feature taxonomy masks, seed accessors, frame pytree,
landmark pool, occupancy grid, config loader."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.common import frame as frame_mod
from svo_pro_universal_tpu.common import occupancy, point, seed
from svo_pro_universal_tpu.common import types as ft
from svo_pro_universal_tpu.common.types import FeatureType as F
from svo_pro_universal_tpu.config import Config, load_config
from svo_pro_universal_tpu.utils.robust import (
    huber_weight, mad_scale, masked_median, tukey_weight)
from svo_pro_universal_tpu.utils.solver import gauss_newton
from svo_pro_universal_tpu.utils.transform import SE3


def test_feature_type_predicates():
    t = jnp.arange(12, dtype=jnp.int32)
    assert np.asarray(ft.is_seed(t)).tolist() == [True] * 6 + [False] * 6
    assert bool(ft.is_edgelet(jnp.asarray(int(F.EDGELET_SEED))))
    assert not bool(ft.is_valid(jnp.asarray(int(F.INVALID))))
    assert not bool(ft.is_valid(jnp.asarray(int(F.OUTLIER))))
    conv = ft.seed_to_converged(jnp.asarray(int(F.CORNER_SEED)))
    assert int(conv) == int(F.CORNER_SEED_CONVERGED)
    lm = ft.seed_to_landmark_type(jnp.asarray(int(F.CORNER_SEED_CONVERGED)))
    assert int(lm) == int(F.CORNER)


def test_seed_init_and_convergence():
    depth_mean = jnp.asarray([2.0, 4.0])
    depth_min = jnp.asarray([0.5, 1.0])
    s = seed.make(depth_mean, depth_min)
    np.testing.assert_allclose(seed.depth(s), depth_mean, atol=1e-5)
    mu_range = 1.0 / depth_min
    assert not bool(seed.is_converged(s, mu_range, 200.0)[0])
    s_tight = s.at[:, seed.SIGMA2].set(1e-8)
    assert bool(seed.is_converged(s_tight, mu_range, 200.0)[0])


def test_frame_roundtrip_pytree(rng):
    from svo_pro_universal_tpu.ops.pyramid import build_pyramid
    pyr = build_pyramid(jnp.zeros((64, 80), jnp.float32), 3)
    fr = frame_mod.make_empty_frame(pyr, max_fts=32)
    assert int(fr.num_valid()) == 0
    leaves = jax.tree.leaves(fr)
    assert all(hasattr(l, "shape") for l in leaves)
    # pose accessors
    T = SE3.identity()
    np.testing.assert_allclose(fr.pos(), jnp.zeros(3), atol=1e-6)
    fr2 = jax.jit(lambda f: f._replace(frame_id=f.frame_id + 1))(fr)
    assert int(fr2.frame_id) == 0


def test_landmark_pool_alloc():
    pool = point.make_pool(max_points=16, max_obs=4)
    pos = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    want = jnp.asarray([True, False, True, True])
    pool, slots = point.allocate(pool, pos, want)
    s = np.asarray(slots)
    assert s[1] == -1 and (s[[0, 2, 3]] >= 0).all()
    assert int(pool.cursor) == 3 and int(pool.next_id) == 3
    np.testing.assert_allclose(np.asarray(pool.pos)[s[2]], pos[2], atol=1e-6)
    pool = point.add_observations(
        pool, slots, jnp.full((4,), 5, jnp.int32),
        jnp.arange(4, dtype=jnp.int32), want)
    assert int(pool.n_obs[s[0]]) == 1
    assert int(pool.obs_kf[s[0], 0]) == 5


def test_occupancy_grid():
    g = occupancy.make_grid(80, 60, 20)
    n_cols, _ = occupancy.grid_dims(80, 60, 20)
    px = jnp.asarray([[5.0, 5.0], [75.0, 55.0]])
    g = occupancy.set_occupied(g, px, jnp.asarray([True, True]), 20, n_cols)
    occ = occupancy.is_occupied(g, px, 20, n_cols)
    assert bool(occ[0]) and bool(occ[1])
    assert not bool(occupancy.is_occupied(g, jnp.asarray([[45.0, 5.0]]), 20, n_cols)[0])


def test_robust_weights():
    x = jnp.asarray([0.0, 1.0, 10.0])
    w = tukey_weight(x)
    assert float(w[0]) == 1.0 and float(w[2]) == 0.0
    assert float(huber_weight(jnp.asarray(0.5))) == 1.0
    e = jnp.asarray([1.0, 2.0, 3.0, 100.0])
    m = jnp.asarray([True, True, True, False])
    assert float(masked_median(e, m)) == 2.0
    assert abs(float(mad_scale(e, m)) - 1.48 * 2.0) < 1e-5


def test_gauss_newton_quadratic():
    """GN solves a linear least squares exactly in one step."""
    A = jnp.asarray([[2.0, 0.3], [0.1, 1.5], [0.5, 0.5]])
    b = jnp.asarray([1.0, -2.0, 0.5])

    def evaluate(x):
        r = A @ x - b
        H = A.T @ A
        g = -A.T @ r
        return H, g, jnp.sum(r * r)

    res = gauss_newton(evaluate, lambda x, dx: x + dx,
                       jnp.zeros(2, jnp.float32), max_iter=5)
    x_expected = jnp.linalg.lstsq(A, b)[0]
    np.testing.assert_allclose(res.state, x_expected, atol=1e-5)


def test_config_backend_knobs_roundtrip(tmp_path):
    """Backend knobs exposed through the reference's YAML keys
    (VERDICT r3 item 9; reference: ceres_backend_factory.cpp:18-86)."""
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "ceres_num_iterations: 7\n"
        "ceres_num_imu_frames: 4\n"
        "ceres_marginalize: false\n"
        "outlier_rejection_px_threshold: 3.5\n"
        "backend_use_zero_motion_detection: false\n"
        "zero_motion_sigma: 0.07\n")
    cfg = load_config(str(p))
    assert cfg.backend.max_iterations == 7
    assert cfg.backend.num_imu_frames == 4
    assert cfg.backend.marginalize is False
    assert cfg.backend.ingest_gate_px == 3.5
    assert cfg.backend.use_zero_motion_detection is False
    assert cfg.backend.zupt_sigma_v == 0.07
    # r4 scale-correction knobs exist with sane defaults
    assert cfg.backend.scale_correction is True
    assert cfg.backend.max_scale_step > 1.0
    assert cfg.backend.max_chi2_per_obs > 0


def test_config_loads_reference_yaml():
    cfg = load_config("/root/reference/examples/param/pinhole.yaml")
    assert cfg.capacity.max_fts == 180
    assert cfg.base.max_n_kfs == 30
    assert cfg.detector.cell_size == 30
    assert cfg.img_align.max_level == 4 and cfg.img_align.min_level == 2
    assert cfg.detector.max_level == cfg.n_pyr_levels - 1
    assert cfg.depth_filter.affine_est_offset is True
    assert cfg.init.init_min_disparity == 30
    assert not cfg.pipeline_is_stereo
    # defaults survive for keys absent from YAML
    assert cfg.backend.num_keyframes == 5
    d = dataclasses.asdict(cfg)
    assert "capacity" in d
