"""Omni (Mei) camera round-trip + OneShot initializer."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.cameras.projections import (
    Camera, DistortionModel, ProjectionModel, backproject, project)


def omni_cam(xi=0.9, fx=350.0):
    return Camera(ProjectionModel.OMNI, DistortionModel.NONE,
                  jnp.array([fx, fx, 320.0, 240.0]),
                  jnp.array([0.0, 0.0, 0.0, 0.0, xi]),
                  640, 480, label="omni")


def test_omni_project_backproject_roundtrip(rng):
    cam = omni_cam()
    f = rng.normal(size=(200, 3)).astype(np.float32)
    f[:, 2] = np.abs(f[:, 2]) + 0.6
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    uv, valid = project(cam, jnp.asarray(f) * 2.0)
    f2 = backproject(cam, uv)
    v = np.asarray(valid)
    assert v.mean() > 0.6
    dots = np.sum(np.asarray(f2)[v] * f[v], axis=-1)
    assert dots.min() > 1.0 - 1e-5


def test_omni_wide_angle_capability():
    """Points beyond 90° off-axis project with a mirror parameter xi≈1."""
    cam = omni_cam(xi=0.97, fx=200.0)
    p = jnp.array([[2.0, 0.0, -0.15]])     # ~94° off-axis
    uv, valid = project(cam, p)
    assert bool(valid[0])
    f = backproject(cam, uv)
    d = np.asarray(p / jnp.linalg.norm(p))
    assert float(jnp.sum(f[0] * d[0])) > 1.0 - 1e-4


@pytest.mark.slow
def test_oneshot_initializer_tracks_immediately():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic_utils import CAM, render_plane_view, PLANE_Z
    from test_pipeline_mono import make_config
    from svo_pro_universal_tpu.frontend.frame_handler import (
        FrameHandlerMono, Stage)
    from svo_pro_universal_tpu.utils.transform import se3_exp

    cfg = make_config()
    cfg.init.init_method = "OneShot"
    cfg.init.expected_avg_depth = float(PLANE_Z)
    handler = FrameHandlerMono(cfg, CAM)
    img0 = render_plane_view(jnp.zeros((1,)) * 0 + 0, None) \
        if False else None
    from synthetic_utils import textured_image
    base = textured_image()
    res0 = handler.add_image(base, 0.0)
    assert handler.stage == Stage.TRACKING, "OneShot must init from frame 1"
    assert res0.is_keyframe
    # a few tracked frames on the fronto-parallel plane (depth matches the
    # constant-depth assumption exactly here)
    for t in range(1, 6):
        T = se3_exp(jnp.asarray([0.01 * t, 0.005 * t, 0.0,
                                 0.0, 0.0, 0.002 * t], jnp.float32))
        res = handler.add_image(render_plane_view(base, T), t * 0.05)
    assert handler.stage == Stage.TRACKING
    assert res.n_tracked > 30
