"""Camera model projection round trips (reference test strategy:
src/vikit/vikit_cameras/test/test_cameras.cpp:182 with the EuRoC fixtures)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.cameras import (
    Camera, DistortionModel, backproject, project, project_jacobian)
from svo_pro_universal_tpu.cameras.projections import (
    ProjectionModel, pinhole_unit_plane_jacobian)
from svo_pro_universal_tpu.cameras.rig import parse_rig

EUROC_CAM0 = dict(
    fx=458.6548807207614, fy=457.2966964634893,
    cx=367.2158039615726, cy=248.37534060980727,
    dist=[-0.28340811217029355, 0.07395907389290132,
          0.00019359502856909603, 1.7618711454538528e-05],
)


def make_cams():
    cams = {
        "pinhole": Camera.pinhole(450.0, 450.0, 376.0, 240.0, 752, 480),
        "radtan": Camera.pinhole(
            EUROC_CAM0["fx"], EUROC_CAM0["fy"], EUROC_CAM0["cx"], EUROC_CAM0["cy"],
            752, 480, DistortionModel.RADTAN, EUROC_CAM0["dist"]),
        "equidistant": Camera.pinhole(
            380.0, 380.0, 376.0, 240.0, 752, 480,
            DistortionModel.EQUIDISTANT, [-0.01, 0.02, -0.005, 0.001]),
        "atan": Camera.pinhole(
            320.0, 320.0, 376.0, 240.0, 752, 480,
            DistortionModel.ATAN, [0.9]),
        "fisheye": Camera(
            ProjectionModel.FISHEYE_EQUIDISTANT, DistortionModel.NONE,
            jnp.array([280.0, 280.0, 376.0, 240.0]), jnp.array([0.0]),
            752, 480),
    }
    return cams


@pytest.mark.parametrize("name", list(make_cams().keys()))
def test_project_backproject_round_trip(name, rng):
    cam = make_cams()[name]
    # sample bearings in a moderate cone looking forward
    n = 256
    xy = rng.uniform(-0.45, 0.45, size=(n, 2)).astype(np.float32)
    xyz = np.concatenate([xy, np.ones((n, 1), np.float32)], axis=1)
    xyz *= rng.uniform(0.5, 10.0, size=(n, 1)).astype(np.float32)
    uv, valid = project(cam, jnp.asarray(xyz))
    f = backproject(cam, uv)
    uv2, valid2 = project(cam, f)
    ok = np.asarray(valid)
    assert ok.sum() > n // 2
    np.testing.assert_allclose(
        np.asarray(uv)[ok], np.asarray(uv2)[ok], atol=0.05)
    # bearing should be parallel to xyz
    cos = np.sum(np.asarray(f)[ok] * xyz[ok], axis=1) / np.linalg.norm(xyz[ok], axis=1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-4)


def test_project_jacobian_matches_fd(rng):
    cam = make_cams()["radtan"]
    xyz = jnp.asarray([[0.3, -0.2, 2.0], [0.0, 0.0, 1.0]], jnp.float32)
    J = project_jacobian(cam, xyz)
    eps = 1e-3
    for k in range(3):
        d = np.zeros(3, np.float32)
        d[k] = eps
        up, _ = project(cam, xyz + d)
        dn, _ = project(cam, xyz - d)
        fd = (np.asarray(up) - np.asarray(dn)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J)[..., k], fd, atol=0.05, rtol=1e-2)


def test_unit_plane_jacobian(rng):
    xyz = jnp.asarray(rng.uniform(0.2, 3.0, size=(16, 3)), jnp.float32)
    J = pinhole_unit_plane_jacobian(xyz)

    def up(p):
        return p[:2] / p[2]

    import jax
    Jfd = jax.vmap(jax.jacfwd(up))(xyz)
    np.testing.assert_allclose(J, Jfd, atol=1e-4)


def test_rig_yaml_parse():
    import yaml
    with open("/root/reference/examples/param/calib/euroc_stereo.yaml") as f:
        doc = yaml.safe_load(f)
    rig = parse_rig(doc)
    assert len(rig) == 2
    assert rig.cameras[0].width == 752
    assert rig.imu_params is not None
    assert rig.imu_params.imu_rate == 800
    assert 0.08 < rig.stereo_baseline < 0.13  # EuRoC ~11 cm
    # extrinsic sanity: T_B_C rotation is orthonormal after quat round trip
    R = np.asarray(rig.T_body_cam[0].rotation_matrix())
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_out_of_view_invalid():
    cam = make_cams()["pinhole"]
    uv, valid = project(cam, jnp.asarray([[0.0, 0.0, -1.0]]))
    assert not bool(valid[0])
