"""Joint multi-camera sparse image alignment (VERDICT r2 item 5).

Scenario the reference handles via bundle-wide alignment
(frame_handler_stereo.cpp:66-213): the primary camera stares at a
textureless wall — alone it cannot observe the motion — while the
secondary camera sees texture. Joint alignment over both CameraInputs
must recover the motion the single-camera solve cannot.
"""

import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.cameras.projections import Camera, backproject
from svo_pro_universal_tpu.ops import sparse_img_align as sia
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp

from synthetic_utils import render_plane_view, textured_image

H, W = 120, 160
CAM0 = Camera.pinhole(150.0, 150.0, W / 2, H / 2, W, H)
CAM1 = Camera.pinhole(150.0, 150.0, W / 2, H / 2, W, H)
PLANE_Z = 2.0


def _setup():
    tex = textured_image(H, W, seed=3)
    # rig: cam1 displaced 0.2 m to the right of cam0
    T_c1_c0 = SE3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([-0.2, 0, 0]))
    T_cam0_body = SE3.identity()

    # ground-truth body motion between ref and cur
    tw = jnp.asarray([0.02, -0.015, 0.01, 0.004, -0.003, 0.002])
    T_cur_ref = se3_exp(tw)

    flat = jnp.full((H, W), 128.0)               # textureless left view
    # right images: plane texture rendered from cam1's poses
    img1_ref = render_plane_view(tex, T_c1_c0, cam=CAM1, plane_z=PLANE_Z)
    img1_cur = render_plane_view(tex, T_c1_c0.compose(T_cur_ref),
                                 cam=CAM1, plane_z=PLANE_Z)

    # features on the cam0 grid with exact plane depth
    us = np.linspace(16, W - 16, 9)
    vs = np.linspace(16, H - 16, 7)
    uu, vv = np.meshgrid(us, vs)
    px0 = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], -1)
                      .astype(np.float32))
    f0 = backproject(CAM0, px0)
    depth0 = PLANE_Z / f0[:, 2]
    n = px0.shape[0]
    valid = jnp.ones((n,), bool)

    L = 3
    inp0 = sia.CameraInput(
        pyr_ref=build_pyramid(flat, L), pyr_cur=build_pyramid(flat, L),
        px_ref=px0, f_ref=f0, depth_ref=depth0, valid=valid,
        T_cam_body=T_cam0_body, cam=CAM0)

    # secondary input: same 3D points seen from cam1
    xyz0 = f0 * depth0[:, None]
    p_c1 = T_c1_c0.apply(xyz0)
    from svo_pro_universal_tpu.cameras.projections import project
    px1, ok1 = project(CAM1, p_c1)
    d1 = jnp.linalg.norm(p_c1, axis=-1)
    f1 = p_c1 / d1[:, None]
    inp1 = sia.CameraInput(
        pyr_ref=build_pyramid(img1_ref, L),
        pyr_cur=build_pyramid(img1_cur, L),
        px_ref=px1, f_ref=f1, depth_ref=d1, valid=valid & ok1,
        T_cam_body=T_c1_c0, cam=CAM1)
    return inp0, inp1, T_cur_ref


def test_joint_alignment_beats_blind_primary():
    inp0, inp1, T_true = _setup()
    opts = sia.SparseImgAlignOptions(max_level=2, min_level=0, max_iter=12)

    solo, _ = sia.run([inp0], sia.make_state(), opts)
    joint, _ = sia.run([inp0, inp1], sia.make_state(), opts)

    err_solo = float(jnp.linalg.norm(solo.T_icur_iref.t - T_true.t))
    err_joint = float(jnp.linalg.norm(joint.T_icur_iref.t - T_true.t))
    # blind primary: no photometric gradient → stays at identity
    assert err_solo > 0.02, err_solo
    # joint: the right camera's texture recovers the motion
    assert err_joint < 0.005, (err_joint, err_solo)


def test_joint_alignment_noop_without_secondary_validity():
    """Masking the secondary camera out reproduces the solo result —
    the joint path is a strict superset, not a behavioral change."""
    inp0, inp1, _ = _setup()
    opts = sia.SparseImgAlignOptions(max_level=2, min_level=0, max_iter=6)
    solo, st_a = sia.run([inp0], sia.make_state(), opts)
    masked = inp1._replace(valid=jnp.zeros_like(inp1.valid))
    both, st_b = sia.run([inp0, masked], sia.make_state(), opts)
    np.testing.assert_allclose(np.asarray(solo.T_icur_iref.t),
                               np.asarray(both.T_icur_iref.t), atol=1e-6)
