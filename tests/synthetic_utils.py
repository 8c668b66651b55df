"""Shared synthetic-scene helpers: textured fronto-parallel plane renderer
(the minimal analogue of the reference's svo_test_utils raytracer)."""

import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.cameras.projections import (
    Camera, backproject, project)
from svo_pro_universal_tpu.ops.interp import bilinear
from svo_pro_universal_tpu.utils.transform import SE3

H, W = 120, 160
CAM = Camera.pinhole(150.0, 150.0, W / 2, H / 2, W, H)
PLANE_Z = 2.0


def textured_image(h=H, w=W, seed=0):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    p = seed * 1.7
    img = (120.0 + 40 * np.sin(x / 7.0 + p) * np.cos(y / 5.0)
           + 30 * np.sin((x + y) / 11.0) + 20 * np.cos(x / 3.0 + y / 13.0 + p))
    return jnp.asarray(img.astype(np.float32))


def render_plane_view(img_ref, T_cur_ref: SE3, cam=CAM, plane_z=PLANE_Z,
                      gain=1.0, offset=0.0):
    """Render the cur view of the textured plane z_ref = plane_z (img_ref is
    the identity-pose view)."""
    h, w = img_ref.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    uv = jnp.stack([xx, yy], -1).reshape(-1, 2).astype(jnp.float32)
    f_cur = backproject(cam, uv)
    T_ref_cur = T_cur_ref.inverse()
    d = T_ref_cur.rotate(f_cur)
    lam = (plane_z - T_ref_cur.t[2]) / d[:, 2]
    p_ref = T_ref_cur.t[None] + lam[:, None] * d
    uv_ref, _ = project(cam, p_ref)
    vals, _ = bilinear(img_ref, uv_ref)
    return (vals.reshape(h, w) * gain + offset).astype(jnp.float32)


def grid_features(n_grid=10, border=20, cam=CAM, plane_z=PLANE_Z):
    """Feature grid on the ref view with exact depths (distance along ray)."""
    us = np.linspace(border, cam.width - border, n_grid)
    vs = np.linspace(border, cam.height - border, n_grid)
    uu, vv = np.meshgrid(us, vs)
    px = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32))
    f = backproject(cam, px)
    depth = plane_z / f[:, 2]
    return px, f, depth
