"""Synthetic scene toolkit: exact analytic raytracing for tests/benchmarks.

Package analogue of the reference's svo_test_utils (reference:
extra/svo_test_utils/include/svo/test_utils/simple_raytracer.h:256
SimpleRayTracer, trajectory_generator.h:10, synthetic_dataset.h:16):
textured plane and sphere+background scenes rendered exactly from any
camera pose, with analytic ground-truth depth along any bearing.
"""

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
                      gain=1.0, offset=0.0, slope=(0.0, 0.0)):
    """Render the cur view of a textured plane (img_ref is the identity-pose
    view). The plane satisfies n·x = plane_z in the ref frame with
    n = (slope_x, slope_y, 1); slope=(0,0) is the fronto-parallel z=plane_z
    case. A sloped plane gives real depth variation, which breaks the
    translation↔rotation ambiguity of narrow-FOV constant-depth scenes."""
    h, w = img_ref.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    uv = jnp.stack([xx, yy], -1).reshape(-1, 2).astype(jnp.float32)
    f_cur = backproject(cam, uv)
    n = jnp.asarray([slope[0], slope[1], 1.0], jnp.float32)
    T_ref_cur = T_cur_ref.inverse()
    d = T_ref_cur.rotate(f_cur)
    lam = (plane_z - jnp.dot(T_ref_cur.t, n)) / jnp.maximum(
        d @ n, 1e-9)
    p_ref = T_ref_cur.t[None] + lam[:, None] * d
    uv_ref, _ = project(cam, p_ref)
    vals, _ = bilinear(img_ref, uv_ref)
    return (vals.reshape(h, w) * gain + offset).astype(jnp.float32)


def plane_depth(f: jnp.ndarray, plane_z=PLANE_Z, slope=(0.0, 0.0)):
    """Distance along bearings f to the plane n·x = plane_z (ref frame)."""
    n = jnp.asarray([slope[0], slope[1], 1.0], jnp.float32)
    return plane_z / jnp.maximum(f @ n, 1e-9)


SPHERE_C = jnp.array([0.0, 0.0, 2.8])
SPHERE_R = 1.2
BG_PLANE_N = jnp.array([0.2, -0.1, 1.0])   # background: n·x = BG_PLANE_D
BG_PLANE_D = 4.5


def sphere_texture(p):
    """Intensity field on 3D points: smooth sinusoids + a hard 3D checker
    (corner-rich junctions everywhere on the surface)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    smooth = (115.0 + 35.0 * jnp.sin(4.0 * x) * jnp.cos(5.0 * y)
              + 25.0 * jnp.sin(3.0 * (x + z)))
    checker = (25.0 * jnp.sign(jnp.sin(14.0 * x + 0.7))
               * jnp.sign(jnp.sin(14.0 * y + 0.3))
               * jnp.sign(jnp.sin(11.0 * z + 0.5)))
    return jnp.clip(smooth + checker, 0.0, 255.0)


def sphere_hit(origin, dirs):
    """Closest positive ray-sphere intersection. Returns (t, hit_mask)."""
    oc = origin - SPHERE_C
    b = jnp.sum(dirs * oc[None], axis=-1)
    c = jnp.sum(oc * oc) - SPHERE_R ** 2
    disc = b * b - c
    ok = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(ok & (t > 0), t, 1.0), ok & (t > 0)


def _scene_hit(origin, dirs):
    """Closest hit in the sphere+background-plane scene: 2.5× depth
    contrast with exact occlusion → strong parallax, no tx↔ry ambiguity."""
    t_s, ok_s = sphere_hit(origin, dirs)
    denom = dirs @ BG_PLANE_N
    t_p = (BG_PLANE_D - jnp.dot(origin, BG_PLANE_N)) / jnp.where(
        jnp.abs(denom) > 1e-9, denom, 1e-9)
    ok_p = t_p > 0
    t = jnp.where(ok_s, t_s, jnp.where(ok_p, t_p, 1.0))
    return t, ok_s | ok_p


def render_sphere_view(T_cam_world: SE3, cam=CAM):
    """Exact render of the sphere+plane scene from any camera pose (world =
    whatever frame T_cam_world maps from)."""
    h, w = cam.height, cam.width
    yy, xx = jnp.mgrid[0:h, 0:w]
    uv = jnp.stack([xx, yy], -1).reshape(-1, 2).astype(jnp.float32)
    f = backproject(cam, uv)
    T_world_cam = T_cam_world.inverse()
    d = T_world_cam.rotate(f)
    t, ok = _scene_hit(T_world_cam.t, d)
    p = T_world_cam.t[None] + t[:, None] * d
    vals = jnp.where(ok, sphere_texture(p), 0.0)
    return vals.reshape(h, w).astype(jnp.float32)


def sphere_depth_along(T_cam_world: SE3, f_cam):
    """Ground-truth distance along camera bearings to the scene."""
    T_world_cam = T_cam_world.inverse()
    d = T_world_cam.rotate(f_cam)
    return _scene_hit(T_world_cam.t, d)


def grid_features(n_grid=10, border=20, cam=CAM, plane_z=PLANE_Z):
    """Feature grid on the ref view with exact depths (distance along ray)."""
    us = np.linspace(border, cam.width - border, n_grid)
    vs = np.linspace(border, cam.height - border, n_grid)
    uu, vv = np.meshgrid(us, vs)
    px = jnp.asarray(np.stack([uu.ravel(), vv.ravel()], -1).astype(np.float32))
    f = backproject(cam, px)
    depth = plane_z / f[:, 2]
    return px, f, depth
