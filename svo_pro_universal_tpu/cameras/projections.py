"""Batched camera projection models.

TPU-native replacement for the reference's vikit camera zoo
(reference: src/vikit/vikit_cameras/include/vikit/cameras/camera_geometry_base.h:81-131,
cameras.h:34-38 — pinhole × {No, Atan, Equidistant, RadTan} distortion, plus
equidistant-fisheye and omni). All ops broadcast over leading batch dims and are
jit/vmap/grad-safe; distortion inversion uses fixed-iteration Newton so shapes
stay static under XLA.
"""

from __future__ import annotations

import enum
from typing import Any

import jax
import jax.numpy as jnp
from jax import tree_util


class ProjectionModel(enum.IntEnum):
    PINHOLE = 0
    FISHEYE_EQUIDISTANT = 1  # r = f * theta ("equidistant fisheye" in vikit)
    OMNI = 2


class DistortionModel(enum.IntEnum):
    NONE = 0
    RADTAN = 1        # [k1, k2, p1, p2]
    EQUIDISTANT = 2   # [k1, k2, k3, k4] on theta
    ATAN = 3          # [s] FOV model


_MAX_DIST_PARAMS = 5


class Camera:
    """One camera. Intrinsics are traced arrays; model enums/size are static."""

    def __init__(self, projection: ProjectionModel, distortion: DistortionModel,
                 intrinsics: jax.Array, dist_params: jax.Array,
                 width: int, height: int, label: str = "cam"):
        self.projection = ProjectionModel(projection)
        self.distortion = DistortionModel(distortion)
        self.intrinsics = jnp.asarray(intrinsics)      # [fx, fy, cx, cy]
        dp = jnp.atleast_1d(jnp.asarray(dist_params))
        pad = _MAX_DIST_PARAMS - dp.shape[-1]
        if pad > 0:
            dp = jnp.concatenate([dp, jnp.zeros(dp.shape[:-1] + (pad,), dp.dtype)], -1)
        self.dist_params = dp
        self.width = int(width)
        self.height = int(height)
        self.label = label

    # -- pytree protocol (model/type/size are aux data, params are leaves) --
    def tree_flatten(self):
        return (self.intrinsics, self.dist_params), (
            self.projection, self.distortion, self.width, self.height, self.label)

    @classmethod
    def tree_unflatten(cls, aux: Any, children):
        intr, dp = children
        proj, dist, w, h, label = aux
        obj = cls.__new__(cls)
        obj.projection, obj.distortion = proj, dist
        obj.intrinsics, obj.dist_params = intr, dp
        obj.width, obj.height, obj.label = w, h, label
        return obj

    def __repr__(self):
        return (f"Camera({self.label}, {self.projection.name}/"
                f"{self.distortion.name}, {self.width}x{self.height})")

    @property
    def focal_length(self) -> jax.Array:
        """Error multiplier used to convert unit-plane errors to pixels
        (reference: frame.h getErrorMultiplier — mean of |fx|,|fy|)."""
        return 0.5 * (jnp.abs(self.intrinsics[0]) + jnp.abs(self.intrinsics[1]))

    @classmethod
    def pinhole(cls, fx, fy, cx, cy, width, height,
                distortion=DistortionModel.NONE, dist_params=(), label="cam",
                dtype=jnp.float32):
        dp = jnp.asarray(list(dist_params) or [0.0], dtype=dtype)
        return cls(ProjectionModel.PINHOLE, distortion,
                   jnp.array([fx, fy, cx, cy], dtype=dtype), dp,
                   width, height, label)


tree_util.register_pytree_node(Camera, Camera.tree_flatten, Camera.tree_unflatten)


# ---------------------------------------------------------------------------
# Distortion on the unit plane: (x, y) -> distorted (xd, yd)
# ---------------------------------------------------------------------------

def _distort_radtan(p, k):
    k1, k2, p1, p2 = k[0], k[1], k[2], k[3]
    x, y = p[..., 0], p[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    r2 = x2 + y2
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x2)
    yd = y * radial + 2.0 * p2 * xy + p1 * (r2 + 2.0 * y2)
    return jnp.stack([xd, yd], axis=-1)


def _undistort_radtan(pd, k, iters: int = 8):
    # fixed-point iteration: p <- (pd - tangential(p)) / radial(p)
    def body(_, p):
        k1, k2, p1, p2 = k[0], k[1], k[2], k[3]
        x, y = p[..., 0], p[..., 1]
        x2, y2, xy = x * x, y * y, x * y
        r2 = x2 + y2
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2.0 * p1 * xy + p2 * (r2 + 2.0 * x2)
        dy = 2.0 * p2 * xy + p1 * (r2 + 2.0 * y2)
        return jnp.stack([(pd[..., 0] - dx) / radial,
                          (pd[..., 1] - dy) / radial], axis=-1)
    return jax.lax.fori_loop(0, iters, body, pd)


def _distort_equidistant(p, k):
    k1, k2, k3, k4 = k[0], k[1], k[2], k[3]
    r = jnp.linalg.norm(p, axis=-1, keepdims=True)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
    return p * scale


def _undistort_equidistant(pd, k, iters: int = 8):
    k1, k2, k3, k4 = k[0], k[1], k[2], k[3]
    theta_d = jnp.linalg.norm(pd, axis=-1, keepdims=True)

    def body(_, theta):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d
        df = 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
        return theta - f / jnp.maximum(df, 1e-6)

    theta = jax.lax.fori_loop(0, iters, body, theta_d)
    scale = jnp.where(theta_d > 1e-8,
                      jnp.tan(theta) / jnp.maximum(theta_d, 1e-8), 1.0)
    return pd * scale


def _distort_atan(p, k):
    s = k[0]
    r = jnp.linalg.norm(p, axis=-1, keepdims=True)
    factor = jnp.where(
        r > 1e-8,
        jnp.arctan(r * 2.0 * jnp.tan(s / 2.0)) / jnp.maximum(s * r, 1e-8),
        2.0 * jnp.tan(s / 2.0) / jnp.maximum(s, 1e-8))
    return p * factor


def _undistort_atan(pd, k):
    s = k[0]
    rd = jnp.linalg.norm(pd, axis=-1, keepdims=True)
    factor = jnp.where(
        rd > 1e-8,
        jnp.tan(rd * s) / jnp.maximum(rd * 2.0 * jnp.tan(s / 2.0), 1e-8),
        s / jnp.maximum(2.0 * jnp.tan(s / 2.0), 1e-8))
    return pd * factor


def _apply_distortion(cam: Camera, p):
    if cam.distortion == DistortionModel.NONE:
        return p
    if cam.distortion == DistortionModel.RADTAN:
        return _distort_radtan(p, cam.dist_params)
    if cam.distortion == DistortionModel.EQUIDISTANT:
        return _distort_equidistant(p, cam.dist_params)
    if cam.distortion == DistortionModel.ATAN:
        return _distort_atan(p, cam.dist_params)
    raise ValueError(cam.distortion)


def _remove_distortion(cam: Camera, pd):
    if cam.distortion == DistortionModel.NONE:
        return pd
    if cam.distortion == DistortionModel.RADTAN:
        return _undistort_radtan(pd, cam.dist_params)
    if cam.distortion == DistortionModel.EQUIDISTANT:
        return _undistort_equidistant(pd, cam.dist_params)
    if cam.distortion == DistortionModel.ATAN:
        return _undistort_atan(pd, cam.dist_params)
    raise ValueError(cam.distortion)


# ---------------------------------------------------------------------------
# Project / backproject
# ---------------------------------------------------------------------------

def project(cam: Camera, xyz: jax.Array) -> tuple[jax.Array, jax.Array]:
    """3D point(s) in camera frame → pixel coords. Returns (uv [..2], valid [..])."""
    fx, fy, cx, cy = (cam.intrinsics[0], cam.intrinsics[1],
                      cam.intrinsics[2], cam.intrinsics[3])
    z = xyz[..., 2]
    if cam.projection == ProjectionModel.PINHOLE:
        zi = 1.0 / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
        p = xyz[..., 0:2] * zi[..., None]
        pd = _apply_distortion(cam, p)
        valid = z > 1e-6
    elif cam.projection == ProjectionModel.FISHEYE_EQUIDISTANT:
        r = jnp.linalg.norm(xyz[..., 0:2], axis=-1)
        theta = jnp.arctan2(r, z)
        scale = jnp.where(r > 1e-8, theta / jnp.maximum(r, 1e-8), 1.0)
        p = xyz[..., 0:2] * scale[..., None]
        pd = _apply_distortion(cam, p)
        valid = theta < jnp.pi / 2.0
    elif cam.projection == ProjectionModel.OMNI:
        # unified omnidirectional (Mei) model: mirror parameter xi rides in
        # dist_params[4] (reference: vikit omni_projection.h — catadioptric
        # cameras with >180° FOV)
        xi = cam.dist_params[4]
        n = jnp.linalg.norm(xyz, axis=-1)
        denom = z + xi * n
        di = 1.0 / jnp.where(jnp.abs(denom) > 1e-8, denom, 1e-8)
        p = xyz[..., 0:2] * di[..., None]
        pd = _apply_distortion(cam, p)
        valid = denom > 1e-6
    else:
        raise NotImplementedError(cam.projection)
    uv = jnp.stack([fx * pd[..., 0] + cx, fy * pd[..., 1] + cy], axis=-1)
    inside = ((uv[..., 0] >= 0) & (uv[..., 0] < cam.width)
              & (uv[..., 1] >= 0) & (uv[..., 1] < cam.height))
    return uv, valid & inside


def backproject(cam: Camera, uv: jax.Array) -> jax.Array:
    """Pixel coords → unit bearing vector in camera frame."""
    fx, fy, cx, cy = (cam.intrinsics[0], cam.intrinsics[1],
                      cam.intrinsics[2], cam.intrinsics[3])
    pd = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
    p = _remove_distortion(cam, pd)
    if cam.projection == ProjectionModel.PINHOLE:
        f = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)
    elif cam.projection == ProjectionModel.FISHEYE_EQUIDISTANT:
        theta = jnp.linalg.norm(p, axis=-1, keepdims=True)
        sin_t = jnp.sin(theta)
        dir_xy = jnp.where(theta > 1e-8, p / jnp.maximum(theta, 1e-8), p)
        f = jnp.concatenate([dir_xy * sin_t, jnp.cos(theta)], axis=-1)
    elif cam.projection == ProjectionModel.OMNI:
        # invert the unified model: with r² = x²+y² on the normalized
        # plane, z = (xi + sqrt(1 + (1-xi²)r²)) / (1+r²) − xi
        xi = cam.dist_params[4]
        r2 = jnp.sum(p * p, axis=-1, keepdims=True)
        zc = (xi + jnp.sqrt(jnp.maximum(1.0 + (1.0 - xi * xi) * r2, 0.0))
              ) / (1.0 + r2)
        f = jnp.concatenate([p * zc, zc - xi], axis=-1)
    else:
        raise NotImplementedError(cam.projection)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def project_jacobian(cam: Camera, xyz: jax.Array) -> jax.Array:
    """d(uv)/d(xyz) [..., 2, 3] via autodiff (XLA fuses this into the GN stage)."""
    flat = xyz.reshape(-1, 3)

    def proj1(x):
        return project(cam, x)[0]

    J = jax.vmap(jax.jacfwd(proj1))(flat)
    return J.reshape(xyz.shape[:-1] + (2, 3))


def pinhole_unit_plane_jacobian(xyz: jax.Array) -> jax.Array:
    """Fast analytic d(unit-plane uv)/d(xyz) = [[1/z, 0, -x/z²],[0, 1/z, -y/z²]]
    (reference: frame.h jacobian_xyz2uv). Multiply by focal length for pixels."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    zi2 = zi * zi
    zero = jnp.zeros_like(zi)
    row0 = jnp.stack([zi, zero, -x * zi2], axis=-1)
    row1 = jnp.stack([zero, zi, -y * zi2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
