"""Affine patch warping between views, batched.

TPU-native replacement for the reference's warp namespace
(reference: src/svo_direct/src/patch_warp.cpp — getWarpMatrixAffine:20-61,
getBestSearchLevel:99-111, warpAffine:113-160; API patch_warp.h:25-59).
All functions operate on [N]-batched features as single fused programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.ops.interp import bilinear, patch_offsets
from svo_pro_universal_tpu.utils.transform import SE3

_HALF_PATCH_WARP = 5  # finite-difference step in px (reference kHalfPatchSize)


def affine_warp_matrix(
    cam_ref: proj.Camera,
    cam_cur: proj.Camera,
    px_ref: jax.Array,      # [N, 2]
    f_ref: jax.Array,       # [N, 3] unit bearings
    depth_ref: jax.Array,   # [N]
    T_cur_ref: SE3,
    level_ref: jax.Array,   # [N] i32
) -> jax.Array:
    """A_cur_ref [N, 2, 2]: first-order pixel motion of the ref patch in cur.

    Finite differences of the full projection chain at ±kHalfPatchSize pixels,
    exactly the reference's construction (patch_warp.cpp:20-61) but batched.
    """
    xyz_ref = f_ref * depth_ref[:, None]
    scale = (1 << level_ref).astype(px_ref.dtype)[:, None]
    du = jnp.stack([jnp.full(px_ref.shape[0], _HALF_PATCH_WARP,
                             px_ref.dtype), jnp.zeros(px_ref.shape[0],
                                                      px_ref.dtype)], -1)
    dv = du[:, ::-1]
    f_du = proj.backproject(cam_ref, px_ref + du * scale)
    f_dv = proj.backproject(cam_ref, px_ref + dv * scale)
    if cam_ref.projection == proj.ProjectionModel.PINHOLE:
        # scale unit-plane rays to the same depth plane (z_ref)
        z = xyz_ref[:, 2:3]
        xyz_du = f_du / f_du[:, 2:3] * z
        xyz_dv = f_dv / f_dv[:, 2:3] * z
    else:
        xyz_du = f_du * depth_ref[:, None]
        xyz_dv = f_dv * depth_ref[:, None]

    px_cur, _ = proj.project(cam_cur, T_cur_ref.apply(xyz_ref))
    px_du_cur, _ = proj.project(cam_cur, T_cur_ref.apply(xyz_du))
    px_dv_cur, _ = proj.project(cam_cur, T_cur_ref.apply(xyz_dv))
    col0 = (px_du_cur - px_cur) / _HALF_PATCH_WARP
    col1 = (px_dv_cur - px_cur) / _HALF_PATCH_WARP
    return jnp.stack([col0, col1], axis=-1)  # columns


def best_search_level(A_cur_ref: jax.Array, max_level: int) -> jax.Array:
    """Pyramid level in cur where the warped patch has area ≲ 3 px²
    (reference: patch_warp.cpp:99-111, quartering the determinant)."""
    D = jnp.abs(jnp.linalg.det(A_cur_ref))
    lvl = jnp.ceil(jnp.log(jnp.maximum(D, 1e-12) / 3.0) / jnp.log(4.0))
    return jnp.clip(jnp.where(D > 3.0, lvl, 0.0), 0, max_level).astype(jnp.int32)


def warp_patches(
    A_cur_ref: jax.Array,    # [N, 2, 2]
    img_ref: jax.Array,      # ref pyramid level image [h, w]
    px_ref_pyr: jax.Array,   # [N, 2] ref px at level_ref resolution
    search_level: jax.Array,  # [N] i32
    patch_size: int,
) -> tuple[jax.Array, jax.Array]:
    """Sample ref patches with the inverse affine warp, batched.

    Mirrors warpAffine (patch_warp.cpp:113-160): patch coordinates live at
    `search_level` resolution in cur; A_ref_cur = A_cur_ref⁻¹ · 2^search_level
    maps them into the ref level image. Returns (patches [N, P²], ok [N]).
    """
    det = (A_cur_ref[:, 0, 0] * A_cur_ref[:, 1, 1]
           - A_cur_ref[:, 0, 1] * A_cur_ref[:, 1, 0])
    safe_det = jnp.where(jnp.abs(det) > 1e-8, det, 1e-8)
    inv = jnp.stack([
        jnp.stack([A_cur_ref[:, 1, 1], -A_cur_ref[:, 0, 1]], -1),
        jnp.stack([-A_cur_ref[:, 1, 0], A_cur_ref[:, 0, 0]], -1),
    ], axis=1) / safe_det[:, None, None]
    A_ref_cur = inv * (1 << search_level).astype(inv.dtype)[:, None, None]

    offs = patch_offsets(patch_size, px_ref_pyr.dtype)        # [P², 2]
    uv = (jnp.einsum("nij,pj->npi", A_ref_cur, offs)
          + px_ref_pyr[:, None, :])
    vals, inb = bilinear(img_ref, uv)
    ok = jnp.all(inb, axis=-1) & (jnp.abs(det) > 1e-8)
    return vals, ok


def zmssd(ref: jax.Array, cur: jax.Array, axis: int = -1) -> jax.Array:
    """Zero-mean sum of squared differences between patch vectors
    (reference: src/svo_direct/include/svo/direct/patch_score.h:44-226
    ZMSSD::computeScore — lower is better)."""
    r = ref - jnp.mean(ref, axis=axis, keepdims=True)
    c = cur - jnp.mean(cur, axis=axis, keepdims=True)
    return jnp.sum((r - c) ** 2, axis=axis)
