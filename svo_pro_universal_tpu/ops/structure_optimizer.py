"""Structure-only refinement: per-landmark 3-point GN, vmapped over points.

TPU-native replacement for Point::optimize
(reference: src/svo_common/include/svo/common/point.h:155 + point.cpp
Point::optimize — 3-parameter GN on the world position minimizing unit-plane
reprojection over the observation list; called for ≤20 points per frame with
5 iterations from FrameHandlerBase::optimizeStructure
frame_handler_base.cpp:779-826). Here ALL candidate points refine at once:
[P] points × [O] padded observations, vmapped GN.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.utils.transform import SE3, quat_to_matrix


class StructureOptResult(NamedTuple):
    xyz: jax.Array        # [P, 3] refined positions
    chi2: jax.Array       # [P] final mean squared unit-plane error
    updated: jax.Array    # [P] bool


def optimize_points(
    xyz_world: jax.Array,     # [P, 3]
    f_obs: jax.Array,         # [P, O, 3] measured bearings per observation
    T_cam_world: SE3,         # batched [P, O] observer poses
    obs_mask: jax.Array,      # [P, O] bool
    point_mask: jax.Array,    # [P] bool — which points to optimize
    n_iter: int = 5,
) -> StructureOptResult:
    """Batched Point::optimize. Keeps the old position if chi2 increases
    (reference point.cpp optimize rollback)."""
    uv_meas = f_obs[..., 0:2] / jnp.where(
        jnp.abs(f_obs[..., 2:3]) > 1e-8, f_obs[..., 2:3], 1e-8)
    R_cw = quat_to_matrix(T_cam_world.q)       # [P, O, 3, 3]

    def residuals(p):
        # p: [P, 3] → e [P, O, 2], J [P, O, 2, 3] w.r.t. world point
        p_cam = (jnp.einsum("poij,pj->poi", R_cw, p) + T_cam_world.t)
        z = p_cam[..., 2]
        zi = 1.0 / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
        uv = p_cam[..., 0:2] * zi[..., None]
        e = uv_meas - uv
        one = jnp.ones_like(zi)
        zero = jnp.zeros_like(zi)
        J_up = jnp.stack([
            jnp.stack([one, zero, -uv[..., 0]], -1),
            jnp.stack([zero, one, -uv[..., 1]], -1)], axis=-2)
        J = -zi[..., None, None] * jnp.einsum(
            "poij,pojk->poik", J_up, R_cw)
        ok = obs_mask & (z > 1e-6)
        return e, J, ok

    def chi2_of(p):
        e, _, ok = residuals(p)
        w = ok.astype(p.dtype)
        n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
        return jnp.sum(jnp.sum(e * e, -1) * w, axis=-1) / n

    def body(_, carry):
        p, best_chi2, best_p = carry
        e, J, ok = residuals(p)
        w = ok.astype(p.dtype)
        H = jnp.einsum("poij,poik,po->pjk", J, J, w)
        g = -jnp.einsum("poij,poi,po->pj", J, e, w)
        # damping + step cap: a 2-view point has a flat valley along its
        # ray — an uncapped GN step can run away and corrupt the map
        diag = jnp.diagonal(H, axis1=-2, axis2=-1)
        H = H + (1e-3 * diag + 1e-8)[..., None] * jnp.eye(3, dtype=p.dtype)
        # unrolled batched Cholesky: jnp.linalg.solve takes the generic
        # batched-LU path (~ms for [360,3,3] per iteration on this chip)
        from svo_pro_universal_tpu.ops.tiles import solve_psd_small
        dx = solve_psd_small(H, g)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        max_step = 0.2 * jnp.maximum(jnp.linalg.norm(p, axis=-1), 1e-3)
        dx_norm = jnp.linalg.norm(dx, axis=-1)
        dx = dx * jnp.minimum(1.0, max_step / jnp.maximum(dx_norm, 1e-12)
                              )[:, None]
        p_new = p + dx
        c_new = chi2_of(p_new)
        improved = c_new < best_chi2
        best_p = jnp.where(improved[:, None], p_new, best_p)
        best_chi2 = jnp.where(improved, c_new, best_chi2)
        return p_new, best_chi2, best_p

    chi0 = chi2_of(xyz_world)
    _, best_chi2, best_p = jax.lax.fori_loop(
        0, n_iter, body, (xyz_world, chi0, xyz_world))
    updated = point_mask & (best_chi2 <= chi0)
    out = jnp.where(updated[:, None], best_p, xyz_world)
    return StructureOptResult(out, best_chi2, updated)
