"""Motion-only pose refinement: robust GN on reprojection errors.

TPU-native replacement for the reference's PoseOptimizer
(reference: src/svo/src/pose_optimizer.cpp — run:40-95, evaluateErrorImpl
:104-194, removeOutliers:196-298, update:300-309,
calculateFeatureResidualUnitPlane:339-379, edgelet variant :~450; options
pose_optimizer.h:20-73). The optimized state is the body/IMU pose
``T_body_world`` (T_imu_world), updated left-multiplicatively
``T ← exp(dx)·T``; errors are unit-plane reprojection residuals whitened by
a MAD scale estimate and Tukey-weighted; edgelets contribute their
1-D along-gradient component with 2× sigma. All features across all cameras
are evaluated in one batched program per iteration.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.utils import robust
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_to_matrix, se3_exp, se3_log, skew)


class PoseOptOptions(NamedTuple):
    max_iter: int = 10
    reproj_thresh_px: float = 2.0
    prior_lambda: float = 0.0
    edgelet_sigma_factor: float = 2.0
    min_update_squared: float = 1e-10


class PoseOptFeatures(NamedTuple):
    """Per-camera observations of 3D points (landmarks or seed positions)."""
    xyz_world: jax.Array    # [N, 3]
    f: jax.Array            # [N, 3] measured unit bearings
    grad: jax.Array         # [N, 2] edgelet direction (unit-plane space)
    level: jax.Array        # [N] i32 feature pyramid level
    is_edgelet: jax.Array   # [N] bool
    valid: jax.Array        # [N] bool
    T_cam_body: SE3         # extrinsic
    cam: proj.Camera


class PoseOptResult(NamedTuple):
    T_body_world: SE3
    inlier: Sequence[jax.Array]      # per camera [N] bool (valid & !outlier)
    error_before_px: jax.Array       # median unwhitened error (pixels)
    error_after_px: jax.Array
    n_inliers: jax.Array


def _residuals(feats: PoseOptFeatures, T_body_world: SE3
               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Unit-plane residuals + 2×6 Jacobians w.r.t. the body twist.

    Returns (e [N,2], J [N,2,6], behind [N]). For edgelets the caller
    projects onto the gradient direction.
    """
    xyz_imu = T_body_world.apply(feats.xyz_world)
    xyz_cam = feats.T_cam_body.apply(xyz_imu)
    z = xyz_cam[:, 2]
    zi = 1.0 / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    uv_est = xyz_cam[:, 0:2] * zi[:, None]
    uv_meas = feats.f[:, 0:2] / jnp.where(
        jnp.abs(feats.f[:, 2:3]) > 1e-8, feats.f[:, 2:3], 1e-8)
    e = uv_meas - uv_est                                     # [N, 2]

    # J = -1/z · J_up · R_cam_imu · [I | -skew(p_imu)]  (frame.h:342-357)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=z.dtype),
                           xyz_imu.shape[:-1] + (3, 3))
    G = jnp.concatenate([eye, -skew(xyz_imu)], axis=-1)      # [N, 3, 6]
    R = quat_to_matrix(feats.T_cam_body.q)
    RG = jnp.einsum("ij,njk->nik", R, G)
    one = jnp.ones_like(zi)
    zero = jnp.zeros_like(zi)
    J_up = jnp.stack([
        jnp.stack([one, zero, -uv_est[:, 0]], -1),
        jnp.stack([zero, one, -uv_est[:, 1]], -1)], axis=-2)
    J = -zi[:, None, None] * jnp.einsum("nij,njk->nik", J_up, RG)
    return e, J, z < 1e-6


def _unwhitened_px(feats: PoseOptFeatures, T_body_world: SE3,
                   focal: jax.Array) -> jax.Array:
    """Per-feature unwhitened error in pixels at level 0 (err/scale·focal)."""
    e, _, _ = _residuals(feats, T_body_world)
    scale = (1 << feats.level).astype(e.dtype)
    e_edge = jnp.abs(jnp.sum(feats.grad * e, axis=-1))
    e_norm = jnp.where(feats.is_edgelet, e_edge,
                       jnp.linalg.norm(e, axis=-1))
    return e_norm / scale * focal


def optimize_pose(
    feature_sets: Sequence[PoseOptFeatures],
    T_body_world_init: SE3,
    opts: PoseOptOptions = PoseOptOptions(),
    T_prior: SE3 | None = None,
) -> PoseOptResult:
    """Batched motion-only GN (reference run:40-95)."""
    focal = feature_sets[0].cam.focal_length

    # initial unwhitened unit-plane errors → MAD sigma (reference :49-53)
    errs0, valid0 = [], []
    for fs in feature_sets:
        e, _, behind = _residuals(fs, T_body_world_init)
        scale = (1 << fs.level).astype(e.dtype)
        e_edge = jnp.abs(jnp.sum(fs.grad * e, axis=-1))
        e_norm = jnp.where(fs.is_edgelet, e_edge,
                           jnp.linalg.norm(e, axis=-1))
        errs0.append(e_norm / scale)
        valid0.append(fs.valid & ~behind)
    all_err0 = jnp.concatenate(errs0)
    all_valid0 = jnp.concatenate(valid0)
    sigma = jnp.maximum(robust.mad_scale(all_err0, all_valid0), 1e-7)

    def evaluate(T):
        H = jnp.zeros((6, 6), jnp.float32)
        g = jnp.zeros((6,), jnp.float32)
        chi2 = jnp.asarray(0.0, jnp.float32)
        for fs in feature_sets:
            e, J, behind = _residuals(fs, T)
            ok = fs.valid & ~behind
            scale = (1 << fs.level).astype(e.dtype)
            ms = sigma * scale * jnp.where(
                fs.is_edgelet, opts.edgelet_sigma_factor, 1.0)
            R = (1.0 / ms)
            # edgelet: 1-D residual along gradient; corner: 2-D
            e_edge = jnp.sum(fs.grad * e, axis=-1)[:, None]      # [N,1]
            J_edge = jnp.einsum("ni,nij->nj", fs.grad, J)[:, None, :]
            e2 = jnp.where(fs.is_edgelet[:, None],
                           jnp.concatenate([e_edge,
                                            jnp.zeros_like(e_edge)], -1), e)
            J2 = jnp.where(fs.is_edgelet[:, None, None],
                           jnp.concatenate(
                               [J_edge, jnp.zeros_like(J_edge)], 1), J)
            ew = e2 * R[:, None]
            Jw = J2 * R[:, None, None]
            ew_norm = jnp.linalg.norm(ew, axis=-1)
            w = jnp.where(ok, robust.tukey_weight(ew_norm), 0.0)
            H = H + jnp.einsum("nij,nik,n->jk", Jw, Jw, w)
            g = g - jnp.einsum("nij,ni,n->j", Jw, ew, w)
            # robust rho objective (saturating) for step acceptance
            chi2 = chi2 + jnp.sum(
                jnp.where(ok, robust.tukey_rho(ew_norm), 0.0))
        if T_prior is not None and opts.prior_lambda > 0:
            # e_p: exp(e_p)·T = T_prior (left-mult update convention)
            e_p = se3_log(T_prior.compose(T.inverse()))
            h_max = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(H))), 1.0)
            lam = opts.prior_lambda * h_max
            H = H + lam * jnp.eye(6, dtype=H.dtype)
            g = g + lam * e_p
            chi2 = chi2 + 0.5 * lam * jnp.sum(e_p * e_p)
        return H, g, chi2

    def cond(carry):
        _, _, _, it, done = carry
        return (it < opts.max_iter) & (~done)

    def body(carry):
        T, best_chi2, best_T, it, _ = carry
        H, g, _ = evaluate(T)
        from svo_pro_universal_tpu.ops.tiles import solve_psd_small
        dx = solve_psd_small(H + 1e-8 * jnp.eye(6), g, damping=0.0)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        T_new = se3_exp(dx).compose(T).normalized()
        _, _, chi2_new = evaluate(T_new)
        improved = chi2_new < best_chi2
        best_T = jax.tree.map(lambda a, b: jnp.where(improved, a, b),
                              T_new, best_T)
        best_chi2 = jnp.where(improved, chi2_new, best_chi2)
        T = jax.tree.map(lambda a, b: jnp.where(improved, a, b), T_new, T)
        done = jnp.sum(dx * dx) < opts.min_update_squared
        return T, best_chi2, best_T, it + 1, done

    _, _, chi0 = evaluate(T_body_world_init)
    init = (T_body_world_init, chi0, T_body_world_init,
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    _, _, T_opt, _, _ = jax.lax.while_loop(cond, body, init)

    # outlier classification at level-0 pixel threshold (reference :196-298)
    thresh = opts.reproj_thresh_px
    inliers = []
    n_in = jnp.asarray(0, jnp.int32)
    errs_after = []
    for fs, v0 in zip(feature_sets, valid0):
        err_px = _unwhitened_px(fs, T_opt, focal)
        inl = v0 & (err_px <= thresh)
        inliers.append(inl)
        errs_after.append(err_px)
        n_in = n_in + jnp.sum(inl.astype(jnp.int32))

    med_before = robust.masked_median(all_err0 * focal, all_valid0)
    med_after = robust.masked_median(jnp.concatenate(errs_after),
                                     jnp.concatenate(valid0))
    return PoseOptResult(T_opt, inliers, med_before, med_after, n_in)
