"""Depth filter: recursive Bayesian inverse-depth estimation, all seeds at once.

TPU-native replacement for the reference's DepthFilter
(reference: src/svo_direct/src/depth_filter.cpp — updateSeed:367-499,
updateFilterVogiatzis:501-553, updateFilterGaussian:554-578, computeTau
:580-597; seed init initializeSeeds:300-365; worker thread depth_filter.h:
83-177). The reference updates seeds one at a time on a worker thread; here
every seed of a keyframe is updated against the current frame in ONE fused
program: batched visibility check → batched epipolar search (ops.matcher) →
batched Vogiatzis Beta×Gaussian update → batched convergence reclassification.
No thread, no mutex — the parallelism is the batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.common import seed as seed_mod
from svo_pro_universal_tpu.common import types as ft
from svo_pro_universal_tpu.ops import matcher as matcher_mod
from svo_pro_universal_tpu.utils.transform import SE3


def compute_tau(T_ref_cur: SE3, f: jax.Array, z: jax.Array,
                px_error_angle: jax.Array) -> jax.Array:
    """Depth std from a one-pixel bearing-angle error via the law of sines
    (reference: depth_filter.cpp:580-597). Batched over [N]."""
    t = jnp.broadcast_to(T_ref_cur.t, f.shape)
    a = f * z[:, None] - t
    t_norm = jnp.maximum(jnp.linalg.norm(t, axis=-1), 1e-9)
    a_norm = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-9)
    alpha = jnp.arccos(jnp.clip(jnp.sum(f * t, -1) / t_norm, -1.0, 1.0))
    beta = jnp.arccos(jnp.clip(
        jnp.sum(a * -t, -1) / (t_norm * a_norm), -1.0, 1.0))
    beta_plus = beta + px_error_angle
    gamma_plus = jnp.pi - alpha - beta_plus
    z_plus = t_norm * jnp.sin(beta_plus) / jnp.maximum(
        jnp.sin(gamma_plus), 1e-9)
    return z_plus - z


def update_vogiatzis(state: jax.Array, z: jax.Array, tau2: jax.Array,
                     mu_range: jax.Array, apply: jax.Array
                     ) -> tuple[jax.Array, jax.Array]:
    """Beta×Gaussian mixture update on inverse depth, batched.

    state [N,4] = [mu, sigma2, a, b] (inverse-depth measurement z = 1/depth).
    Returns (new_state, diverged) — diverged marks seeds whose posterior mean
    went negative (reference: updateFilterVogiatzis depth_filter.cpp:501-553).
    Rows where `apply` is False pass through unchanged.
    """
    mu, sigma2, a, b = (state[:, 0], state[:, 1], state[:, 2], state[:, 3])
    norm_scale2 = sigma2 + tau2
    s2 = 1.0 / (1.0 / jnp.maximum(sigma2, 1e-12)
                + 1.0 / jnp.maximum(tau2, 1e-12))
    m = s2 * (mu / jnp.maximum(sigma2, 1e-12)
              + z / jnp.maximum(tau2, 1e-12))
    uniform_x = 1.0 / mu_range
    norm_pdf = jnp.exp(-0.5 * (z - mu) ** 2 / jnp.maximum(norm_scale2, 1e-12)
                       ) / jnp.sqrt(2.0 * jnp.pi *
                                    jnp.maximum(norm_scale2, 1e-12))
    C1 = a / (a + b) * norm_pdf
    C2 = b / (a + b) * uniform_x
    Z = jnp.maximum(C1 + C2, 1e-30)
    C1, C2 = C1 / Z, C2 / Z
    f_ = C1 * (a + 1.0) / (a + b + 1.0) + C2 * a / (a + b + 1.0)
    e_ = (C1 * (a + 1.0) * (a + 2.0) / ((a + b + 1.0) * (a + b + 2.0))
          + C2 * a * (a + 1.0) / ((a + b + 1.0) * (a + b + 2.0)))

    mu_new = C1 * m + C2 * mu
    sigma2_new = (C1 * (s2 + m * m) + C2 * (sigma2 + mu * mu)
                  - mu_new * mu_new)
    # the denominator f − e/f is legitimately negative — guard magnitude only
    f_safe = jnp.where(jnp.abs(f_) > 1e-12, f_, 1e-12)
    denom = f_ - e_ / f_safe
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom,
                      jnp.where(denom < 0, -1e-12, 1e-12))
    a_new = (e_ - f_) / denom
    b_new = a_new * (1.0 - f_) / f_safe

    # guards (reference :539-551)
    sigma2_new = jnp.where(sigma2_new < 0.0, sigma2, sigma2_new)
    diverged = mu_new < 0.0
    mu_new = jnp.where(diverged, 1.0, mu_new)

    ok = apply & jnp.isfinite(mu_new) & jnp.isfinite(sigma2_new)
    new_state = jnp.stack([
        jnp.where(ok, mu_new, mu),
        jnp.where(ok, sigma2_new, sigma2),
        jnp.where(ok, a_new, a),
        jnp.where(ok, b_new, b),
    ], axis=-1)
    return new_state, diverged & apply


def update_gaussian(state: jax.Array, z: jax.Array, tau2: jax.Array,
                    apply: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Plain Gaussian fusion (reference: depth_filter.cpp:554-578)."""
    mu, sigma2 = state[:, 0], state[:, 1]
    denom = jnp.maximum(sigma2 + tau2, 1e-12)
    mu_new = (sigma2 * z + tau2 * mu) / denom
    s2_new = sigma2 * tau2 / denom
    ok = apply & jnp.isfinite(mu_new)
    new_state = jnp.stack([
        jnp.where(ok, mu_new, mu), jnp.where(ok, s2_new, s2_new * 0 + sigma2),
        state[:, 2], state[:, 3]], axis=-1)
    return new_state, jnp.zeros_like(apply)


class SeedUpdateResult(NamedTuple):
    seed_state: jax.Array     # [N, 4] updated
    ftype: jax.Array          # [N] updated feature types
    n_updated: jax.Array
    n_converged: jax.Array


def update_seeds(
    pyr_ref: jax.Array,           # [L,H,W] or [K,L,H,W] (+ ref_kf)
    pyr_cur: jax.Array,           # [L,H,W]
    cam_ref: proj.Camera,
    cam_cur: proj.Camera,
    T_cur_ref: SE3,
    px_ref: jax.Array,
    f_ref: jax.Array,
    grad_ref: jax.Array,
    level_ref: jax.Array,
    ftype: jax.Array,             # [N] i32 FeatureType codes (ref keyframe)
    seed_state: jax.Array,        # [N, 4]
    seed_mu_range: jax.Array,     # scalar 1/depth_min at init
    max_search_level: int,
    sigma2_convergence_threshold: float = 200.0,
    use_vogiatzis: bool = True,
    check_convergence: bool = True,
    matcher_opts: matcher_mod.MatcherOptions = matcher_mod.MatcherOptions(),
    ref_kf: jax.Array | None = None,
) -> SeedUpdateResult:
    """One batched DepthFilter::updateSeeds pass: all seeds of one ref
    keyframe against one current frame (reference: depth_filter.cpp:200-290 +
    updateSeed:367-499)."""
    n = px_ref.shape[0]
    is_seed = ft.is_seed(ftype)
    active = is_seed & (~ft.is_converged_seed(ftype)
                        if check_convergence else jnp.ones((n,), bool))

    # visibility pre-check at current mean depth (reference :405-419)
    depth_est = 1.0 / jnp.maximum(seed_state[:, 0], 1e-12)
    xyz_cur = T_cur_ref.apply(f_ref * depth_est[:, None])
    px_vis, vis = proj.project(cam_cur, xyz_cur)
    margin = 9.0
    vis = vis & (px_vis[:, 0] >= margin) & (px_vis[:, 1] >= margin) \
        & (px_vis[:, 0] < cam_cur.width - margin) \
        & (px_vis[:, 1] < cam_cur.height - margin)
    active = active & vis

    match = matcher_mod.find_epipolar_matches(
        pyr_ref, pyr_cur, cam_ref, cam_cur,
        T_cur_ref, px_ref, f_ref, grad_ref, ft.is_edgelet(ftype), level_ref,
        seed_state[:, 0], seed_mod.inv_min_depth(seed_state),
        seed_mod.inv_max_depth(seed_state), active, max_search_level,
        matcher_opts, ref_kf=ref_kf)

    # px_error_angle for one pixel of noise (reference :384-385)
    px_noise = 1.0
    focal = cam_cur.focal_length
    px_error_angle = jnp.arctan(px_noise / (2.0 * focal)) * 2.0
    tau = compute_tau(T_cur_ref.inverse(), f_ref, match.depth,
                      px_error_angle)
    z_inv = 1.0 / jnp.maximum(match.depth, 1e-12)
    tau2_inv = seed_mod.sigma2_from_depth_sigma(match.depth, tau)

    do_update = active & match.success
    if use_vogiatzis:
        new_state, diverged = update_vogiatzis(
            seed_state, z_inv, tau2_inv, seed_mu_range, do_update)
    else:
        new_state, diverged = update_gaussian(
            seed_state, z_inv, tau2_inv, do_update)

    # failures (not pre-filtered) accumulate outlier evidence (ref :446-453)
    failed = active & ~match.success & ~match.rejected
    new_state = new_state.at[:, 3].add(failed.astype(new_state.dtype))

    converged = seed_mod.is_converged(
        new_state, seed_mu_range, sigma2_convergence_threshold) & do_update
    new_ftype = jnp.where(converged, ft.seed_to_converged(ftype), ftype)
    new_ftype = jnp.where(diverged, jnp.int32(ft.FeatureType.OUTLIER),
                          new_ftype)
    return SeedUpdateResult(
        new_state, new_ftype,
        jnp.sum(do_update.astype(jnp.int32)),
        jnp.sum(converged.astype(jnp.int32)))
