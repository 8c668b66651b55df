"""Subpixel feature alignment: inverse-compositional LK, batched.

TPU-native replacement for the reference's feature_alignment namespace
(reference: src/svo_direct/src/feature_alignment.cpp — align2D:204-331,
align1D:31-202, alignPyr2D:761-900, alignPyr2DVec:718-758; SSE2/NEON
variants replaced by whole-batch vectorization). Every entry point takes
[N]-batched features and runs fixed-iteration GN with masked convergence —
one fused device program per call, no per-feature branching.

State per feature is ``[u, v, mean_diff, alpha]``: pixel position plus the
affine illumination offset/gain of the reference (residual
``cur - alpha·ref + mean_diff``).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.ops.interp import bilinear, patch_offsets


class AlignResult(NamedTuple):
    px: jax.Array          # [N, 2] refined positions
    converged: jax.Array   # [N] bool
    mean_diff: jax.Array   # [N] illumination offset estimate
    alpha: jax.Array       # [N] illumination gain estimate


def patch_with_border_to_inner(border_patch: jax.Array, patch_size: int
                               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Split a [(P+2)²] patch-with-border into (inner [P²], dx [P²], dy [P²]).

    Central differences with the 0.5 factor (reference align2D:230-240).
    """
    p = patch_size
    b = border_patch.reshape(border_patch.shape[:-1] + (p + 2, p + 2))
    val = b[..., 1:-1, 1:-1]
    dx = 0.5 * (b[..., 1:-1, 2:] - b[..., 1:-1, :-2])
    dy = 0.5 * (b[..., 2:, 1:-1] - b[..., :-2, 1:-1])
    flat = border_patch.shape[:-1] + (p * p,)
    return val.reshape(flat), dx.reshape(flat), dy.reshape(flat)


def extract_patch_with_border(img: jax.Array, centers: jax.Array,
                              patch_size: int) -> tuple[jax.Array, jax.Array]:
    """[N, (P+2)²] border patches around integer-floored centers + ok mask."""
    offs = patch_offsets(patch_size + 2, centers.dtype)
    uv = jnp.floor(centers)[:, None, :] + offs[None]
    vals, inb = bilinear(img, uv)
    return vals, jnp.all(inb, axis=-1)


def _gn_hessian(jac: jax.Array, est_offset: bool, est_gain: bool) -> jax.Array:
    """H = Σ J Jᵀ with disabled affine blocks forced to identity
    (reference align2D:246-258)."""
    H = jnp.einsum("npi,npj->nij", jac, jac)
    if not est_offset:
        H = H.at[:, 2, 2].set(1.0)
    if not est_gain:
        H = H.at[:, 3, 3].set(1.0)
    return H


def align2d(
    cur_img: jax.Array,       # [h, w] at the feature's search level
    ref_patch: jax.Array,     # [N, P²] template intensities
    ref_dx: jax.Array,        # [N, P²] template x-gradient (0.5-scaled)
    ref_dy: jax.Array,        # [N, P²] template y-gradient
    px_init: jax.Array,       # [N, 2] initial position in cur (level coords)
    n_iter: int = 10,
    affine_est_offset: bool = True,
    affine_est_gain: bool = False,
    min_update_squared: float = 0.03 * 0.03,
    valid: jax.Array | None = None,
) -> AlignResult:
    """Batched align2D (reference: feature_alignment.cpp:204-331)."""
    n, area = ref_patch.shape
    patch_size = int(round(area ** 0.5))
    dt = px_init.dtype
    zeros = jnp.zeros((n, area), dt)
    jac = jnp.stack([
        ref_dx, ref_dy,
        jnp.ones_like(ref_patch) if affine_est_offset else zeros,
        -ref_patch if affine_est_gain else zeros,
    ], axis=-1)                                          # [N, P², 4]
    H = _gn_hessian(jac, affine_est_offset, affine_est_gain)
    Hinv = jnp.linalg.inv(H + 1e-8 * jnp.eye(4, dtype=dt))
    offs = patch_offsets(patch_size, dt)

    if valid is None:
        valid = jnp.ones((n,), bool)

    def body(_, carry):
        uv, mean_diff, alpha, done = carry
        pos = uv[:, None, :] + offs[None]
        cur, inb = bilinear(cur_img, pos)
        ok = jnp.all(inb, axis=-1) & valid
        res = cur - alpha[:, None] * ref_patch + mean_diff[:, None]
        jres = -jnp.einsum("np,npi->ni", res, jac)
        if not affine_est_offset:
            jres = jres.at[:, 2].set(0.0)
        if not affine_est_gain:
            jres = jres.at[:, 3].set(0.0)
        upd = jnp.einsum("nij,nj->ni", Hinv, jres)
        apply = (ok & ~done)[:, None]
        uv = uv + jnp.where(apply, upd[:, :2], 0.0)
        mean_diff = mean_diff + jnp.where(apply[:, 0], upd[:, 2], 0.0)
        alpha = alpha + jnp.where(apply[:, 0], upd[:, 3], 0.0)
        small = jnp.sum(upd[:, :2] ** 2, axis=-1) < min_update_squared
        done = done | (small & ok) | ~ok
        return uv, mean_diff, alpha, done

    init = (px_init, jnp.zeros((n,), dt), jnp.ones((n,), dt),
            jnp.zeros((n,), bool))
    uv, mean_diff, alpha, _ = jax.lax.fori_loop(0, n_iter, body, init)

    # converged = final position in bounds and update small: re-evaluate once
    pos = uv[:, None, :] + offs[None]
    _, inb = bilinear(cur_img, pos)
    conv = jnp.all(inb, axis=-1) & valid & jnp.all(jnp.isfinite(uv), axis=-1)
    return AlignResult(uv, conv, mean_diff, alpha)


def align1d(
    cur_img: jax.Array,
    direction: jax.Array,     # [N, 2] unit direction of allowed motion
    ref_patch: jax.Array,     # [N, P²]
    ref_dx: jax.Array,
    ref_dy: jax.Array,
    px_init: jax.Array,
    n_iter: int = 10,
    affine_est_offset: bool = True,
    affine_est_gain: bool = False,
    min_update_squared: float = 0.03 * 0.03,
    valid: jax.Array | None = None,
) -> AlignResult:
    """Batched align1D: motion restricted to `direction` (edgelets)
    (reference: feature_alignment.cpp:31-202). State [s, mean_diff, alpha]."""
    n, area = ref_patch.shape
    patch_size = int(round(area ** 0.5))
    dt = px_init.dtype
    dgrad = (direction[:, 0:1] * ref_dx + direction[:, 1:2] * ref_dy)
    zeros = jnp.zeros((n, area), dt)
    jac = jnp.stack([
        dgrad,
        jnp.ones_like(ref_patch) if affine_est_offset else zeros,
        -ref_patch if affine_est_gain else zeros,
    ], axis=-1)                                          # [N, P², 3]
    H = jnp.einsum("npi,npj->nij", jac, jac)
    if not affine_est_offset:
        H = H.at[:, 1, 1].set(1.0)
    if not affine_est_gain:
        H = H.at[:, 2, 2].set(1.0)
    Hinv = jnp.linalg.inv(H + 1e-8 * jnp.eye(3, dtype=dt))
    offs = patch_offsets(patch_size, dt)
    if valid is None:
        valid = jnp.ones((n,), bool)

    def body(_, carry):
        uv, mean_diff, alpha, done = carry
        pos = uv[:, None, :] + offs[None]
        cur, inb = bilinear(cur_img, pos)
        ok = jnp.all(inb, axis=-1) & valid
        res = cur - alpha[:, None] * ref_patch + mean_diff[:, None]
        jres = -jnp.einsum("np,npi->ni", res, jac)
        if not affine_est_offset:
            jres = jres.at[:, 1].set(0.0)
        if not affine_est_gain:
            jres = jres.at[:, 2].set(0.0)
        upd = jnp.einsum("nij,nj->ni", Hinv, jres)
        apply = ok & ~done
        uv = uv + jnp.where(apply[:, None], upd[:, 0:1] * direction, 0.0)
        mean_diff = mean_diff + jnp.where(apply, upd[:, 1], 0.0)
        alpha = alpha + jnp.where(apply, upd[:, 2], 0.0)
        done = done | ((upd[:, 0] ** 2 < min_update_squared) & ok) | ~ok
        return uv, mean_diff, alpha, done

    init = (px_init, jnp.zeros((n,), dt), jnp.ones((n,), dt),
            jnp.zeros((n,), bool))
    uv, mean_diff, alpha, _ = jax.lax.fori_loop(0, n_iter, body, init)
    pos = uv[:, None, :] + offs[None]
    _, inb = bilinear(cur_img, pos)
    conv = jnp.all(inb, axis=-1) & valid & jnp.all(jnp.isfinite(uv), axis=-1)
    return AlignResult(uv, conv, mean_diff, alpha)


def align_pyr_2d(
    pyr_ref: Sequence[jax.Array],
    pyr_cur: Sequence[jax.Array],
    px_ref: jax.Array,        # [N, 2] level-0 coords in ref
    px_cur_init: jax.Array,   # [N, 2] level-0 initial guess in cur
    max_level: int = 4,
    min_level: int = 0,
    patch_sizes: Sequence[int] | None = None,
    n_iter: int = 30,
    min_update_squared: float = 1e-3,
    valid: jax.Array | None = None,
) -> AlignResult:
    """Batched pyramidal KLT, translation-only (reference: alignPyr2DVec /
    alignPyr2D feature_alignment.cpp:718-900). Coarse-to-fine over levels;
    each level re-extracts the ref template from the ref pyramid and refines
    all N features simultaneously."""
    n = px_ref.shape[0]
    if patch_sizes is None:
        patch_sizes = [8] * (max_level + 1)
    if valid is None:
        valid = jnp.ones((n,), bool)

    uv = px_cur_init
    any_conv = jnp.zeros((n,), bool)
    for level in range(max_level, min_level - 1, -1):
        scale = float(1 << level)
        p = patch_sizes[level]
        ref_c = px_ref / scale
        border, ok_ref = extract_patch_with_border(pyr_ref[level], ref_c, p)
        patch, dx, dy = patch_with_border_to_inner(border, p)
        res = align2d(
            pyr_cur[level], patch, dx, dy, uv / scale, n_iter=n_iter,
            affine_est_offset=False, affine_est_gain=False,
            min_update_squared=min_update_squared / scale,
            valid=valid & ok_ref)
        # keep refined position only where that level converged
        uv = jnp.where(res.converged[:, None], res.px * scale, uv)
        any_conv = any_conv | res.converged
    return AlignResult(uv, any_conv & valid, jnp.zeros((n,)), jnp.ones((n,)))
