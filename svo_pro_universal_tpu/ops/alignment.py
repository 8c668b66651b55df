"""Subpixel feature alignment: inverse-compositional LK, batched.

TPU-native replacement for the reference's feature_alignment namespace
(reference: src/svo_direct/src/feature_alignment.cpp — align2D:204-331,
align1D:31-202, alignPyr2D:761-900, alignPyr2DVec:718-758; SSE2/NEON
variants replaced by whole-batch vectorization). Every entry point takes
[N]-batched features and runs fixed-iteration GN with masked convergence —
one fused device program per call, no per-feature branching.

Sampling: the pyramidal tracker cuts one tile per feature per level
(ops.tiles) and keeps all GN iterations inside it — no scattered gathers in
the sequential loop. ``align2d``/``align1d`` with an explicit image remain
as reference oracles for tests.

State per feature is ``[u, v, mean_diff, alpha]``: pixel position plus the
affine illumination offset/gain of the reference (residual
``cur - alpha·ref + mean_diff``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.ops import tiles as tl
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


def extract_patch_with_border_tiles(
    pyr3: jax.Array, level: jax.Array, centers: jax.Array, patch_size: int
) -> tuple[jax.Array, jax.Array]:
    """Tile-based [N, (P+2)²] border-patch extraction at per-feature level
    (level coords)."""
    pwb = patch_size + 2
    offs = patch_offsets(pwb, centers.dtype)
    uv = jnp.floor(centers)[:, None, :] + offs[None]
    tile = pwb + 4
    tb = tl.extract_tiles(pyr3, level,
                          jnp.stack([centers[:, 1], centers[:, 0]], -1),
                          tile, tile)
    vals, inb = tl.tile_bilinear(tb, uv[..., 1], uv[..., 0])
    return vals, jnp.all(inb, axis=-1)


def _align_core(
    sample: Callable,         # (pos [N,S,2]) -> (vals [N,S], inb [N,S])
    ref_patch: jax.Array,     # [N, P²]
    jac: jax.Array,           # [N, P², 4] IC-LK Jacobian (e1, e2, offs, gain)
    e1: jax.Array,            # [N, 2] motion basis
    e2: jax.Array,            # [N, 2]
    px_init: jax.Array,       # [N, 2]
    n_iter: int,
    affine_est_offset: bool,
    affine_est_gain: bool,
    min_update_squared: float,
    valid: jax.Array,
) -> AlignResult:
    n, area = ref_patch.shape
    patch_size = int(round(area ** 0.5))
    dt = px_init.dtype
    H = jnp.einsum("npi,npj->nij", jac, jac)
    if not affine_est_offset:
        H = H.at[:, 2, 2].add(1.0)
    if not affine_est_gain:
        H = H.at[:, 3, 3].add(1.0)
    # degenerate second basis (1D mode) → keep H invertible
    H = H.at[:, 1, 1].add((jnp.sum(e2 * e2, -1) < 1e-8).astype(dt))
    offs = patch_offsets(patch_size, dt)

    def body(_, carry):
        uv, mean_diff, alpha, done = carry
        pos = uv[:, None, :] + offs[None]
        cur, inb = sample(pos)
        ok = jnp.all(inb, axis=-1) & valid
        res = cur - alpha[:, None] * ref_patch + mean_diff[:, None]
        jres = -jnp.einsum("np,npi->ni", res, jac)
        if not affine_est_offset:
            jres = jres.at[:, 2].set(0.0)
        if not affine_est_gain:
            jres = jres.at[:, 3].set(0.0)
        upd = tl.solve_psd_small(H, jres, damping=1e-8)
        apply = (ok & ~done)[:, None]
        duv = upd[:, 0:1] * e1 + upd[:, 1:2] * e2
        uv = uv + jnp.where(apply, duv, 0.0)
        mean_diff = mean_diff + jnp.where(apply[:, 0], upd[:, 2], 0.0)
        alpha = alpha + jnp.where(apply[:, 0], upd[:, 3], 0.0)
        small = jnp.sum(duv ** 2, axis=-1) < min_update_squared
        done = done | (small & ok) | ~ok
        return uv, mean_diff, alpha, done

    init = (px_init, jnp.zeros((n,), dt), jnp.ones((n,), dt),
            jnp.zeros((n,), bool))
    uv, mean_diff, alpha, _ = jax.lax.fori_loop(0, n_iter, body, init)

    pos = uv[:, None, :] + offs[None]
    _, inb = sample(pos)
    conv = jnp.all(inb, axis=-1) & valid & jnp.all(jnp.isfinite(uv), axis=-1)
    return AlignResult(uv, conv, mean_diff, alpha)


def _full_jac(ref_patch, ref_dx, ref_dy, e1, e2, affine_est_offset,
              affine_est_gain):
    j1 = e1[:, 0:1] * ref_dx + e1[:, 1:2] * ref_dy
    j2 = e2[:, 0:1] * ref_dx + e2[:, 1:2] * ref_dy
    zeros = jnp.zeros_like(ref_patch)
    return jnp.stack([
        j1, j2,
        jnp.ones_like(ref_patch) if affine_est_offset else zeros,
        -ref_patch if affine_est_gain else zeros,
    ], axis=-1)


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
    n = ref_patch.shape[0]
    dt = px_init.dtype
    if valid is None:
        valid = jnp.ones((n,), bool)
    e1 = jnp.broadcast_to(jnp.array([1.0, 0.0], dt), (n, 2))
    e2 = jnp.broadcast_to(jnp.array([0.0, 1.0], dt), (n, 2))
    jac = _full_jac(ref_patch, ref_dx, ref_dy, e1, e2,
                    affine_est_offset, affine_est_gain)
    sample = lambda pos: bilinear(cur_img, pos)  # noqa: E731
    return _align_core(sample, ref_patch, jac, e1, e2, px_init, n_iter,
                       affine_est_offset, affine_est_gain,
                       min_update_squared, valid)


def align2d_tiles(
    pyr3: jax.Array,          # padded [L, H, W]
    level: jax.Array,         # [N] i32
    ref_patch: jax.Array,
    ref_dx: jax.Array,
    ref_dy: jax.Array,
    px_init: jax.Array,       # [N, 2] level coords
    n_iter: int = 10,
    tile: int = 24,
    affine_est_offset: bool = True,
    affine_est_gain: bool = False,
    min_update_squared: float = 0.03 * 0.03,
    valid: jax.Array | None = None,
) -> AlignResult:
    """align2d sampling inside one tile per feature (the TPU fast path)."""
    n = ref_patch.shape[0]
    dt = px_init.dtype
    if valid is None:
        valid = jnp.ones((n,), bool)
    e1 = jnp.broadcast_to(jnp.array([1.0, 0.0], dt), (n, 2))
    e2 = jnp.broadcast_to(jnp.array([0.0, 1.0], dt), (n, 2))
    jac = _full_jac(ref_patch, ref_dx, ref_dy, e1, e2,
                    affine_est_offset, affine_est_gain)
    tb = tl.extract_tiles(pyr3, level,
                          jnp.stack([px_init[:, 1], px_init[:, 0]], -1),
                          tile, tile)
    sample = lambda pos: tl.tile_bilinear(  # noqa: E731
        tb, pos[..., 1], pos[..., 0])
    return _align_core(sample, ref_patch, jac, e1, e2, px_init, n_iter,
                       affine_est_offset, affine_est_gain,
                       min_update_squared, valid)


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
    (reference: feature_alignment.cpp:31-202)."""
    n = ref_patch.shape[0]
    dt = px_init.dtype
    if valid is None:
        valid = jnp.ones((n,), bool)
    e1 = direction
    e2 = jnp.zeros((n, 2), dt)
    jac = _full_jac(ref_patch, ref_dx, ref_dy, e1, e2,
                    affine_est_offset, affine_est_gain)
    sample = lambda pos: bilinear(cur_img, pos)  # noqa: E731
    return _align_core(sample, ref_patch, jac, e1, e2, px_init, n_iter,
                       affine_est_offset, affine_est_gain,
                       min_update_squared, valid)


def align_pyr_2d(
    pyr_ref: jax.Array,       # padded [L, H, W]
    pyr_cur: jax.Array,       # padded [L, H, W]
    px_ref: jax.Array,        # [N, 2] level-0 coords in ref
    px_cur_init: jax.Array,   # [N, 2] level-0 initial guess in cur
    max_level: int = 4,
    min_level: int = 0,
    patch_sizes: tuple | None = None,
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
        lvl = jnp.full((n,), level, jnp.int32)
        ref_c = px_ref / scale
        border, ok_ref = extract_patch_with_border_tiles(
            pyr_ref, lvl, ref_c, p)
        patch, dx, dy = patch_with_border_to_inner(border, p)
        res = align2d_tiles(
            pyr_cur, lvl, patch, dx, dy, uv / scale, n_iter=n_iter,
            tile=p + 18,
            affine_est_offset=False, affine_est_gain=False,
            min_update_squared=min_update_squared / scale,
            valid=valid & ok_ref)
        # keep refined position only where that level converged
        uv = jnp.where(res.converged[:, None], res.px * scale, uv)
        any_conv = any_conv | res.converged
    return AlignResult(uv, any_conv & valid, jnp.zeros((n,)), jnp.ones((n,)))
