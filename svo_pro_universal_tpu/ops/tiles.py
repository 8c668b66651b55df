"""Tile-based image sampling: the TPU fast path for every patch operation.

Why tiles: on TPU, an XLA gather that *materializes* a large scattered
result runs at ~8 ns/element (a serialized scalar loop), while gathers with
large slice sizes (rows/tiles) and batched matmuls run at full HBM/MXU
speed — measured on-chip here (see DESIGN.md §perf). The reference's
per-feature patch loops (reference: src/svo_direct/src/feature_alignment.cpp,
matcher.cpp:200-241, sparse_img_align.cpp:319-498) therefore map to:

1. ``extract_tiles``   — one vmapped ``lax.dynamic_slice`` per feature pulls
   an axis-aligned (R×T) tile around the feature from the padded pyramid
   (a gather with slice_sizes=(1,R,T): the fast path).
2. ``tile_bilinear``   — all subpixel samples are evaluated *inside* the
   tiles as a batched bilinear form ``Σ_r Σ_c hat(y−r)·tile[r,c]·hat(x−c)``
   (two small einsums on the MXU — no scattered gather at all).
3. ``zmssd_score_map`` — patch scoring over whole tiles as a depthwise
   cross-correlation (``conv_general_dilated`` with feature_group_count=N)
   plus box sums, replacing the per-candidate ZMSSD loops of
   reference patch_score.h:44-228.

Pyramids are stored PADDED: one [L, H, W] float32 array per frame, level l
occupying the top-left (H>>l, W>>l) corner (zeros elsewhere). Static-shape
friendly, uniform indexing across levels, stacks to [K, L, H, W] in the
keyframe ring.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def level_sizes(h: int, w: int, n_levels: int) -> tuple[jax.Array, jax.Array]:
    """(heights [L], widths [L]) of the pyramid levels as i32 constants."""
    hs = jnp.asarray([h >> l for l in range(n_levels)], jnp.int32)
    ws = jnp.asarray([w >> l for l in range(n_levels)], jnp.int32)
    return hs, ws


class TileBatch(NamedTuple):
    """[N] axis-aligned tiles cut from per-feature pyramid levels."""
    tiles: jax.Array     # [N, R, T] float32
    y0: jax.Array        # [N] i32 tile top in level coords
    x0: jax.Array        # [N] i32 tile left in level coords
    lh: jax.Array        # [N] i32 level height (valid image extent)
    lw: jax.Array        # [N] i32 level width

    @property
    def shape_rt(self) -> tuple[int, int]:
        return self.tiles.shape[-2], self.tiles.shape[-1]


def _tile_origin(cy, cx, level, R, T, h, w, n_levels):
    hs, ws = level_sizes(h, w, n_levels)
    lvl = jnp.clip(level, 0, n_levels - 1)
    lh, lw = hs[lvl], ws[lvl]
    y0 = jnp.round(cy).astype(jnp.int32) - R // 2
    x0 = jnp.round(cx).astype(jnp.int32) - T // 2
    # keep the slice inside the PADDED array; level-extent handling is done
    # by the sampling masks (zeros pad outside the level extent)
    y0 = jnp.clip(y0, 0, h - R)
    x0 = jnp.clip(x0, 0, w - T)
    return y0, x0, lh, lw, lvl


def _aligned_origins(y0, x0, RA, TA, Hp, Wp):
    """(8, 128)-aligned superset origins covering [y0, y0+R) × [x0, x0+T).

    ``Hp``/``Wp`` are the DMA-source dims and must themselves be ×8/×128
    (so the clip bound stays aligned AND every window near the right/
    bottom edge remains covered — with unpadded dims the last
    ``W mod 128`` columns would be unreachable by any aligned window)."""
    ya = jnp.clip((y0 // 8) * 8, 0, Hp - RA)
    xa = jnp.clip((x0 // 128) * 128, 0, Wp - TA)
    return ya, xa


def _dma_source(arr: jax.Array) -> jax.Array:
    """Zero-pad the trailing two dims to (×8, ×128) for aligned DMA.

    The pyramid keeps its logical [L, H, W] shape everywhere (level
    extents, masks, border checks are all derived from it); only the
    Pallas gather reads this padded copy. XLA CSEs the pad across the
    many extract calls inside one program, so it costs one ~2 MB copy
    per frame program (~5 µs) against the ~0.5 ms the kernel saves."""
    *lead, h, w = arr.shape
    hp, wp = -(-h // 8) * 8, -(-w // 128) * 128
    if hp == h and wp == w:
        return arr
    pad = [(0, 0)] * len(lead) + [(0, hp - h), (0, wp - w)]
    return jnp.pad(arr, pad)


@partial(jax.jit, static_argnums=(3, 4), inline=True)
def extract_tiles(pyr3: jax.Array, level: jax.Array, center_yx: jax.Array,
                  R: int, T: int) -> TileBatch:
    """Cut [N, ≥R, ≥T] tiles around ``center_yx`` ([N, 2] = (y, x) in LEVEL
    coords) at per-feature ``level`` from a padded [L, H, W] pyramid.

    On TPU this dispatches to the Pallas DMA-gather kernel
    (ops/pallas_tiles.py), which returns an (8, 128)-ALIGNED SUPERSET tile
    covering the requested window — all samplers below work off
    ``TileBatch.y0/x0`` and the actual tile shape, so callers are
    agnostic; elsewhere (CPU tests, tiny images) it falls back to the
    exact-size XLA dynamic-slice gather.
    """
    from svo_pro_universal_tpu.ops import pallas_tiles as ptl
    L, H, W = pyr3.shape
    y0, x0, lh, lw, lvl = _tile_origin(
        center_yx[:, 0], center_yx[:, 1], level, R, T, H, W, L)
    RA, TA = ptl.round_rows(R), ptl.round_cols(T)
    Hp, Wp = -(-H // 8) * 8, -(-W // 128) * 128
    if ptl.pallas_supported() and Hp >= RA and Wp >= TA:
        ya, xa = _aligned_origins(y0, x0, RA, TA, Hp, Wp)
        tiles = ptl.gather_tiles(_dma_source(pyr3), lvl, ya, xa, RA, TA)
        return TileBatch(tiles, ya, xa, lh, lw)

    def one(l, y, x):
        return jax.lax.dynamic_slice(pyr3, (l, y, x), (1, R, T))[0]

    tiles = jax.vmap(one)(lvl, y0, x0)
    return TileBatch(tiles, y0, x0, lh, lw)


@partial(jax.jit, static_argnums=(4, 5), inline=True)
def extract_tiles_ring(ring4: jax.Array, kf: jax.Array, level: jax.Array,
                       center_yx: jax.Array, R: int, T: int) -> TileBatch:
    """Same as :func:`extract_tiles` but from a stacked keyframe-ring
    pyramid [K, L, H, W] with a per-feature keyframe index."""
    from svo_pro_universal_tpu.ops import pallas_tiles as ptl
    K, L, H, W = ring4.shape
    y0, x0, lh, lw, lvl = _tile_origin(
        center_yx[:, 0], center_yx[:, 1], level, R, T, H, W, L)
    kfc = jnp.clip(kf, 0, K - 1)
    RA, TA = ptl.round_rows(R), ptl.round_cols(T)
    Hp, Wp = -(-H // 8) * 8, -(-W // 128) * 128
    if ptl.pallas_supported() and Hp >= RA and Wp >= TA:
        ya, xa = _aligned_origins(y0, x0, RA, TA, Hp, Wp)
        tiles = ptl.gather_tiles_ring(_dma_source(ring4), kfc, lvl,
                                      ya, xa, RA, TA)
        return TileBatch(tiles, ya, xa, lh, lw)

    def one(k, l, y, x):
        return jax.lax.dynamic_slice(ring4, (k, l, y, x), (1, 1, R, T))[0, 0]

    tiles = jax.vmap(one)(kfc, lvl, y0, x0)
    return TileBatch(tiles, y0, x0, lh, lw)


def crop_tiles(tb: TileBatch, y0: jax.Array, x0: jax.Array,
               R: int, T: int) -> TileBatch:
    """Exact (R, T) window at absolute per-feature (y0, x0) out of a
    (possibly aligned-superset) TileBatch, as two one-hot selection
    matmuls — MXU work, no gather. Used where downstream cost scales with
    tile AREA (the dense ZMSSD epipolar scan): scanning a 256-wide
    aligned superset would cost ~10× the conv FLOPs of the logical
    window."""
    Rp, Tp = tb.shape_rt
    if (Rp, Tp) == (R, T):
        return tb
    n = tb.tiles.shape[0]
    dy = (y0 - tb.y0).astype(jnp.int32)
    dx = (x0 - tb.x0).astype(jnp.int32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, R, Rp), 1)
    hi = jax.lax.broadcasted_iota(jnp.int32, (n, R, Rp), 2)
    Sy = (hi == dy[:, None, None] + ri).astype(tb.tiles.dtype)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, T, Tp), 1)
    wi = jax.lax.broadcasted_iota(jnp.int32, (n, T, Tp), 2)
    Sx = (wi == dx[:, None, None] + ci).astype(tb.tiles.dtype)
    tmp = jnp.einsum("nrh,nht->nrt", Sy, tb.tiles)
    out = jnp.einsum("nrt,nct->nrc", tmp, Sx)
    return TileBatch(out, y0, x0, tb.lh, tb.lw)


def tile_bilinear(tb: TileBatch, ys: jax.Array, xs: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
    """Bilinear-sample every tile at [N, S] LEVEL-coordinate positions.

    Returns (vals [N, S], inb [N, S]). ``inb`` requires the full 2×2 bilinear
    support inside both the tile and the level extent — matching the
    reference's border checks (feature_alignment.cpp:212-227).
    """
    R, T = tb.shape_rt
    ty = ys - tb.y0[:, None].astype(ys.dtype)     # tile-local float coords
    tx = xs - tb.x0[:, None].astype(xs.dtype)
    ri = jnp.arange(R, dtype=ys.dtype)
    ci = jnp.arange(T, dtype=xs.dtype)
    Ry = jnp.maximum(0.0, 1.0 - jnp.abs(ty[..., None] - ri))   # [N, S, R]
    Cx = jnp.maximum(0.0, 1.0 - jnp.abs(tx[..., None] - ci))   # [N, S, T]
    tmp = jnp.einsum("nsr,nrt->nst", Ry, tb.tiles)
    vals = jnp.einsum("nst,nst->ns", tmp, Cx)
    eps = 1e-6
    inb = ((ty >= 0) & (ty <= R - 1 + eps) & (tx >= 0) & (tx <= T - 1 + eps)
           & (ys >= 0) & (ys <= (tb.lh[:, None] - 1).astype(ys.dtype) - eps)
           & (xs >= 0) & (xs <= (tb.lw[:, None] - 1).astype(xs.dtype) - eps))
    return jnp.where(inb, vals, 0.0), inb


def tile_bilinear_grad(tb: TileBatch, ys: jax.Array, xs: jax.Array
                       ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(val, d/dx, d/dy, inb) at [N, S] positions — central differences of
    the bilinear surface, same four taps ±0.5px (cf. ops.interp
    bilinear_with_gradient)."""
    val, inb = tile_bilinear(tb, ys, xs)
    vxp, ixp = tile_bilinear(tb, ys, xs + 0.5)
    vxm, ixm = tile_bilinear(tb, ys, xs - 0.5)
    vyp, iyp = tile_bilinear(tb, ys + 0.5, xs)
    vym, iym = tile_bilinear(tb, ys - 0.5, xs)
    dx = vxp - vxm
    dy = vyp - vym
    allin = inb & ixp & ixm & iyp & iym
    z = jnp.zeros_like(val)
    return (jnp.where(allin, val, z), jnp.where(allin, dx, z),
            jnp.where(allin, dy, z), allin)


def zmssd_score_map(tb: TileBatch, ref_patch: jax.Array, patch: int
                    ) -> tuple[jax.Array, jax.Array]:
    """Zero-mean SSD of ``ref_patch`` [N, patch²] against every integer
    patch position in each tile (reference: patch_score.h ZMSSD::computeScore
    :44-228, evaluated densely instead of per-candidate).

    Returns (score [N, R-patch+1, T-patch+1], topleft_valid same shape):
    score[n, v, u] compares ref_patch[n] with tile[n, v:v+patch, u:u+patch].
    """
    n, area = ref_patch.shape
    R, T = tb.shape_rt
    p = patch
    assert area == p * p
    refc = ref_patch - jnp.mean(ref_patch, axis=-1, keepdims=True)
    refc2 = jnp.sum(refc * refc, axis=-1)                       # [N]

    tiles = tb.tiles[None]                                      # [1, N, R, T]
    ones = jnp.ones((n, 1, p, p), tiles.dtype)
    dn = ("NCHW", "OIHW", "NCHW")
    # per-feature correlation with the centered template
    corr = jax.lax.conv_general_dilated(
        tiles, refc.reshape(n, 1, p, p), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=n)[0]         # [N, R', T']
    s1 = jax.lax.conv_general_dilated(
        tiles, ones, (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=n)[0]
    s2 = jax.lax.conv_general_dilated(
        tiles * tiles, ones, (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=n)[0]
    # Σ((A-Ā) − (B−B̄))² = ΣA² − (ΣA)²/p² − 2·corr + Σ(B−B̄)²
    score = s2 - s1 * s1 / float(area) - 2.0 * corr + refc2[:, None, None]

    Rp, Tp = R - p + 1, T - p + 1
    vy = tb.y0[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (n, Rp, Tp), 1)
    vx = tb.x0[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (n, Rp, Tp), 2)
    ok = ((vy + p <= tb.lh[:, None, None]) & (vx + p <= tb.lw[:, None, None]))
    return score, ok


def solve_psd_small(H: jax.Array, g: jax.Array, damping: float = 1e-8
                    ) -> jax.Array:
    """Batched (or single) [.., D, D] @ x = [.., D] solve via unrolled
    Cholesky.

    ``jnp.linalg.solve``/``inv`` on small batched matrices take the
    generic LU path (~2 ms for [360,3,3]×5 iterations measured on this
    chip); the unrolled Cholesky is a fused elementwise chain. D is
    static and small; falls back to jnp.linalg.solve for D > 8.
    """
    D = H.shape[-1]
    if D > 8:
        return jnp.linalg.solve(H, g[..., None])[..., 0]
    H = H + damping * jnp.eye(D, dtype=H.dtype)
    # Cholesky H = L Lᵀ, unrolled
    L = [[None] * D for _ in range(D)]
    for i in range(D):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = g
    y = [None] * D
    for i in range(D):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * D
    for i in reversed(range(D)):
        s = y[i]
        for k in range(i + 1, D):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
