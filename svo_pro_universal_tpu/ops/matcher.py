"""Direct patch matching: epipolar-line search and landmark re-matching.

TPU-native replacement for the reference's Matcher
(reference: src/svo_direct/src/matcher.cpp — findMatchDirect:31-141,
findEpipolarMatchDirect:157-241, scanEpipolarUnitPlane:340-414,
findLocalMatch:262-298, depthFromTriangulation:492-505; options
matcher.h:28-150). The per-seed while-loop scan becomes a dense tile scan:
each feature cuts ONE axis-aligned tile around its (clamped) epipolar window
from the current pyramid (ops.tiles.extract_tiles — the fast sliced-gather
path), ZMSSD against the affine-warped reference patch is evaluated at EVERY
integer position of the tile at once as a depthwise cross-correlation, and
positions are masked to the epipolar segment. One fused subpixel alignment
(in-tile bilinear einsums) refines all winners.

Pyramids are padded [L, H, W] arrays (``ops.pyramid.build_pyramid``); the
reference side may be a stacked keyframe ring [K, L, H, W] with a
per-feature ``ref_kf`` index.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.ops import patch_warp as pw
from svo_pro_universal_tpu.ops import tiles as tl
from svo_pro_universal_tpu.utils.transform import SE3

HALF_PATCH = 4
PATCH = 2 * HALF_PATCH                     # 8, reference kPatchSize
PATCH_AREA = PATCH * PATCH
ZMSSD_THRESHOLD_PER_PX = 2000.0            # reference PatchScore::threshold()

REF_TILE = 24                              # ref-patch warp sampling tile
ALIGN_TILE = 24                            # subpixel-alignment tile
SCAN_TILE = 40                             # epipolar scan tile (window+patch)


class MatcherOptions(NamedTuple):
    max_epi_search_steps: int = 64         # scan budget → window length (px)
    subpix_refinement: bool = True
    epi_search_edgelet_filtering: bool = True
    epi_search_edgelet_max_angle: float = 0.7
    align_max_iter: int = 10
    affine_est_offset: bool = True
    affine_est_gain: bool = False
    max_patch_diff_ratio: float = 2.0
    scan_band_px: float = 0.76             # accept band around the segment


class EpipolarMatch(NamedTuple):
    px_cur: jax.Array         # [N, 2] match position (level 0)
    f_cur: jax.Array          # [N, 3] bearing of match
    depth: jax.Array          # [N] triangulated depth along ref bearing
    search_level: jax.Array   # [N] i32
    success: jax.Array        # [N] bool
    rejected: jax.Array       # [N] bool: pre-filtered (no Bayes penalty)


def warp_ref_patches_with_border(
    pyr_ref: jax.Array,         # [L, H, W] or [K, L, H, W]
    ref_kf: jax.Array | None,   # [N] i32 ring slots (None → single frame)
    A_cur_ref: jax.Array,       # [N, 2, 2]
    px_ref: jax.Array,          # [N, 2] level-0
    level_ref: jax.Array,       # [N] i32
    search_level: jax.Array,    # [N] i32
) -> tuple[jax.Array, jax.Array]:
    """Affine-warped (P+2)² reference patches sampled at per-feature level.

    Mirrors warpAffine with halfpatch+1 (matcher.cpp:200-205) — patch pixel
    grid lives at `search_level` in cur; A_ref_cur maps into the ref level.
    One 24×24 tile per feature bounds the warp support (best_search_level
    keeps the warped radius ≲ 10px; larger warps are rejected by the
    in-bounds mask, as the reference rejects patches leaving the image).
    """
    n = px_ref.shape[0]
    det = (A_cur_ref[:, 0, 0] * A_cur_ref[:, 1, 1]
           - A_cur_ref[:, 0, 1] * A_cur_ref[:, 1, 0])
    safe = jnp.where(jnp.abs(det) > 1e-8, det, 1e-8)
    inv = jnp.stack([
        jnp.stack([A_cur_ref[:, 1, 1], -A_cur_ref[:, 0, 1]], -1),
        jnp.stack([-A_cur_ref[:, 1, 0], A_cur_ref[:, 0, 0]], -1),
    ], axis=1) / safe[:, None, None]
    A_ref_cur = inv * (1 << search_level).astype(inv.dtype)[:, None, None]

    pwb = PATCH + 2
    r = jnp.arange(pwb, dtype=px_ref.dtype) - (pwb / 2.0)
    ou, ov = jnp.meshgrid(r, r, indexing="xy")
    offs = jnp.stack([ou.ravel(), ov.ravel()], -1)             # [(P+2)², 2]
    scale_ref = (1 << level_ref).astype(px_ref.dtype)
    center = px_ref / scale_ref[:, None]                       # ref lvl coords
    uv = jnp.einsum("nij,pj->npi", A_ref_cur, offs) + center[:, None, :]

    cyx = jnp.stack([center[:, 1], center[:, 0]], -1)
    if ref_kf is None:
        tb = tl.extract_tiles(pyr_ref, level_ref, cyx, REF_TILE, REF_TILE)
    else:
        tb = tl.extract_tiles_ring(pyr_ref, ref_kf, level_ref, cyx,
                                   REF_TILE, REF_TILE)
    vals, inb = tl.tile_bilinear(tb, uv[..., 1], uv[..., 0])
    ok = jnp.all(inb, axis=-1) & (jnp.abs(det) > 1e-8)
    return vals, ok


def _local_align(
    pyr_cur: jax.Array,            # [L, H, W]
    search_level: jax.Array,       # [N]
    border_patch: jax.Array,       # [N, (P+2)²]
    px_init_lvl: jax.Array,        # [N, 2] at search level
    direction_lvl: jax.Array,      # [N, 2] 1D motion direction (edgelets)
    use_1d: jax.Array,             # [N] bool
    opts: MatcherOptions,
    valid: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Unified batched align2D/align1D on per-feature pyramid levels
    (reference findLocalMatch matcher.cpp:262-298). 1D features move only
    along `direction_lvl`; both cases share one 4-param GN. All sampling
    happens inside one 24×24 tile per feature — motion beyond the tile means
    divergence and is rejected, like the reference's border check."""
    n = border_patch.shape[0]
    dt = px_init_lvl.dtype
    b = border_patch.reshape(n, PATCH + 2, PATCH + 2)
    ref = b[:, 1:-1, 1:-1].reshape(n, PATCH_AREA)
    dx = (0.5 * (b[:, 1:-1, 2:] - b[:, 1:-1, :-2])).reshape(n, PATCH_AREA)
    dy = (0.5 * (b[:, 2:, 1:-1] - b[:, :-2, 1:-1])).reshape(n, PATCH_AREA)

    # basis: 2D → e1=(1,0), e2=(0,1); 1D → e1=dir, e2=0
    e1 = jnp.where(use_1d[:, None], direction_lvl,
                   jnp.broadcast_to(jnp.array([1.0, 0.0], dt), (n, 2)))
    e2 = jnp.where(use_1d[:, None], jnp.zeros((n, 2), dt),
                   jnp.broadcast_to(jnp.array([0.0, 1.0], dt), (n, 2)))
    j1 = e1[:, 0:1] * dx + e1[:, 1:2] * dy
    j2 = e2[:, 0:1] * dx + e2[:, 1:2] * dy
    zeros = jnp.zeros_like(ref)
    jac = jnp.stack([
        j1, j2,
        jnp.ones_like(ref) if opts.affine_est_offset else zeros,
        -ref if opts.affine_est_gain else zeros,
    ], axis=-1)
    H = jnp.einsum("npi,npj->nij", jac, jac)
    # disabled blocks → identity entries so H stays invertible
    H = H.at[:, 1, 1].add(use_1d.astype(dt))
    if not opts.affine_est_offset:
        H = H.at[:, 2, 2].add(1.0)
    if not opts.affine_est_gain:
        H = H.at[:, 3, 3].add(1.0)

    from svo_pro_universal_tpu.ops.interp import patch_offsets
    offs = patch_offsets(PATCH, dt)

    tb = tl.extract_tiles(
        pyr_cur, search_level,
        jnp.stack([px_init_lvl[:, 1], px_init_lvl[:, 0]], -1),
        ALIGN_TILE, ALIGN_TILE)

    def body(_, carry):
        uv, mean_diff, alpha, done = carry
        pos = uv[:, None, :] + offs[None]
        cur, inb = tl.tile_bilinear(tb, pos[..., 1], pos[..., 0])
        ok = jnp.all(inb, axis=-1) & valid
        res = cur - alpha[:, None] * ref + mean_diff[:, None]
        jres = -jnp.einsum("np,npi->ni", res, jac)
        if not opts.affine_est_offset:
            jres = jres.at[:, 2].set(0.0)
        if not opts.affine_est_gain:
            jres = jres.at[:, 3].set(0.0)
        upd = tl.solve_psd_small(H, jres, damping=1e-8)
        apply = (ok & ~done)[:, None]
        duv = upd[:, 0:1] * e1 + upd[:, 1:2] * e2
        uv = uv + jnp.where(apply, duv, 0.0)
        mean_diff = mean_diff + jnp.where(apply[:, 0], upd[:, 2], 0.0)
        alpha = alpha + jnp.where(apply[:, 0], upd[:, 3], 0.0)
        small = jnp.sum(duv ** 2, axis=-1) < 0.03 * 0.03
        done = done | (small & ok) | ~ok
        return uv, mean_diff, alpha, done

    init = (px_init_lvl, jnp.zeros((n,), dt), jnp.ones((n,), dt),
            jnp.zeros((n,), bool))
    uv, _, _, _ = jax.lax.fori_loop(0, opts.align_max_iter, body, init)
    pos = uv[:, None, :] + offs[None]
    _, inb = tl.tile_bilinear(tb, pos[..., 1], pos[..., 0])
    conv = jnp.all(inb, axis=-1) & valid & jnp.all(jnp.isfinite(uv), axis=-1)
    return uv, conv


def depth_from_triangulation(T_cur_ref: SE3, f_ref: jax.Array,
                             f_cur: jax.Array
                             ) -> tuple[jax.Array, jax.Array]:
    """Batched two-view depth along the ref bearing
    (reference: matcher.cpp:492-505). Returns (depth [N], ok [N])."""
    Rf = T_cur_ref.rotate(f_ref)
    a00 = jnp.sum(Rf * Rf, -1)
    a01 = jnp.sum(Rf * f_cur, -1)
    a11 = jnp.sum(f_cur * f_cur, -1)
    det = a00 * a11 - a01 * a01
    t = jnp.broadcast_to(T_cur_ref.t, f_ref.shape)
    b0 = jnp.sum(Rf * t, -1)
    b1 = jnp.sum(f_cur * t, -1)
    safe = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
    d0 = -(a11 * b0 - a01 * b1) / safe
    ok = det >= 1e-6
    return jnp.abs(d0), ok


def find_epipolar_matches(
    pyr_ref: jax.Array,            # [L,H,W] or [K,L,H,W] (+ ref_kf)
    pyr_cur: jax.Array,            # [L,H,W]
    cam_ref: proj.Camera,
    cam_cur: proj.Camera,
    T_cur_ref: SE3,                # scalar or [N]-batched
    px_ref: jax.Array,             # [N, 2]
    f_ref: jax.Array,              # [N, 3]
    grad_ref: jax.Array,           # [N, 2]
    is_edgelet: jax.Array,         # [N] bool
    level_ref: jax.Array,          # [N] i32
    d_estimate_inv: jax.Array,     # [N]
    d_min_inv: jax.Array,          # [N]
    d_max_inv: jax.Array,          # [N]
    valid: jax.Array,              # [N] bool
    max_search_level: int,
    opts: MatcherOptions = MatcherOptions(),
    ref_kf: jax.Array | None = None,
) -> EpipolarMatch:
    """Batched findEpipolarMatchDirect (matcher.cpp:157-241).

    The reference walks the epipolar line with a data-dependent while loop;
    here every integer patch position inside a fixed tile around the
    (budget-clamped) epipolar window is scored at once and masked to a band
    around the segment — same coverage, one dense program.
    """
    n = px_ref.shape[0]
    dt = px_ref.dtype
    Rf = T_cur_ref.rotate(f_ref)
    t = jnp.broadcast_to(T_cur_ref.t, f_ref.shape)
    A_b = Rf + t * d_min_inv[:, None]    # near point (bearing space)
    B_b = Rf + t * d_max_inv[:, None]    # far point
    C_b = Rf + t * d_estimate_inv[:, None]
    px_A, _ = proj.project(cam_cur, A_b)
    px_B, _ = proj.project(cam_cur, B_b)
    epi_image = px_A - px_B
    epi_len0 = jnp.linalg.norm(epi_image, axis=-1)

    A_cur_ref = pw.affine_warp_matrix(
        cam_ref, cam_cur, px_ref, f_ref,
        1.0 / jnp.maximum(d_estimate_inv, 1e-6), T_cur_ref, level_ref)
    search_level = pw.best_search_level(A_cur_ref, max_search_level)
    scale = (1 << search_level).astype(dt)
    epi_len_pyr = epi_len0 / scale
    epi_dir = epi_image / jnp.maximum(epi_len0, 1e-8)[:, None]

    # edgelet pre-filter (matcher.cpp:183-194)
    grad_cur = jnp.einsum("nij,nj->ni", A_cur_ref, grad_ref)
    grad_cur = grad_cur / jnp.maximum(
        jnp.linalg.norm(grad_cur, axis=-1, keepdims=True), 1e-8)
    cosangle = jnp.abs(jnp.sum(grad_cur * epi_dir, axis=-1))
    rejected = (is_edgelet & (cosangle < opts.epi_search_edgelet_max_angle)
                & jnp.asarray(opts.epi_search_edgelet_filtering))
    valid = valid & ~rejected

    border_patch, warp_ok = warp_ref_patches_with_border(
        pyr_ref, ref_kf, A_cur_ref, px_ref, level_ref, search_level)
    bp = border_patch.reshape(n, PATCH + 2, PATCH + 2)
    ref_patch = bp[:, 1:-1, 1:-1].reshape(n, PATCH_AREA)
    valid = valid & warp_ok

    # --- window along the unit-plane segment B→A, clamped to the budget ---
    uv_A = A_b[:, 0:2] / A_b[:, 2:3]
    uv_B = B_b[:, 0:2] / B_b[:, 2:3]
    uv_C = C_b[:, 0:2] / C_b[:, 2:3]
    seg = uv_A - uv_B
    seg_len2 = jnp.maximum(jnp.sum(seg * seg, -1), 1e-16)
    t_C = jnp.clip(jnp.sum((uv_C - uv_B) * seg, -1) / seg_len2, 0.0, 1.0)
    # window (in t units) centered on the depth-estimate point when the
    # full line exceeds the scan budget (matcher.cpp:351-361); budget here
    # is the tile extent at the search level
    budget_px = jnp.asarray(min(opts.max_epi_search_steps * 0.7,
                                SCAN_TILE - PATCH - 2), dt)
    halfw = jnp.minimum(0.5 * budget_px / jnp.maximum(epi_len_pyr, 1.0), 0.5)
    t_lo = jnp.clip(t_C - halfw, 0.0, 1.0 - 2.0 * halfw)
    t_hi = t_lo + 2.0 * halfw
    ones1 = jnp.ones((n, 1), dt)
    px_W0, _ = proj.project(cam_cur, jnp.concatenate(
        [uv_B + t_lo[:, None] * seg, ones1], -1))
    px_W1, _ = proj.project(cam_cur, jnp.concatenate(
        [uv_B + t_hi[:, None] * seg, ones1], -1))
    w0 = px_W0 / scale[:, None]           # window endpoints, level coords
    w1 = px_W1 / scale[:, None]
    mid = 0.5 * (w0 + w1)

    # --- dense ZMSSD over the scan tile, masked to the epipolar band -----
    tb = tl.extract_tiles(pyr_cur, search_level,
                          jnp.stack([mid[:, 1], mid[:, 0]], -1),
                          SCAN_TILE, SCAN_TILE)
    # crop any aligned-superset tile back to the logical scan window: the
    # dense ZMSSD conv below scales with tile area (a 256-wide superset
    # would cost ~10× the FLOPs for positions the band mask rejects)
    Lp, Hp_, Wp_ = pyr_cur.shape
    y0d, x0d, _, _, _ = tl._tile_origin(
        mid[:, 1], mid[:, 0], search_level, SCAN_TILE, SCAN_TILE,
        Hp_, Wp_, Lp)
    tb = tl.crop_tiles(tb, y0d, x0d, SCAN_TILE, SCAN_TILE)
    score_map, pos_ok = tl.zmssd_score_map(tb, ref_patch, PATCH)
    # score-map extent follows the PHYSICAL tile shape (on TPU the Pallas
    # gather returns an aligned superset of the logical SCAN_TILE window;
    # the epipolar-band mask below keeps the search region identical)
    tR, tT = tb.shape_rt
    SPy, SPx = tR - PATCH + 1, tT - PATCH + 1
    # candidate feature positions in level coords: the ref patch covers
    # offsets [-HALF_PATCH, HALF_PATCH) around the feature (patch_offsets),
    # so a patch at tile top-left (v, u) puts the feature at +HALF_PATCH
    cyy = (tb.y0[:, None, None].astype(dt) + float(HALF_PATCH)
           + jax.lax.broadcasted_iota(jnp.int32, (n, SPy, SPx), 1)
           .astype(dt))
    cxx = (tb.x0[:, None, None].astype(dt) + float(HALF_PATCH)
           + jax.lax.broadcasted_iota(jnp.int32, (n, SPy, SPx), 2)
           .astype(dt))
    # distance to the window segment w0→w1 + projection parameter
    d01 = w1 - w0
    d01_len2 = jnp.maximum(jnp.sum(d01 * d01, -1), 1e-12)[:, None, None]
    rx = cxx - w0[:, 0, None, None]
    ry = cyy - w0[:, 1, None, None]
    t_par = (rx * d01[:, 0, None, None] + ry * d01[:, 1, None, None]) \
        / d01_len2
    t_cl = jnp.clip(t_par, 0.0, 1.0)
    dx_ = rx - t_cl * d01[:, 0, None, None]
    dy_ = ry - t_cl * d01[:, 1, None, None]
    dist2 = dx_ * dx_ + dy_ * dy_
    band = opts.scan_band_px
    on_line = (dist2 <= band * band) & (t_par >= -0.02) & (t_par <= 1.02)
    score = jnp.where(pos_ok & on_line, score_map, jnp.inf)
    score_flat = score.reshape(n, SPy * SPx)
    best = jnp.argmin(score_flat, axis=-1)
    zmssd_best = jnp.take_along_axis(score_flat, best[:, None], 1)[:, 0]
    by = best // SPx
    bx = best - by * SPx
    px_best_lvl = jnp.stack([
        tb.x0.astype(dt) + bx.astype(dt) + float(HALF_PATCH),
        tb.y0.astype(dt) + by.astype(dt) + float(HALF_PATCH)], -1)
    px_best = px_best_lvl * scale[:, None]

    # short line → skip scan, start local search at the midpoint
    short = epi_len_pyr < 2.0
    px_init = jnp.where(short[:, None], 0.5 * (px_A + px_B), px_best)
    score_ok = short | (zmssd_best < ZMSSD_THRESHOLD_PER_PX * PATCH_AREA)

    # --- subpixel refinement at search level -----------------------------
    if opts.subpix_refinement:
        px_ref_lvl = px_init / scale[:, None]
        uv_ref, conv = _local_align(
            pyr_cur, search_level, border_patch, px_ref_lvl,
            epi_dir, is_edgelet, opts, valid & score_ok)
        px_cur = uv_ref * scale[:, None]
        align_ok = conv
    else:
        px_cur = px_init
        align_ok = jnp.ones((n,), bool)

    f_cur = proj.backproject(cam_cur, px_cur)
    depth, tri_ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    success = valid & score_ok & align_ok & tri_ok
    return EpipolarMatch(px_cur, f_cur, depth, search_level, success,
                         rejected)


class DirectMatch(NamedTuple):
    px_cur: jax.Array
    search_level: jax.Array
    success: jax.Array


def find_matches_direct(
    pyr_ref: jax.Array,             # [L,H,W] or [K,L,H,W] (+ ref_kf)
    pyr_cur: jax.Array,             # [L,H,W]
    cam_ref: proj.Camera,
    cam_cur: proj.Camera,
    T_cur_ref: SE3,                 # [N]-batched (per-feature ref KFs)
    px_ref: jax.Array,              # [N, 2]
    f_ref: jax.Array,               # [N, 3]
    depth_ref: jax.Array,           # [N] distance along ref bearing
    grad_ref: jax.Array,            # [N, 2]
    is_edgelet: jax.Array,          # [N]
    level_ref: jax.Array,           # [N]
    px_cur_init: jax.Array,         # [N, 2] projected position in cur
    valid: jax.Array,
    max_search_level: int,
    opts: MatcherOptions = MatcherOptions(),
    ref_kf: jax.Array | None = None,
) -> DirectMatch:
    """Batched findMatchDirect for landmark reprojection
    (reference: matcher.cpp:31-141): affine warp from the feature's ref
    keyframe, then subpixel alignment around the projected position."""
    A_cur_ref = pw.affine_warp_matrix(
        cam_ref, cam_cur, px_ref, f_ref, depth_ref, T_cur_ref, level_ref)
    search_level = pw.best_search_level(A_cur_ref, max_search_level)
    border_patch, warp_ok = warp_ref_patches_with_border(
        pyr_ref, ref_kf, A_cur_ref, px_ref, level_ref, search_level)
    valid = valid & warp_ok

    # edgelet direction in cur: warped gradient (matcher.cpp:104-117)
    grad_cur = jnp.einsum("nij,nj->ni", A_cur_ref, grad_ref)
    norm = jnp.maximum(jnp.linalg.norm(grad_cur, axis=-1, keepdims=True),
                       1e-8)
    dir_cur = grad_cur / norm
    # edgelets search along the normal of the warped gradient
    dir_search = jnp.stack([dir_cur[:, 1], -dir_cur[:, 0]], -1)

    dt = px_ref.dtype
    scale = (1 << search_level).astype(dt)
    uv, conv = _local_align(
        pyr_cur, search_level, border_patch,
        px_cur_init / scale[:, None], dir_search, is_edgelet, opts, valid)
    return DirectMatch(uv * scale[:, None], search_level, conv & valid)
