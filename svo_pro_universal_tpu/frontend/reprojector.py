"""Reprojector: re-observe map landmarks and seeds in the current frame.

TPU-native replacement for the reference's Reprojector
(reference: src/svo/src/reprojector.cpp — reprojectFrames:28-196, candidate
grid sorting + matching loops; options reprojector.h:26-77). The reference
walks grid cells with pointer-chasing candidate lists; here:

1. every (keyframe, feature) pair of the ring is a candidate row of one
   flat [K·F] batch (landmark-backed or live-seed-backed),
2. visibility + grid bucketing pick at most one candidate per occupancy
   cell via segment-max on a priority key,
3. one batched ``find_matches_direct`` refines all survivors at once,
4. the matched features are compacted into the current frame's fixed
   [MAX_FTS] store by ranked top-k.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.common import types as ft
from svo_pro_universal_tpu.common.point import LandmarkPool
from svo_pro_universal_tpu.frontend.map import KeyframeRing
from svo_pro_universal_tpu.ops import matcher as matcher_mod
from svo_pro_universal_tpu.utils.transform import SE3


class ReprojectorOptions(NamedTuple):
    max_n_kfs: int = 5
    max_n_features_per_frame: int = 160
    cell_size: int = 30
    reproject_unconverged_seeds: bool = True
    seed_sigma2_thresh: float = 200.0
    affine_est_offset: bool = True
    affine_est_gain: bool = False
    max_candidates: int = 384     # compaction bound before patch matching


class ReprojectResult(NamedTuple):
    """Matched features, compacted to [MAX_FTS] slots."""
    px: jax.Array            # [M, 2]
    f: jax.Array             # [M, 3]
    grad: jax.Array          # [M, 2]
    level: jax.Array         # [M]
    ftype: jax.Array         # [M]
    landmark_id: jax.Array   # [M] pool slot (-1)
    seed_ref_kf: jax.Array   # [M] ring slot (-1)
    seed_ref_idx: jax.Array  # [M]
    xyz_world: jax.Array     # [M, 3] candidate 3D position (for pose opt)
    valid: jax.Array         # [M]
    n_matches: jax.Array
    n_trials: jax.Array


def _type_rank(ftype: jax.Array, has_landmark: jax.Array,
               is_fixed: jax.Array) -> jax.Array:
    """Priority for cell selection: fixed landmarks > landmarks > converged
    seeds > seeds (reference reprojector.cpp candidate ordering)."""
    rank = jnp.where(has_landmark, 3, 0)
    rank = jnp.where(is_fixed | (ftype == ft.FeatureType.FIXED_LANDMARK),
                     4, rank)
    rank = jnp.where(ft.is_converged_seed(ftype) & ~has_landmark, 2, rank)
    rank = jnp.where(ft.is_unconverged_seed(ftype) & ~has_landmark, 1, rank)
    return rank


def reproject(
    ring: KeyframeRing,
    pool: LandmarkPool,
    T_cur_world: SE3,
    pyr_cur: jax.Array,            # padded [L, H, W] current pyramid
    cam: proj.Camera,
    overlap: jax.Array,            # [K] keyframe mask
    grid_occupied: jax.Array,      # [n_cells] cells already taken
    n_cols: int,
    n_rows: int,
    max_search_level: int,
    opts: ReprojectorOptions = ReprojectorOptions(),
    matcher_opts: matcher_mod.MatcherOptions | None = None,
) -> ReprojectResult:
    K = ring.capacity
    F = ring.frames.px.shape[1]
    NC = K * F

    # ---- 1. flat candidate batch over the whole ring -------------------
    def flat(x):
        return x.reshape((NC,) + x.shape[2:])

    kf_idx = jnp.repeat(jnp.arange(K, dtype=jnp.int32), F)
    ft_idx = jnp.tile(jnp.arange(F, dtype=jnp.int32), K)
    c_px = flat(ring.frames.px)
    c_f = flat(ring.frames.f)
    c_grad = flat(ring.frames.grad)
    c_level = flat(ring.frames.level)
    c_type = flat(ring.frames.ftype)
    c_lid = flat(ring.frames.landmark_id)
    c_seed = flat(ring.frames.seed_state)

    kf_ok = (overlap & ring.valid)[kf_idx]
    has_lm = (c_lid >= 0) & pool.valid[jnp.clip(c_lid, 0, pool.capacity - 1)]
    # a seed candidate must be OWNED by its keyframe (seed_ref_kf < 0);
    # reprojected copies in later keyframes are references without a state
    owned = flat(ring.frames.seed_ref_kf) < 0
    seed_ok = ft.is_corner_edgelet_seed(c_type) & owned
    if not opts.reproject_unconverged_seeds:
        seed_ok = seed_ok & ft.is_converged_seed(c_type)
    cand = kf_ok & (has_lm | seed_ok)

    # 3D position: landmark pool, else seed mean depth in its keyframe
    lm_pos = pool.pos[jnp.clip(c_lid, 0, pool.capacity - 1)]
    T_kf_world = jax.tree.map(lambda x: x[kf_idx], ring.frames.T_cam_world)
    T_world_kf = T_kf_world.inverse()
    seed_depth = 1.0 / jnp.maximum(c_seed[:, 0], 1e-12)
    seed_pos_w = T_world_kf.apply(c_f * seed_depth[:, None])
    xyz_w = jnp.where(has_lm[:, None], lm_pos, seed_pos_w)

    # ---- 2. visibility + grid bucketing --------------------------------
    p_cur = T_cur_world.apply(xyz_w)
    px_init, vis = proj.project(cam, p_cur)
    margin = 8.0
    vis = vis & (px_init[:, 0] >= margin) & (px_init[:, 1] >= margin) \
        & (px_init[:, 0] < cam.width - margin) \
        & (px_init[:, 1] < cam.height - margin) & (p_cur[:, 2] > 1e-6)
    cand = cand & vis

    n_cells = n_rows * n_cols
    cx = jnp.clip((px_init[:, 0] // opts.cell_size).astype(jnp.int32),
                  0, n_cols - 1)
    cy = jnp.clip((px_init[:, 1] // opts.cell_size).astype(jnp.int32),
                  0, n_rows - 1)
    cell = cy * n_cols + cx
    cell_free = ~grid_occupied[jnp.clip(cell, 0, n_cells - 1)]
    cand = cand & cell_free

    lidc = jnp.clip(c_lid, 0, pool.capacity - 1)
    is_fixed = has_lm & pool.fixed[lidc]
    rank = _type_rank(c_type, has_lm, is_fixed)
    # priority key: type rank then landmark observation count / seed quality
    quality = jnp.where(
        has_lm,
        pool.n_obs[jnp.clip(c_lid, 0, pool.capacity - 1)].astype(jnp.float32),
        1.0 / (1.0 + c_seed[:, 1]))
    key = rank.astype(jnp.float32) * 1e6 + jnp.clip(quality, 0.0, 1e5)
    key = jnp.where(cand, key, -jnp.inf)
    cell_for_seg = jnp.where(cand, cell, n_cells)
    best_key = jax.ops.segment_max(key, cell_for_seg,
                                   num_segments=n_cells + 1)[:n_cells]
    # winner per cell: highest flat index among maximizers (deterministic)
    flat_i = jnp.arange(NC, dtype=jnp.int32)
    is_winner = cand & (key >= best_key[jnp.clip(cell, 0, n_cells - 1)])
    win_idx = jax.ops.segment_max(jnp.where(is_winner, flat_i, -1),
                                  cell_for_seg,
                                  num_segments=n_cells + 1)[:n_cells]
    chosen = jnp.zeros((NC,), bool).at[
        jnp.where(win_idx >= 0, win_idx, NC)].set(True, mode="drop")
    cand = cand & chosen

    # ---- 3. COMPACT candidates, then batched direct matching -----------
    # gathers on TPU read whole tiles: matching all K·F padded rows would
    # stream ~100GB/frame of dead tiles. Select the winning rows first.
    MC = min(opts.max_candidates, NC)
    comp_key = jnp.where(cand, key, -jnp.inf)
    ck, cidx = jax.lax.top_k(comp_key, MC)
    c_ok = jnp.isfinite(ck)

    kf_c = kf_idx[cidx]
    T_world_kf_c = jax.tree.map(lambda x: x[cidx], T_world_kf)
    T_cur_kf = T_cur_world.compose(T_world_kf_c)     # [MC]-batched
    xyz_c = xyz_w[cidx]
    depth_ref = jnp.linalg.norm(xyz_c - T_world_kf_c.t, axis=-1)

    mopts = matcher_opts or matcher_mod.MatcherOptions(
        affine_est_offset=opts.affine_est_offset,
        affine_est_gain=opts.affine_est_gain)
    match = matcher_mod.find_matches_direct(
        ring.frames.pyramid, pyr_cur, cam, cam, T_cur_kf,
        c_px[cidx], c_f[cidx], depth_ref, c_grad[cidx],
        ft.is_edgelet(c_type[cidx]), c_level[cidx],
        px_init[cidx], c_ok, max_search_level, mopts, ref_kf=kf_c)
    matched = c_ok & match.success

    # ---- 4. compact to MAX_FTS slots ------------------------------------
    M = opts.max_n_features_per_frame
    sel_key = jnp.where(matched, ck, -jnp.inf)
    top_key, top_i = jax.lax.top_k(sel_key, min(M, MC))
    sel_ok = jnp.isfinite(top_key)

    # globally-optimized landmarks re-enter the frontend as FIXED_LANDMARK
    # (reference frame_handler_base.cpp:662-676): pose opt uses them, the
    # structure GN leaves their position to the global map
    out_type = jnp.where(is_fixed[cidx][top_i],
                         jnp.int32(ft.FeatureType.FIXED_LANDMARK),
                         c_type[cidx][top_i])
    has_lm_c = has_lm[cidx]
    # re-observed features: propagate type; converged seeds observed here
    # stay seeds until upgraded at the next keyframe
    f_new = proj.backproject(cam, match.px_cur)
    res = ReprojectResult(
        px=match.px_cur[top_i],
        f=f_new[top_i],
        grad=c_grad[cidx][top_i],
        level=match.search_level[top_i],
        ftype=jnp.where(sel_ok, out_type, jnp.int32(ft.FeatureType.INVALID)),
        landmark_id=jnp.where(sel_ok, c_lid[cidx][top_i], -1),
        seed_ref_kf=jnp.where(sel_ok & ~has_lm_c[top_i],
                              kf_c[top_i], -1),
        seed_ref_idx=jnp.where(sel_ok & ~has_lm_c[top_i],
                               ft_idx[cidx][top_i], -1),
        xyz_world=xyz_c[top_i],
        valid=sel_ok,
        n_matches=jnp.sum(matched.astype(jnp.int32)),
        n_trials=jnp.sum(cand.astype(jnp.int32)),
    )
    return res
