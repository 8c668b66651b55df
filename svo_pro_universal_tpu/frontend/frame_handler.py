"""Mono frontend pipeline: host state machine over jitted stage programs.

TPU-native replacement for the reference's frame handler stack
(reference: src/svo/src/frame_handler_base.cpp — addFrameBundle:200-550,
sparseImageAlignment:610-644, projectMapInFrame:646-744, optimizePose
:746-777, optimizeStructure:779-826, upgradeSeedsToFeatures:828-898,
needNewKf:1012-1121, tracking-quality monitor:991-1009;
frame_handler_mono.cpp — processFrame:120-253, processFirstFrame:64-117,
relocalizeFrame:254-279). Architecture inversion: the reference interleaves
host logic with per-feature loops and worker threads; here each frame runs
exactly TWO fused device programs (a tracking step, and a keyframe step when
promoted) while the host only flips the Stage enum and reads back a handful
of scalars.
"""

from __future__ import annotations

import enum
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.common import seed as seed_mod
from svo_pro_universal_tpu.common import types as ft
from svo_pro_universal_tpu.common.frame import FrameState, make_empty_frame
from svo_pro_universal_tpu.common.point import (
    LandmarkPool, add_observations, allocate, make_pool)
from svo_pro_universal_tpu.config import Config
from svo_pro_universal_tpu.frontend import initialization as init_mod
from svo_pro_universal_tpu.frontend import reprojector as repro_mod
from svo_pro_universal_tpu.frontend.map import (
    KeyframeRing, closest_keyframe_slot, eviction_slot,
    insert_keyframe, make_ring, overlap_mask)
from svo_pro_universal_tpu.ops import alignment as align_mod
from svo_pro_universal_tpu.ops import depth_filter as df_mod
from svo_pro_universal_tpu.ops import detector as det_mod
from svo_pro_universal_tpu.ops import matcher as matcher_mod
from svo_pro_universal_tpu.ops import pose_optimizer as po_mod
from svo_pro_universal_tpu.ops import sparse_img_align as sia_mod
from svo_pro_universal_tpu.ops import structure_optimizer as so_mod
from svo_pro_universal_tpu.ops.pyramid import build_pyramid, image_to_float
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp, se3_log


class Stage(enum.Enum):
    """reference: frame_handler_base.h:214-219."""
    PAUSED = 0
    FIRST_FRAME = 1
    INITIALIZING = 2
    TRACKING = 3
    RELOCALIZING = 4


class TrackingQuality(enum.Enum):
    INSUFFICIENT = 0
    BAD = 1
    GOOD = 2


class FrameResult(NamedTuple):
    """Host-visible per-frame output."""
    T_world_cam: np.ndarray      # 4×4
    stage: Stage
    n_tracked: int
    quality: TrackingQuality
    is_keyframe: bool


def _feature_world_points(frame: FrameState, ring: KeyframeRing,
                          pool: LandmarkPool
                          ) -> tuple[jax.Array, jax.Array]:
    """Fresh 3D point per feature: landmark pool if linked, else the live
    seed state in its ref keyframe (reference: pose_optimizer.cpp:124-136
    re-derives positions the same way). Returns (xyz_world [N,3], ok [N])."""
    lid = frame.landmark_id
    has_lm = (lid >= 0) & pool.valid[jnp.clip(lid, 0, pool.capacity - 1)]
    lm_pos = pool.pos[jnp.clip(lid, 0, pool.capacity - 1)]

    kf = jnp.clip(frame.seed_ref_kf, 0, ring.capacity - 1)
    fidx = jnp.clip(frame.seed_ref_idx, 0, frame.max_fts - 1)
    has_seed = (frame.seed_ref_kf >= 0) & ring.valid[kf]
    seed_state = ring.frames.seed_state[kf, fidx]
    seed_f = ring.frames.f[kf, fidx]
    depth = 1.0 / jnp.maximum(seed_state[:, 0], 1e-12)
    T_world_kf = jax.tree.map(lambda x: x[kf], ring.frames.T_cam_world
                              ).inverse()
    seed_pos = T_world_kf.apply(seed_f * depth[:, None])
    xyz = jnp.where(has_lm[:, None], lm_pos, seed_pos)
    return xyz, has_lm | has_seed


class FrameHandlerMono:
    """Host driver. Mirrors svo::FrameHandlerMono + the Odometry facade
    (reference: svo_factory.h:83-129)."""

    def __init__(self, cfg: Config, cam: proj.Camera,
                 T_cam_body: Optional[SE3] = None, seed: int = 0,
                 imu_handler=None):
        self.cfg = cfg
        self.cam = cam
        self.T_cam_body = T_cam_body or SE3.identity()
        self.stage = Stage.FIRST_FRAME
        self.rng_key = jax.random.PRNGKey(seed)
        # optional IMU (reference: FrameHandlerBase + ImuHandler wiring,
        # svo_factory.cpp:359-387 _set_imu_prior)
        self.imu = imu_handler
        # lazy: a device→host read permanently degrades the axon tunnel's
        # dispatch latency, so don't pay it unless the IMU path needs it
        self._R_cam_body_np_cache: Optional[np.ndarray] = None
        self._last_ts: Optional[float] = None

        cap = cfg.capacity
        self.n_levels = max(cfg.n_pyr_levels, cfg.img_align.max_level + 1)
        self.max_fts = cap.max_fts
        cs = cfg.detector.cell_size
        self.n_cols = -(-cam.width // cs)
        self.n_rows = -(-cam.height // cs)
        self.n_cells = self.n_cols * self.n_rows

        # device state
        template = make_empty_frame(
            build_pyramid(jnp.zeros((cam.height, cam.width), jnp.float32),
                          self.n_levels), self.max_fts,
            T_cam_body=self.T_cam_body)
        self.ring = make_ring(template, cap.max_kfs)
        self.pool = make_pool(cap.max_points, cap.max_obs_per_point)
        self.last_frame: Optional[FrameState] = None
        self.T_rel_prev = SE3.identity()     # constant-velocity model
        self.frames_since_kf = 0
        self.frame_count = 0
        self.reloc_trials = 0
        self.depth_median = float(cfg.init.expected_avg_depth)
        self.depth_min = self.depth_median * 0.1
        # first-keyframe tracking state (initialization)
        self._init_ref_px = None

        self._jit_tracking = jax.jit(self._tracking_step)
        self._jit_keyframe = jax.jit(self._keyframe_step)
        self._jit_detect = jax.jit(self._detect_into_frame)
        self._jit_klt = jax.jit(self._klt_track)
        self._jit_frame = jax.jit(self._frame_program)

        self.stats = {}
        self._depth_state = jnp.asarray(
            [self.depth_median, self.depth_min], jnp.float32)

    # ------------------------------------------------------------------
    # jitted stage programs
    # ------------------------------------------------------------------
    def _extra_align_inputs(self, ring, pool, last_frame, extra):
        """Secondary-camera CameraInputs for JOINT multi-camera alignment
        (reference: the bundle loop in sparse_img_align.cpp:265-318 runs
        over every frame of the FrameBundle). Mono: none. Stereo/Array
        override this to project the primary features into each secondary
        camera and align against its photometry too."""
        return []

    def _stage_align(self, ring, pool, last_frame, cur_pyramid, T_prior_rel,
                     extra=None):
        """Stage 1: sparse image alignment vs the last frame (reference:
        sparseImageAlignment frame_handler_base.cpp:610-644), jointly over
        all rig cameras when `extra` supplies their pyramids.
        Returns (T_cur_world, align_stats)."""
        cfg = self.cfg
        xyz_w, has_pt = _feature_world_points(last_frame, ring, pool)
        last_pos = last_frame.T_world_cam.t
        depth_ref = jnp.linalg.norm(xyz_w - last_pos[None], axis=-1)
        valid_align = last_frame.valid_mask() & has_pt
        inp = sia_mod.CameraInput(
            pyr_ref=last_frame.pyramid, pyr_cur=cur_pyramid,
            px_ref=last_frame.px, f_ref=last_frame.f, depth_ref=depth_ref,
            valid=valid_align, T_cam_body=self.T_cam_body, cam=self.cam)
        inputs = [inp] + self._extra_align_inputs(ring, pool, last_frame,
                                                  extra)
        opts = sia_mod.SparseImgAlignOptions(
            max_level=cfg.img_align.max_level,
            min_level=cfg.img_align.min_level,
            estimate_alpha=cfg.img_align.estimate_illumination_gain,
            estimate_beta=cfg.img_align.estimate_illumination_offset,
            prior_lambda_rot=cfg.base.img_align_prior_lambda_rot,
            prior_lambda_trans=cfg.base.img_align_prior_lambda_trans,
            max_iter=cfg.img_align.max_iter)
        # init from constant-velocity prior (body frame)
        T_body_cam = self.T_cam_body.inverse()
        T_prior_body = (T_body_cam.compose(T_prior_rel)
                        .compose(self.T_cam_body))
        st0 = sia_mod.AlignState(T_prior_body, jnp.asarray(0.0),
                                 jnp.asarray(0.0))
        align_state, align_stats = sia_mod.run(
            inputs, st0, opts,
            T_prior=T_prior_body if (cfg.base.img_align_prior_lambda_rot > 0
                                     ) else None)
        T_cur_world = (self.T_cam_body.compose(align_state.T_icur_iref)
                       .compose(T_body_cam)
                       .compose(last_frame.T_cam_world))
        return T_cur_world, align_stats

    def _stage_reproject(self, ring, pool, cur_frame, T_cur_world, ov):
        """Stage 2: reproject map landmarks/seeds + patch-align matches
        (reference: projectMapInFrame :646-744). Returns (frame, rep)."""
        cfg = self.cfg
        rep = repro_mod.reproject(
            ring, pool, T_cur_world, cur_frame.pyramid, self.cam, ov,
            jnp.zeros((self.n_cells,), bool), self.n_cols, self.n_rows,
            max_search_level=cfg.detector.max_level,
            opts=repro_mod.ReprojectorOptions(
                max_n_kfs=cfg.reprojector.max_n_kfs,
                max_n_features_per_frame=min(
                    cfg.reprojector.max_n_features_per_frame, self.max_fts),
                cell_size=cfg.reprojector.cell_size,
                reproject_unconverged_seeds=(
                    cfg.reprojector.reproject_unconverged_seeds),
                affine_est_offset=cfg.reprojector.affine_est_offset,
                affine_est_gain=cfg.reprojector.affine_est_gain))

        # write reprojected features into the frame store
        m = rep.px.shape[0]
        frame = cur_frame._replace(
            T_cam_world=T_cur_world,
            px=cur_frame.px.at[:m].set(rep.px),
            f=cur_frame.f.at[:m].set(rep.f),
            grad=cur_frame.grad.at[:m].set(rep.grad),
            level=cur_frame.level.at[:m].set(rep.level),
            ftype=cur_frame.ftype.at[:m].set(rep.ftype),
            landmark_id=cur_frame.landmark_id.at[:m].set(rep.landmark_id),
            seed_ref_kf=cur_frame.seed_ref_kf.at[:m].set(rep.seed_ref_kf),
            seed_ref_idx=cur_frame.seed_ref_idx.at[:m].set(rep.seed_ref_idx),
        )
        return frame, rep

    def _stage_pose(self, ring, pool, frame):
        """Stage 3: motion-only pose refinement (reference: optimizePose
        :746-777). Returns (frame, po_res, xyz_cur, has_cur)."""
        cfg = self.cfg
        xyz_cur, has_cur = _feature_world_points(frame, ring, pool)
        fs = po_mod.PoseOptFeatures(
            xyz_world=xyz_cur, f=frame.f, grad=frame.grad,
            level=frame.level, is_edgelet=ft.is_edgelet(frame.ftype),
            valid=frame.valid_mask() & has_cur,
            T_cam_body=self.T_cam_body, cam=self.cam)
        T_body_world = self.T_cam_body.inverse().compose(frame.T_cam_world)
        po_res = po_mod.optimize_pose(
            [fs], T_body_world,
            po_mod.PoseOptOptions(
                reproj_thresh_px=cfg.base.poseoptim_thresh,
                prior_lambda=cfg.base.poseoptim_prior_lambda))
        T_cur_world = self.T_cam_body.compose(po_res.T_body_world)
        outlier = frame.valid_mask() & has_cur & ~po_res.inlier[0]
        frame = frame._replace(
            T_cam_world=T_cur_world,
            ftype=jnp.where(outlier, jnp.int32(ft.FeatureType.OUTLIER),
                            frame.ftype))
        return frame, po_res, xyz_cur, has_cur

    def _stage_structure(self, ring, pool, frame):
        """Stage 4: per-point structure GN (reference: optimizeStructure
        :779-826 + Point::optimize point.h:155). Returns pool."""
        lid = frame.landmark_id
        has_lm = (lid >= 0) & frame.valid_mask()
        lidc = jnp.clip(lid, 0, pool.capacity - 1)
        obs_kf = pool.obs_kf[lidc]                     # [N, O]
        obs_idx = pool.obs_idx[lidc]
        okf = jnp.clip(obs_kf, 0, ring.capacity - 1)
        oidx = jnp.clip(obs_idx, 0, self.max_fts - 1)
        f_obs = ring.frames.f[okf, oidx]               # [N, O, 3]
        T_obs = jax.tree.map(lambda x: x[okf], ring.frames.T_cam_world)
        obs_ok = (obs_kf >= 0) & ring.valid[okf]
        # a point needs ≥2 live observations to be re-triangulable; fixed
        # (globally-optimized) landmarks are owned by the global map and
        # skipped here (reference: FIXED_LANDMARK never enters Point GN)
        enough = jnp.sum(obs_ok.astype(jnp.int32), axis=-1) >= 2
        # PARALLAX gate: re-triangulating from near-zero-baseline pairs
        # replaces a converged depth-filter estimate with a noise-
        # dominated solve whose 5-iteration asymmetry (near solutions
        # reached, far ones not) systematically shrinks the map —
        # measured r5: −1.5%/frame once keyframes churn. Only optimize
        # points whose observation set spans ≥8% baseline-to-depth.
        cam_pos = jax.tree.map(lambda x: x, T_obs).inverse().t  # [N,O,3]
        X = pool.pos[lidc]
        depth_o = jnp.maximum(jnp.linalg.norm(
            X[:, None, :] - cam_pos, axis=-1), 1e-6)
        pdist = jnp.linalg.norm(
            cam_pos[:, :, None, :] - cam_pos[:, None, :, :], axis=-1)
        pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
        max_base = jnp.max(jnp.where(pair_ok, pdist, 0.0), axis=(1, 2))
        parallax_ok = max_base > 0.08 * jnp.min(
            jnp.where(obs_ok, depth_o, jnp.inf), axis=-1)
        cand = has_lm & enough & parallax_ok & ~pool.fixed[lidc]
        # the reference optimizes only the `max_n_pts` LONGEST-UNOPTIMIZED
        # points per frame (optimizeStructure frame_handler_base.cpp:779,
        # default 20) — re-solving every landmark every frame amplified a
        # creation-time depth bias into a compounding map-scale drift
        # (measured r5: −1.5%/frame at high keyframe churn)
        max_pts = int(getattr(self, "_structure_max_pts",
                              getattr(self.cfg.base,
                                      "structure_optimization_max_pts",
                                      20)))
        n = lidc.shape[0]
        if max_pts <= 0:
            chosen = jnp.zeros((n,), bool)
        elif max_pts < n:
            age = pool.last_structure_optim[lidc].astype(jnp.float32)
            pri = jnp.where(cand, -age, -jnp.inf)
            _, sel_rows = jax.lax.top_k(pri, max_pts)
            chosen = jnp.zeros((n,), bool).at[sel_rows].set(
                True, mode="drop") & cand
        else:
            chosen = cand
        so_res = so_mod.optimize_points(
            pool.pos[lidc], f_obs, T_obs, obs_ok, chosen, n_iter=5)
        widx = jnp.where(chosen, lidc, pool.capacity)
        now_i = (frame.timestamp * 1000.0).astype(jnp.int32)
        new_pos = pool.pos.at[widx].set(so_res.xyz, mode="drop")
        return pool._replace(
            pos=new_pos,
            last_structure_optim=pool.last_structure_optim.at[widx].set(
                now_i, mode="drop"))

    def _stage_seeds(self, ring, cur_pyramid, T_cur_world, depth_scalars,
                     ov):
        """Stage 5: depth-filter update of the ring's seeds (reference:
        DepthFilter::updateSeeds depth_filter.cpp:200-366).
        Returns (ring, upd).

        COMPACTED: gathers on TPU read whole tiles, so the epipolar scan
        must only run for live seeds, not all K·F padded slots. The most
        uncertain seeds go first (fastest convergence per byte)."""
        cfg = self.cfg
        K, F = ring.capacity, self.max_fts
        NC = K * F
        MS = min(self.cfg.capacity.max_seed_updates, NC)

        def rflat(x):
            return x.reshape((NC,) + x.shape[2:])

        kf_idx = jnp.repeat(jnp.arange(K, dtype=jnp.int32), F)
        # only SELF-ANCHORED seeds (seed_ref_kf < 0) own a live seed state;
        # reprojected seed observations carry a reference, not a state
        owned = rflat(ring.frames.seed_ref_kf) < 0
        r_ftype = rflat(ring.frames.ftype)
        r_seed = rflat(ring.frames.seed_state)
        active = ((ov & ring.valid)[kf_idx] & owned
                  & ft.is_unconverged_seed(r_ftype))
        score = jnp.where(active, 1.0 + jnp.clip(r_seed[:, 1], 0.0, 1e3),
                          -jnp.inf)
        _, sidx = jax.lax.top_k(score, MS)
        s_ok = active[sidx]

        kf_s = kf_idx[sidx]
        T_kf_world = jax.tree.map(lambda x: x[kf_s],
                                  ring.frames.T_cam_world)
        T_cur_kf = T_cur_world.compose(T_kf_world.inverse())

        mu_range = 1.0 / depth_scalars[1]
        upd = df_mod.update_seeds(
            ring.frames.pyramid, cur_pyramid, self.cam, self.cam, T_cur_kf,
            rflat(ring.frames.px)[sidx], rflat(ring.frames.f)[sidx],
            rflat(ring.frames.grad)[sidx], rflat(ring.frames.level)[sidx],
            jnp.where(s_ok, r_ftype[sidx],
                      jnp.int32(ft.FeatureType.INVALID)),
            r_seed[sidx], mu_range,
            max_search_level=cfg.depth_filter.max_search_level,
            sigma2_convergence_threshold=(
                cfg.depth_filter.seed_convergence_sigma2_thresh),
            matcher_opts=matcher_mod.MatcherOptions(
                max_epi_search_steps=self.cfg.capacity.epi_samples),
            ref_kf=kf_s)
        widx = jnp.where(s_ok, sidx, NC)
        new_seed_state = r_seed.at[widx].set(
            upd.seed_state, mode="drop").reshape(K, F, 4)
        new_ftype = r_ftype.at[widx].set(
            upd.ftype, mode="drop").reshape(K, F)
        ring = ring._replace(frames=ring.frames._replace(
            seed_state=new_seed_state, ftype=new_ftype))
        return ring, upd

    def _stage_kf_policy(self, ring, pool, frame, ov):
        """Keyframe-policy signals (reference needNewKf :1012-1121), device.
        Returns dict(med_disparity, kf_too_close)."""
        # (a) median px disparity of landmarks co-observed with the last KF
        last_kf = jnp.clip(ring.last_added, 0, ring.capacity - 1)
        kf_lid = ring.frames.landmark_id[last_kf]
        kf_px = ring.frames.px[last_kf]
        P = pool.capacity
        lid2idx = jnp.full((P + 1,), -1, jnp.int32).at[
            jnp.where(kf_lid >= 0, kf_lid, P)].set(
            jnp.arange(self.max_fts, dtype=jnp.int32), mode="drop")
        cur_lid = jnp.clip(frame.landmark_id, 0, P - 1)
        co = lid2idx[jnp.where(frame.landmark_id >= 0, cur_lid, P)]
        co_ok = (co >= 0) & frame.valid_mask()
        disp = jnp.linalg.norm(
            frame.px - kf_px[jnp.clip(co, 0, self.max_fts - 1)], axis=-1)
        from svo_pro_universal_tpu.utils.robust import masked_median
        med_disparity = masked_median(disp, co_ok)
        # (b) nearest visible KF within both angle and metric distance
        kf_rel_t = jnp.linalg.norm(
            frame.T_world_cam.t[None] -
            ring.frames.T_cam_world.inverse().t, axis=-1)
        dq = jax.vmap(lambda q: se3_log(
            SE3(q, jnp.zeros(3)).inverse().compose(
                SE3(frame.T_cam_world.q, jnp.zeros(3)))))(
            ring.frames.T_cam_world.q)
        kf_ang = jnp.linalg.norm(dq[:, 3:], axis=-1)
        close = (ov & ring.valid
                 & (kf_ang < jnp.deg2rad(self.cfg.base.kfselect_min_angle))
                 & (kf_rel_t < self.cfg.base.kfselect_min_dist_metric))
        return dict(med_disparity=med_disparity,
                    kf_too_close=jnp.any(close))

    def _tracking_step(self, ring, pool, last_frame, cur_frame, T_prior_rel,
                       depth_scalars, extra=None):
        """Sparse align → reproject → pose opt → structure opt → seed
        update. One fused device program per tracked frame, composed from
        the named stage methods above (which utils/stage_profile.py times
        individually). `extra` carries secondary-camera pyramids for
        joint multi-camera alignment (stereo/array handlers)."""
        cfg = self.cfg

        # ---- 1. sparse image alignment (vs last frame) ----------------
        T_cur_world, align_stats = self._stage_align(
            ring, pool, last_frame, cur_frame.pyramid, T_prior_rel, extra)

        # ---- 2. reproject map -----------------------------------------
        ov = overlap_mask(ring, T_cur_world, cfg.reprojector.max_n_kfs)
        frame, rep = self._stage_reproject(ring, pool, cur_frame,
                                           T_cur_world, ov)

        # ---- 3. pose refinement ---------------------------------------
        frame, po_res, xyz_cur, has_cur = self._stage_pose(ring, pool, frame)
        T_cur_world = frame.T_cam_world

        # ---- 4. structure refinement ----------------------------------
        pool = self._stage_structure(ring, pool, frame)

        # ---- 5. depth-filter update of ring seeds ---------------------
        ring, upd = self._stage_seeds(ring, cur_frame.pyramid, T_cur_world,
                                      depth_scalars, ov)

        # ---- stats -----------------------------------------------------
        n_tracked = jnp.sum((frame.valid_mask()
                             & (frame.landmark_id >= 0)).astype(jnp.int32))
        n_total = frame.num_valid()
        # scene depth for keyframe policy
        z_med, z_min, _ = _scene_depth(frame, xyz_cur,
                                       frame.valid_mask() & has_cur)
        policy = self._stage_kf_policy(ring, pool, frame, ov)

        stats = dict(
            med_disparity=policy["med_disparity"],
            kf_too_close=policy["kf_too_close"],
            n_tracked=n_tracked, n_total=n_total,
            align_chi2=align_stats.chi2, align_fts=align_stats.n_tracked,
            reproj_matches=rep.n_matches, reproj_trials=rep.n_trials,
            pose_err_before=po_res.error_before_px,
            pose_err_after=po_res.error_after_px,
            n_inliers=po_res.n_inliers,
            seeds_updated=upd.n_updated, seeds_converged=upd.n_converged,
            depth_median=z_med, depth_min=z_min)
        return ring, pool, frame, stats

    def _keyframe_step(self, ring, pool, frame, key, depth_scalars):
        """Upgrade converged seeds to landmarks, detect new seeds, insert
        the keyframe (reference: upgradeSeedsToFeatures
        frame_handler_base.cpp:828-898 + FrameHandlerMono::makeKeyframe
        frame_handler_mono.cpp:186-250)."""
        cfg = self.cfg
        cam = self.cam
        # ---- upgrade: features referencing converged ring seeds -------
        kf = jnp.clip(frame.seed_ref_kf, 0, ring.capacity - 1)
        fidx = jnp.clip(frame.seed_ref_idx, 0, self.max_fts - 1)
        has_seed = (frame.seed_ref_kf >= 0) & ring.valid[kf] \
            & frame.valid_mask() & (frame.landmark_id < 0)
        seed_type = ring.frames.ftype[kf, fidx]
        seed_state = ring.frames.seed_state[kf, fidx]
        converged = (ft.is_converged_seed(seed_type) & has_seed
                     & (seed_state[:, 0] > 1e-6)      # sane inverse depth
                     & (seed_state[:, 1] > 0.0))
        seed_f = ring.frames.f[kf, fidx]
        depth = 1.0 / jnp.maximum(seed_state[:, 0], 1e-12)
        T_world_kf = jax.tree.map(lambda x: x[kf],
                                  ring.frames.T_cam_world).inverse()
        xyz_w = T_world_kf.apply(seed_f * depth[:, None])

        pool, slots = allocate(pool, xyz_w, converged)
        # observations: the anchor keyframe and this new keyframe
        new_slot = eviction_slot(ring, frame.T_world_cam.t)
        # evicting a ring slot invalidates every pool observation that
        # references it — stale rows would rebind to the NEW keyframe's
        # pose/bearings and poison the structure GN (see
        # point.invalidate_keyframe_observations)
        from svo_pro_universal_tpu.common.point import \
            invalidate_keyframe_observations
        pool = invalidate_keyframe_observations(pool, new_slot,
                                                ring.valid[new_slot])
        # RE-observed landmarks register this keyframe too (reference:
        # frame_handler_base.cpp upgradeSeedsToFeatures/addObservation —
        # every keyframe feature with a landmark adds an observation).
        # Without this, each landmark kept only its 2 creation-time
        # observations forever and the structure GN never gained the
        # wide-baseline multi-view support that conditions it.
        reobs = frame.valid_mask() & (frame.landmark_id >= 0)
        pool = add_observations(
            pool, jnp.clip(frame.landmark_id, 0, pool.capacity - 1),
            jnp.broadcast_to(new_slot, frame.landmark_id.shape),
            jnp.arange(self.max_fts, dtype=jnp.int32), reobs,
            protect_first=2)
        pool = add_observations(pool, slots, frame.seed_ref_kf, fidx,
                                converged)
        pool = add_observations(
            pool, slots, jnp.broadcast_to(new_slot, slots.shape),
            jnp.arange(self.max_fts, dtype=jnp.int32), converged)

        # set landmark ids in this frame + flip type seed→landmark
        frame = frame._replace(
            landmark_id=jnp.where(converged, slots, frame.landmark_id),
            ftype=jnp.where(converged,
                            ft.seed_to_landmark_type(frame.ftype),
                            frame.ftype))
        # anchor keyframe entries flip to landmark too (stops re-seeding)
        anchor_lid = ring.frames.landmark_id.at[
            jnp.where(converged, kf, ring.capacity),
            jnp.where(converged, fidx, 0)].set(slots, mode="drop")
        anchor_type = ring.frames.ftype.at[
            jnp.where(converged, kf, ring.capacity),
            jnp.where(converged, fidx, 0)].set(
            ft.seed_to_landmark_type(seed_type), mode="drop")
        ring = ring._replace(frames=ring.frames._replace(
            landmark_id=anchor_lid, ftype=anchor_type))

        # ---- detect new features in free cells ------------------------
        frame, n_new = self._detect_into_frame(frame, key, depth_scalars)

        # ---- insert into ring -----------------------------------------
        frame = frame._replace(is_keyframe=jnp.asarray(True))
        ring = insert_keyframe(ring, frame, new_slot)
        n_upgraded = jnp.sum(converged.astype(jnp.int32))
        return ring, pool, frame, n_upgraded, n_new

    def _detect_into_frame(self, frame: FrameState, key, depth_scalars):
        """Fill free feature slots with fresh detections + seed states
        (reference: DepthFilter::addKeyframe → initializeSeeds
        depth_filter.cpp:89-143,300-365)."""
        cfg = self.cfg
        occupied = jnp.zeros((self.n_cells,), bool)
        px = frame.px
        cs = cfg.detector.cell_size
        cx = jnp.clip((px[:, 0] // cs).astype(jnp.int32), 0, self.n_cols - 1)
        cy = jnp.clip((px[:, 1] // cs).astype(jnp.int32), 0, self.n_rows - 1)
        cell = cy * self.n_cols + cx
        occupied = occupied.at[jnp.where(frame.valid_mask(), cell,
                                         self.n_cells)].set(True, mode="drop")
        det = det_mod.detect_features(
            frame.pyramid, occupied, cs, self.n_cols, self.n_rows,
            max_features=self.max_fts,
            threshold_primary=cfg.detector.threshold_primary,
            threshold_secondary=cfg.detector.threshold_secondary,
            threshold_shitomasi=cfg.detector.threshold_shitomasi,
            min_level=0, max_level=cfg.detector.max_level,
            detector_type=cfg.detector.detector_type)

        # free slots: invalid entries of the frame store
        free = ~frame.valid_mask()
        order = jnp.argsort(~free)          # free slots first, stable
        n_det = det.px.shape[0]
        det_slot = order[jnp.arange(n_det)]
        can_place = det.valid & (jnp.arange(n_det)
                                 < jnp.sum(free.astype(jnp.int32)))
        widx = jnp.where(can_place, det_slot, frame.max_fts)

        f_new = proj.backproject(self.cam, det.px)
        depth_mean, depth_min = depth_scalars[0], depth_scalars[1]
        seeds = seed_mod.make(jnp.full((n_det,), 1.0) * depth_mean,
                              jnp.full((n_det,), 1.0) * depth_min)

        frame = frame._replace(
            px=frame.px.at[widx].set(det.px, mode="drop"),
            f=frame.f.at[widx].set(f_new, mode="drop"),
            grad=frame.grad.at[widx].set(det.grad, mode="drop"),
            score=frame.score.at[widx].set(det.score, mode="drop"),
            level=frame.level.at[widx].set(det.level, mode="drop"),
            ftype=frame.ftype.at[widx].set(det.ftype, mode="drop"),
            landmark_id=frame.landmark_id.at[widx].set(-1, mode="drop"),
            seed_ref_kf=frame.seed_ref_kf.at[widx].set(-1, mode="drop"),
            seed_ref_idx=frame.seed_ref_idx.at[widx].set(-1, mode="drop"),
            seed_state=frame.seed_state.at[widx].set(seeds, mode="drop"),
            seed_mu_range=1.0 / depth_min,
        )
        # self-reference: a keyframe's seeds live in its own slots
        return frame, jnp.sum(can_place.astype(jnp.int32))

    # order of the scalar stats vector returned by _frame_program
    STATS_KEYS = (
        "n_tracked", "n_total", "align_chi2", "align_fts",
        "reproj_matches", "reproj_trials", "pose_err_before",
        "pose_err_after", "n_inliers", "seeds_updated", "seeds_converged",
        "depth_median", "depth_min", "med_disparity", "kf_too_close",
        "is_kf", "kf_upgraded", "kf_new_seeds")

    def _frame_program(self, ring, pool, last_frame, img, timestamp,
                       T_prior_rel, depth_scalars, frames_since_kf, key,
                       extra=None):
        """ONE device program per tracked frame: pyramid → tracking step →
        on-device keyframe decision → conditional keyframe step. The host
        reads back a single stats vector + the pose — the dispatch-latency
        answer to the reference's multi-stage per-frame call tree."""
        pyr = build_pyramid(image_to_float(img), self.n_levels)
        cur = make_empty_frame(pyr, self.max_fts,
                               T_cam_body=self.T_cam_body,
                               timestamp=timestamp)
        ring, pool, frame, stats = self._tracking_step(
            ring, pool, last_frame, cur, T_prior_rel, depth_scalars, extra)

        # --- keyframe decision on device (reference needNewKf gates) ----
        cfgb = self.cfg.base
        n_tracked = stats["n_tracked"]
        med_disp = stats["med_disparity"]
        is_kf = jnp.asarray(True)
        is_kf &= n_tracked <= cfgb.kfselect_numkfs_upper_thresh
        is_kf &= frames_since_kf >= cfgb.kfselect_min_num_frames_between_kfs
        need_more = n_tracked < cfgb.kfselect_numkfs_lower_thresh
        gates = jnp.asarray(True)
        if cfgb.kfselect_min_disparity > 0:
            gates &= ~(jnp.isfinite(med_disp)
                       & (med_disp < cfgb.kfselect_min_disparity))
        gates &= ~stats["kf_too_close"]
        is_kf &= (need_more | gates)
        # no keyframes while tracking quality is insufficient
        quality_ok = n_tracked >= cfgb.quality_min_fts
        is_kf &= quality_ok

        def kf_branch(args):
            ring_, pool_, frame_ = args
            return self._keyframe_step(ring_, pool_, frame_, key,
                                       depth_scalars)

        def no_branch(args):
            ring_, pool_, frame_ = args
            return (ring_, pool_, frame_, jnp.asarray(0, jnp.int32),
                    jnp.asarray(0, jnp.int32))

        ring, pool, frame, n_up, n_new = jax.lax.cond(
            is_kf, kf_branch, no_branch, (ring, pool, frame))

        T_rel = frame.T_cam_world.compose(last_frame.T_cam_world.inverse())
        dm, dmin = stats["depth_median"], stats["depth_min"]
        dm_ok = jnp.isfinite(dm) & (dm > 1e-3) & (dm < 1e6)
        new_depth = jnp.where(
            dm_ok, jnp.stack([dm, jnp.maximum(0.5 * dmin, 1e-3)]),
            depth_scalars)

        stats = dict(stats)
        stats["is_kf"] = is_kf
        stats["kf_upgraded"] = n_up
        stats["kf_new_seeds"] = n_new
        stats_vec = jnp.stack([
            jnp.asarray(stats[k], jnp.float32) for k in self.STATS_KEYS])
        pose = frame.T_world_cam.as_matrix()
        return ring, pool, frame, T_rel, new_depth, stats_vec, pose

    def _klt_track(self, ref_frame, cur_pyramid, px_ref, valid,
                   px_init=None):
        """Pyramidal KLT with a bidirectional consistency check: a track
        must map back to its ref position within 1px (kills occlusion and
        repetitive-texture lock-ons that a one-way track can't see).

        ``px_init``: initial guess in the current image — the previous
        frame's track positions during initialization (the reference's
        FeatureTracker is incremental the same way, feature_tracker.cpp
        :52-84; re-searching from the ref position every frame measurably
        collapsed track survival once the baseline grew past ~4 frames)."""
        tr = self.cfg.tracker
        max_level = min(tr.klt_max_level, self.n_levels - 1)
        sizes = [tr.klt_patch_size] * (max_level + 1)
        fwd = align_mod.align_pyr_2d(
            ref_frame.pyramid, cur_pyramid, px_ref,
            px_ref if px_init is None else px_init,
            max_level=max_level, min_level=tr.klt_min_level,
            patch_sizes=sizes, n_iter=tr.klt_max_iter, valid=valid)
        bwd = align_mod.align_pyr_2d(
            cur_pyramid, ref_frame.pyramid, fwd.px, fwd.px,
            max_level=max_level, min_level=tr.klt_min_level,
            patch_sizes=sizes, n_iter=tr.klt_max_iter,
            valid=valid & fwd.converged)
        roundtrip = jnp.linalg.norm(bwd.px - px_ref, axis=-1)
        ok = valid & fwd.converged & bwd.converged & (roundtrip < 1.0)
        return fwd.px, ok

    @property
    def _R_cam_body_np(self) -> np.ndarray:
        if self._R_cam_body_np_cache is None:
            self._R_cam_body_np_cache = np.asarray(
                jax.device_get(self.T_cam_body.rotation_matrix()))
        return self._R_cam_body_np_cache

    # ------------------------------------------------------------------
    # host state machine
    # ------------------------------------------------------------------
    def _make_frame(self, img, timestamp: float) -> FrameState:
        pyr = build_pyramid(image_to_float(img), self.n_levels)
        frame = make_empty_frame(pyr, self.max_fts,
                                 T_cam_body=self.T_cam_body,
                                 frame_id=self.frame_count,
                                 timestamp=timestamp)
        return frame

    def add_imu_measurement(self, t: float, gyro, acc) -> None:
        """reference: Odometry::addImuMeasurement svo_factory.cpp:401-414."""
        if self.imu is not None:
            self.imu.add_measurement(t, gyro, acc)

    def _motion_prior(self, timestamp: float) -> SE3:
        """Constant-velocity translation + (if IMU) gyro rotation prior
        (reference: getMotionPrior frame_handler_base.cpp:313-360)."""
        if self.imu is None or self._last_ts is None:
            return self.T_rel_prev
        R = self.imu.relative_rotation_prior_np(
            self._last_ts, timestamp, self._R_cam_body_np)
        from svo_pro_universal_tpu.utils.transform import matrix_to_quat
        q = matrix_to_quat(jnp.asarray(R, jnp.float32))
        return SE3(q, self.T_rel_prev.t)

    def add_image(self, img, timestamp: float) -> FrameResult:
        self.frame_count += 1
        if self.stage == Stage.TRACKING:
            res = self._process_tracking(img, timestamp)
            self._last_ts = timestamp
            return res
        frame = self._make_frame(img, timestamp)
        if self.stage == Stage.FIRST_FRAME:
            out = self._process_first_frame(frame)
        elif self.stage == Stage.INITIALIZING:
            out = self._process_init(frame)
        else:
            out = self._process_reloc(frame)
        self._last_ts = timestamp
        return out

    def _depth_scalars(self):
        return jnp.asarray([self.depth_median, self.depth_min], jnp.float32)

    def _result(self, frame: FrameState, n_tracked=0,
                quality=TrackingQuality.GOOD, is_kf=False) -> FrameResult:
        T = np.asarray(frame.T_world_cam.as_matrix())
        return FrameResult(T, self.stage, int(n_tracked), quality, is_kf)

    def _process_first_frame(self, frame: FrameState) -> FrameResult:
        self.rng_key, k = jax.random.split(self.rng_key)
        frame, n_new = self._jit_detect(frame, k, self._depth_scalars())
        if int(n_new) < self.cfg.init.init_min_features:
            return self._result(frame, 0, TrackingQuality.INSUFFICIENT)
        frame = frame._replace(is_keyframe=jnp.asarray(True))

        if self.cfg.init.init_method == "OneShot":
            # every feature becomes a landmark at the expected depth
            # (reference: OneShotInit initialization.cpp — constant-depth
            # bootstrap for downward-looking drones at known height)
            valid = frame.valid_mask()
            depth = jnp.asarray(self.cfg.init.expected_avg_depth,
                                jnp.float32)
            pts_w = frame.T_world_cam.apply(frame.f * depth)
            self.pool, slots = allocate(self.pool, pts_w, valid)
            self.pool = add_observations(
                self.pool, slots, jnp.zeros_like(slots),
                jnp.arange(self.max_fts, dtype=jnp.int32), valid)
            frame = frame._replace(
                landmark_id=jnp.where(valid, slots, -1),
                ftype=jnp.where(valid, jnp.int32(ft.FeatureType.CORNER),
                                frame.ftype))
            self.ring = insert_keyframe(self.ring, frame, jnp.asarray(0))
            self.last_frame = frame
            self.T_rel_prev = SE3.identity()
            self.frames_since_kf = 0
            self.stage = Stage.TRACKING
            return self._result(frame, int(n_new), is_kf=True)

        self.ring = insert_keyframe(self.ring, frame, jnp.asarray(0))
        self.last_frame = frame
        self._init_ref_frame = frame
        self._init_ref_px = frame.px
        self._init_ref_valid = frame.valid_mask()
        self._init_px_guess = frame.px       # incremental KLT guesses
        self.stage = Stage.INITIALIZING
        return self._result(frame, int(n_new), is_kf=True)

    def _process_init(self, frame: FrameState) -> FrameResult:
        cfg = self.cfg
        ref = self._init_ref_frame
        px_cur, ok = self._jit_klt(ref, frame.pyramid, self._init_ref_px,
                                   self._init_ref_valid,
                                   self._init_px_guess)
        # failed tracks keep their last good guess (they may reconverge;
        # the bidirectional check kills wrong lock-ons)
        self._init_px_guess = jnp.where(ok[:, None], px_cur,
                                        self._init_px_guess)
        n_ok = int(jnp.sum(ok.astype(jnp.int32)))
        if n_ok < cfg.init.init_min_tracked:
            # lost too many tracks → restart initialization
            self.stage = Stage.FIRST_FRAME
            self.ring = jax.tree.map(jnp.zeros_like, self.ring)
            return self._result(frame, n_ok, TrackingQuality.INSUFFICIENT)

        disp = float(init_mod.disparity(self._init_ref_px, px_cur, ok))
        if disp < cfg.init.init_min_disparity:
            self.last_frame = frame
            return self._result(frame, n_ok)

        f_cur = proj.backproject(self.cam, px_cur)
        self.rng_key, k = jax.random.split(self.rng_key)
        res = init_mod.ransac_relative_pose(
            ref.f, f_cur, ok, k, self.cam.focal_length,
            reproj_thresh_px=cfg.init.reproj_error_thresh)
        if int(res.n_inliers) < cfg.init.init_min_inliers:
            self.last_frame = frame
            return self._result(frame, n_ok, TrackingQuality.INSUFFICIENT)

        T_cur_ref, depths, scale = init_mod.rescale_to_mean_depth(
            res.T_cur_ref, res.depth_ref, res.inliers,
            cfg.init.expected_avg_depth)
        self._finish_init(frame, px_cur, f_cur, ok & res.inliers,
                          T_cur_ref, depths)
        return self._result(self.last_frame, int(res.n_inliers), is_kf=True)

    def _finish_init(self, frame, px_cur, f_cur, inliers, T_cur_ref, depths):
        """Create the second keyframe with triangulated landmarks
        (reference: FrameHandlerMono::processSecondFrame
        frame_handler_mono.cpp:82-117)."""
        ref = self._init_ref_frame
        # depth sanity gate (reference triangulation min/max depth filtering)
        med = self.cfg.init.expected_avg_depth
        inliers = inliers & (depths > 0.1 * med) & (depths < 5.0 * med)
        # world = first keyframe camera frame
        pts_w = ref.f * depths[:, None]
        self.pool, slots = allocate(self.pool, pts_w, inliers)
        n = self.max_fts
        idx = jnp.arange(n, dtype=jnp.int32)
        self.pool = add_observations(self.pool, slots,
                                     jnp.zeros((n,), jnp.int32), idx,
                                     inliers)
        self.pool = add_observations(self.pool, slots,
                                     jnp.ones((n,), jnp.int32), idx, inliers)

        corner = jnp.int32(ft.FeatureType.CORNER)
        invalid = jnp.int32(ft.FeatureType.INVALID)
        # ref keyframe: inlier features become landmarks
        ref_upd = ref._replace(
            landmark_id=jnp.where(inliers, slots, -1),
            ftype=jnp.where(inliers, corner, ref.ftype))
        self.ring = insert_keyframe(self.ring, ref_upd, jnp.asarray(0))

        frame = frame._replace(
            T_cam_world=T_cur_ref.compose(ref.T_cam_world),
            px=px_cur, f=f_cur,
            grad=ref.grad, level=ref.level,
            ftype=jnp.where(inliers, corner, invalid),
            landmark_id=jnp.where(inliers, slots, -1),
            is_keyframe=jnp.asarray(True))
        # fill remaining slots with new seeds
        self.rng_key, k = jax.random.split(self.rng_key)
        self.depth_median = float(self.cfg.init.expected_avg_depth)
        self.depth_min = self.depth_median * 0.1
        frame, _ = self._jit_detect(frame, k, self._depth_scalars())
        self.ring = insert_keyframe(self.ring, frame, jnp.asarray(1))
        self.last_frame = frame
        self.T_rel_prev = SE3.identity()
        self.frames_since_kf = 0
        self.stage = Stage.TRACKING

    def _align_extra(self):
        """Secondary-camera pyramids for joint alignment (stereo/array)."""
        return None

    def _process_tracking(self, img, timestamp: float) -> FrameResult:
        """One device program + one stats read-back per frame."""
        out = self._jit_frame(
            self.ring, self.pool, self.last_frame, jnp.asarray(img),
            jnp.float32(timestamp), self._motion_prior(timestamp),
            self._depth_state,
            jnp.int32(self.frames_since_kf), self.rng_key,
            self._align_extra())
        ring, pool, frame, T_rel, depth_state, stats_vec, pose = out
        sv = np.asarray(stats_vec)                    # single transfer
        stats = dict(zip(self.STATS_KEYS, sv.tolist()))
        self.stats = stats
        n_tracked = int(stats["n_tracked"])
        is_kf = bool(stats["is_kf"])

        quality = self._check_quality(n_tracked)
        if quality == TrackingQuality.INSUFFICIENT:
            # keep the last good frame as relocalization anchor
            self.ring, self.pool = ring, pool
            self.stage = Stage.RELOCALIZING
            self.reloc_trials = 0
            return FrameResult(np.asarray(pose), self.stage, n_tracked,
                               quality, False)

        self.ring, self.pool, self.last_frame = ring, pool, frame
        self.T_rel_prev = T_rel
        self._depth_state = depth_state
        self.depth_median = float(stats["depth_median"]) \
            if 1e-3 < stats["depth_median"] < 1e6 else self.depth_median
        self.depth_min = max(0.5 * float(stats["depth_min"]), 1e-3) \
            if 1e-3 < stats["depth_min"] < 1e6 else self.depth_min
        self.frames_since_kf = 0 if is_kf else self.frames_since_kf + 1
        return FrameResult(np.asarray(pose), self.stage, n_tracked,
                           quality, is_kf)

    def _check_quality(self, n_tracked: int) -> TrackingQuality:
        """reference: setTrackingQuality frame_handler_base.cpp:991-1009."""
        if n_tracked < self.cfg.base.quality_min_fts:
            return TrackingQuality.INSUFFICIENT
        # feature-drop check needs the previous count
        prev = getattr(self, "_prev_n_tracked", n_tracked)
        self._prev_n_tracked = n_tracked
        if prev - n_tracked > self.cfg.base.quality_max_fts_drop:
            return TrackingQuality.BAD
        return TrackingQuality.GOOD

    def _process_reloc(self, frame: FrameState) -> FrameResult:
        """Relocalize against the closest keyframe by re-running tracking
        with the keyframe as reference (reference: relocalizeFrame
        frame_handler_mono.cpp:254-279)."""
        self.reloc_trials += 1
        slot = int(closest_keyframe_slot(
            self.ring, self.last_frame.T_cam_world))
        kf = jax.tree.map(lambda x: x[slot], self.ring.frames)
        ring, pool, tracked, stats = self._jit_tracking(
            self.ring, self.pool, kf, frame, SE3.identity(),
            self._depth_scalars())
        n_tracked = int(stats["n_tracked"])
        if n_tracked >= self.cfg.base.quality_min_fts:
            self.ring, self.pool = ring, pool
            self.last_frame = tracked
            self.T_rel_prev = SE3.identity()
            self.stage = Stage.TRACKING
            return self._result(tracked, n_tracked)
        if self.reloc_trials >= self.cfg.base.relocalization_max_trials:
            # hard reset (reference: resetVisionFrontendCommon)
            self.stage = Stage.FIRST_FRAME
            self.ring = jax.tree.map(jnp.zeros_like, self.ring)
            self.pool = make_pool(self.cfg.capacity.max_points,
                                  self.cfg.capacity.max_obs_per_point)
        return self._result(frame, n_tracked, TrackingQuality.INSUFFICIENT)


def _scene_depth(frame: FrameState, xyz_w: jax.Array, valid: jax.Array):
    from svo_pro_universal_tpu.common.frame import scene_depth_stats
    return scene_depth_stats(frame, xyz_w, valid)


class FrameHandlerVIO(FrameHandlerMono):
    """Mono VIO: gyro priors in the frontend + sliding-window VI bundle
    adjustment on keyframes (reference: the kMonoIMU pipeline with the
    ceres backend attached — frame_handler_base.cpp:263-311 backend
    handshake, svo_factory kMonoIMU)."""

    def __init__(self, cfg: Config, cam: proj.Camera,
                 T_cam_body: Optional[SE3] = None, seed: int = 0,
                 imu_handler=None, imu_params=None, gravity=None):
        super().__init__(cfg, cam, T_cam_body=T_cam_body, seed=seed,
                         imu_handler=imu_handler)
        from svo_pro_universal_tpu.backend import window_ba as wba_mod
        from svo_pro_universal_tpu.backend.device_interface import \
            DeviceBackend
        opts = wba_mod.BAOptions(
            max_iter=cfg.backend.max_iterations,
            gravity=tuple(gravity) if gravity is not None
            else (0.0, 0.0, -9.81))
        self.backend = DeviceBackend(
            cam.focal_length, self.T_cam_body,
            num_keyframes=cfg.backend.num_keyframes,
            imu_params=imu_params, opts=opts)

    def _process_tracking(self, img, timestamp: float) -> FrameResult:
        res = super()._process_tracking(img, timestamp)
        # the backend runs on keyframes only; keep its latest result visible
        # in every frame's stats (the reference's backend is asynchronous —
        # its "current" state always reflects the last optimization)
        if getattr(self, "_last_backend_chi2", None) is not None:
            self.stats["backend_chi2"] = self._last_backend_chi2
        if res.is_keyframe and self.backend is not None:
            # device-resident: keyframe arrays and pool never leave the
            # chip (round 2 pulled lids/bearings/positions to host here)
            T_new, chi2 = self.backend.add_keyframe_device(
                timestamp, self.last_frame, self.pool,
                imu_handler=self.imu)
            ring, pool, frame, s, _c = self.backend._jit_apply(
                self.backend.state, self.ring, self.pool,
                self.last_frame, T_new, chi2)
            self.ring, self.pool, self.last_frame = ring, pool, frame
            # the common-mode scale also rescales the scene-depth scalars
            # and the constant-velocity motion model (this host handler is
            # synchronous anyway — it reads chi2 below)
            sf = float(s)
            self.depth_median *= sf
            self.depth_min *= sf
            self.T_rel_prev = SE3(self.T_rel_prev.q,
                                  self.T_rel_prev.t * sf)
            # host handler is sync anyway; one scalar read for stats
            self.stats["backend_chi2"] = float(chi2)
            self._last_backend_chi2 = self.stats["backend_chi2"]
        return res


class FrameHandlerArray(FrameHandlerMono):
    """N-camera rig pipeline (reference: FrameHandlerArray
    frame_handler_array.cpp:38-204). Round-1 scope: the primary camera
    drives direct tracking and the map; every secondary camera contributes
    metric landmarks by batched cross-camera epipolar triangulation at
    keyframes (the N-wise generalization of the stereo path). Full
    N-camera joint alignment/reprojection shares the CameraInput-list
    machinery (ops/sparse_img_align.py takes a list) and lands with the
    frame-bundle refactor."""

    def __init__(self, cfg: Config, cams, T_body_cams, seed: int = 0):
        super().__init__(cfg, cams[0],
                         T_cam_body=T_body_cams[0].inverse(), seed=seed)
        from svo_pro_universal_tpu.frontend import stereo_triangulation as st
        self._st = st
        self.cams = list(cams)
        self.T_c_c0 = [
            T_body_cams[i].inverse().compose(T_body_cams[0])
            for i in range(1, len(cams))]
        self._st_opts = st.StereoTriangulationOptions(
            mean_depth_inv=cfg.stereo.mean_depth_inv,
            min_depth_inv=cfg.stereo.min_depth_inv,
            max_depth_inv=cfg.stereo.max_depth_inv,
            max_search_level=cfg.detector.max_level)
        self._jit_pair_lm = [
            jax.jit(partial(self._pair_landmarks, pair_idx=i))
            for i in range(len(self.T_c_c0))]

    def _pair_landmarks(self, ring, pool, frame, pyr_other, pair_idx):
        own_seed = (frame.valid_mask() & ft.is_unconverged_seed(frame.ftype)
                    & (frame.seed_ref_kf < 0) & (frame.landmark_id < 0))
        m = self._st.triangulate_pair(
            frame.pyramid, pyr_other, self.cam, self.cams[pair_idx + 1],
            self.T_c_c0[pair_idx], frame.px, frame.f, frame.grad,
            frame.level, frame.ftype, own_seed, self._st_opts)
        ok = m.success & own_seed
        xyz_w = frame.T_world_cam.apply(frame.f * m.depth0[:, None])
        pool, slots = allocate(pool, xyz_w, ok)
        slot_kf = ring.last_added
        pool = add_observations(
            pool, slots, jnp.broadcast_to(slot_kf, slots.shape),
            jnp.arange(self.max_fts, dtype=jnp.int32), ok)
        frame = frame._replace(
            landmark_id=jnp.where(ok, slots, frame.landmark_id),
            ftype=jnp.where(ok, ft.seed_to_landmark_type(
                ft.seed_to_converged(frame.ftype)), frame.ftype))
        ring = insert_keyframe(ring, frame, slot_kf)
        return ring, pool, frame, jnp.sum(ok.astype(jnp.int32))

    def _align_extra(self):
        if getattr(self, "_pyr_others_last", None) is None:
            return None
        return dict(pyr_last=list(self._pyr_others_last),
                    pyr_cur=list(self._pyr_others))

    def _extra_align_inputs(self, ring, pool, last_frame, extra):
        """Joint N-camera alignment (reference: frame_handler_array.cpp
        :38-204 + the per-frame bundle loop of sparse_img_align.cpp):
        one CameraInput per secondary camera, primary features' points
        projected into each."""
        if extra is None:
            return []
        xyz_w, has_pt = _feature_world_points(last_frame, ring, pool)
        out = []
        for i, T_rel in enumerate(self.T_c_c0):
            T_ci_world = T_rel.compose(last_frame.T_cam_world)
            p_ci = T_ci_world.apply(xyz_w)
            pxi, oki = proj.project(self.cams[i + 1], p_ci)
            depth_i = jnp.linalg.norm(p_ci, axis=-1)
            fi = p_ci / jnp.maximum(depth_i[:, None], 1e-9)
            valid = (last_frame.valid_mask() & has_pt & oki
                     & (p_ci[:, 2] > 0.1))
            out.append(sia_mod.CameraInput(
                pyr_ref=extra["pyr_last"][i], pyr_cur=extra["pyr_cur"][i],
                px_ref=pxi, f_ref=fi, depth_ref=depth_i, valid=valid,
                T_cam_body=T_rel.compose(self.T_cam_body),
                cam=self.cams[i + 1]))
        return out

    def add_image_bundle(self, images, timestamp: float) -> FrameResult:
        """images: one per camera, cam0 first."""
        self._pyr_others_last = getattr(self, "_pyr_others", None)
        self._pyr_others = [build_pyramid(image_to_float(im), self.n_levels)
                            for im in images[1:]]
        return self.add_image(images[0], timestamp)

    def _triangulate_all_pairs(self):
        n_total = 0
        for i, jit_fn in enumerate(self._jit_pair_lm):
            self.ring, self.pool, self.last_frame, n_lm = jit_fn(
                self.ring, self.pool, self.last_frame,
                self._pyr_others[i])
            n_total += int(n_lm)
        self.stats["kf_array_landmarks"] = n_total

    def _process_first_frame(self, frame: FrameState) -> FrameResult:
        self.rng_key, k = jax.random.split(self.rng_key)
        frame, n_new = self._jit_detect(frame, k, self._depth_scalars())
        if int(n_new) < self.cfg.init.init_min_features:
            return self._result(frame, 0, TrackingQuality.INSUFFICIENT)
        frame = frame._replace(is_keyframe=jnp.asarray(True))
        self.ring = insert_keyframe(self.ring, frame, jnp.asarray(0))
        self.last_frame = frame
        self._triangulate_all_pairs()
        n_lm = self.stats.get("kf_array_landmarks", 0)
        if n_lm < self.cfg.init.init_min_inliers:
            self.ring = jax.tree.map(jnp.zeros_like, self.ring)
            self.pool = make_pool(self.cfg.capacity.max_points,
                                  self.cfg.capacity.max_obs_per_point)
            return self._result(frame, n_lm, TrackingQuality.INSUFFICIENT)
        self.T_rel_prev = SE3.identity()
        self.frames_since_kf = 0
        self.stage = Stage.TRACKING
        return self._result(self.last_frame, n_lm, is_kf=True)

    def _process_init(self, frame: FrameState) -> FrameResult:
        return self._process_first_frame(frame)

    def _process_tracking(self, img, timestamp: float) -> FrameResult:
        res = super()._process_tracking(img, timestamp)
        if res.is_keyframe:
            self._triangulate_all_pairs()
        return res


class FrameHandlerStereo(FrameHandlerMono):
    """Stereo pipeline: instant metric bootstrap from the calibrated pair,
    left-camera direct tracking, stereo re-triangulation at every keyframe
    (reference: FrameHandlerStereo frame_handler_stereo.cpp:66-213 +
    StereoTriangulation stereo_triangulation.cpp:23-141). Full multi-camera
    tracking (FrameHandlerArray) shares this structure with N CameraInputs.
    """

    def __init__(self, cfg: Config, cam0: proj.Camera, cam1: proj.Camera,
                 T_body_cam0: SE3, T_body_cam1: SE3, seed: int = 0):
        super().__init__(cfg, cam0, T_cam_body=T_body_cam0.inverse(),
                         seed=seed)
        self.cam1 = cam1
        self.T_c1_c0 = T_body_cam1.inverse().compose(T_body_cam0)
        from svo_pro_universal_tpu.frontend import stereo_triangulation as st
        self._st = st
        self._st_opts = st.StereoTriangulationOptions(
            mean_depth_inv=cfg.stereo.mean_depth_inv,
            min_depth_inv=cfg.stereo.min_depth_inv,
            max_depth_inv=cfg.stereo.max_depth_inv,
            max_search_level=cfg.detector.max_level)
        self._jit_stereo_lm = jax.jit(self._stereo_landmarks)

    def _stereo_landmarks(self, ring, pool, frame, pyr1):
        """Triangulate this keyframe's fresh seeds against the right image
        and promote successes straight to metric landmarks."""
        own_seed = (frame.valid_mask() & ft.is_unconverged_seed(frame.ftype)
                    & (frame.seed_ref_kf < 0) & (frame.landmark_id < 0))
        m = self._st.triangulate_pair(
            frame.pyramid, pyr1, self.cam, self.cam1, self.T_c1_c0,
            frame.px, frame.f, frame.grad, frame.level, frame.ftype,
            own_seed, self._st_opts)
        ok = m.success & own_seed
        xyz_w = frame.T_world_cam.apply(frame.f * m.depth0[:, None])
        pool, slots = allocate(pool, xyz_w, ok)
        slot_kf = ring.last_added
        pool = add_observations(
            pool, slots, jnp.broadcast_to(slot_kf, slots.shape),
            jnp.arange(self.max_fts, dtype=jnp.int32), ok)
        frame = frame._replace(
            landmark_id=jnp.where(ok, slots, frame.landmark_id),
            ftype=jnp.where(ok, ft.seed_to_landmark_type(
                ft.seed_to_converged(frame.ftype)), frame.ftype))
        ring = insert_keyframe(ring, frame, slot_kf)
        return ring, pool, frame, jnp.sum(ok.astype(jnp.int32))

    def _align_extra(self):
        if getattr(self, "_pyr1_last", None) is None:
            return None
        return dict(pyr_last=[self._pyr1_last], pyr_cur=[self._pyr1])

    def _extra_align_inputs(self, ring, pool, last_frame, extra):
        """JOINT stereo alignment (reference: frame_handler_stereo.cpp
        :66-213 aligns the whole bundle): project the primary features'
        3D points into the right camera at the last-frame pose and add a
        right-image photometric CameraInput. Features whose point falls
        outside the right view are masked — the normal system simply sums
        both cameras' contributions (sparse_img_align.run takes a list)."""
        if extra is None:
            return []
        xyz_w, has_pt = _feature_world_points(last_frame, ring, pool)
        T_c1_world = self.T_c1_c0.compose(last_frame.T_cam_world)
        p_c1 = T_c1_world.apply(xyz_w)
        px1, ok1 = proj.project(self.cam1, p_c1)
        depth1 = jnp.linalg.norm(p_c1, axis=-1)
        f1 = p_c1 / jnp.maximum(depth1[:, None], 1e-9)
        valid = (last_frame.valid_mask() & has_pt & ok1
                 & (p_c1[:, 2] > 0.1))
        T_cam1_body = self.T_c1_c0.compose(self.T_cam_body)
        return [sia_mod.CameraInput(
            pyr_ref=extra["pyr_last"][0], pyr_cur=extra["pyr_cur"][0],
            px_ref=px1, f_ref=f1, depth_ref=depth1, valid=valid,
            T_cam_body=T_cam1_body, cam=self.cam1)]

    def add_image_pair(self, img0, img1, timestamp: float) -> FrameResult:
        self._pyr1_last = getattr(self, "_pyr1", None)
        self._pyr1 = build_pyramid(image_to_float(img1), self.n_levels)
        res = self.add_image(img0, timestamp)
        return res

    def _process_first_frame(self, frame: FrameState) -> FrameResult:
        self.rng_key, k = jax.random.split(self.rng_key)
        frame, n_new = self._jit_detect(frame, k, self._depth_scalars())
        if int(n_new) < self.cfg.init.init_min_features:
            return self._result(frame, 0, TrackingQuality.INSUFFICIENT)
        frame = frame._replace(is_keyframe=jnp.asarray(True))
        self.ring = insert_keyframe(self.ring, frame, jnp.asarray(0))
        self.ring, self.pool, frame, n_lm = self._jit_stereo_lm(
            self.ring, self.pool, frame, self._pyr1)
        if int(n_lm) < self.cfg.init.init_min_inliers:
            # not enough stereo matches → retry next frame
            self.ring = jax.tree.map(jnp.zeros_like, self.ring)
            self.pool = make_pool(self.cfg.capacity.max_points,
                                  self.cfg.capacity.max_obs_per_point)
            return self._result(frame, int(n_lm),
                                TrackingQuality.INSUFFICIENT)
        self.last_frame = frame
        self.T_rel_prev = SE3.identity()
        self.frames_since_kf = 0
        self.stats = {}
        self.stage = Stage.TRACKING
        return self._result(frame, int(n_lm), is_kf=True)

    def _process_init(self, frame: FrameState) -> FrameResult:
        # stereo never needs the monocular two-view bootstrap
        return self._process_first_frame(frame)

    def _process_tracking(self, img, timestamp: float) -> FrameResult:
        res = super()._process_tracking(img, timestamp)
        if res.is_keyframe:
            self.ring, self.pool, self.last_frame, n_lm = \
                self._jit_stereo_lm(self.ring, self.pool, self.last_frame,
                                    self._pyr1)
            self.stats["kf_stereo_landmarks"] = int(n_lm)
        return res
