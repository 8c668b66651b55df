"""Fully on-device frontend: the whole VO state machine in ONE jitted step.

The reference drives its pipeline from a host state machine
(reference: src/svo/src/frame_handler_base.cpp addFrameBundle:200-550 and
the Stage enum frame_handler_base.h:214-219). The round-1 TPU port kept
that shape: host Python flips the Stage and reads back a stats vector every
frame. On this system a single device→host readback costs ~25 ms and
permanently degrades dispatch latency (axon tunnel measurement, DESIGN.md
§perf), so the steady-state loop must never read from the device.

This module therefore moves the ENTIRE state machine on-device:

- ``WorldState`` is one pytree holding the stage code, keyframe ring,
  landmark pool, last frame, initialization reference, depth scalars,
  quality/relocalization counters, the PRNG key, and a pose/stats trace
  ring.
- ``DevicePipelineMono.add_image`` uploads the image and dispatches ONE
  jitted ``step``; `lax.switch` on the stage code executes exactly one of
  {first-frame, initializing, tracking, relocalizing} branches — the same
  four stages as the reference, compiled.
- Nothing is transferred back per frame. ``drain()`` reads the pose trace
  once at the end of a run (or whenever the caller wants, accepting the
  one-off transfer cost).

The branches reuse the stage programs of ``FrameHandlerMono`` (tracking
step, keyframe step, detector, KLT) — this class is the dispatch-latency
answer, not a second implementation of the math.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.common import types as ft
from svo_pro_universal_tpu.common.frame import FrameState, make_empty_frame
from svo_pro_universal_tpu.common.point import (
    LandmarkPool, add_observations, allocate, make_pool)
from svo_pro_universal_tpu.config import Config
from svo_pro_universal_tpu.frontend import initialization as init_mod
from svo_pro_universal_tpu.frontend.frame_handler import (
    FrameHandlerMono, Stage, TrackingQuality)
from svo_pro_universal_tpu.frontend.map import (
    KeyframeRing, closest_keyframe_slot, insert_keyframe, make_ring)
from svo_pro_universal_tpu.ops.pyramid import build_pyramid, image_to_float
from svo_pro_universal_tpu.utils.transform import SE3, quat_normalize


class WorldState(NamedTuple):
    """The entire pipeline state as one device pytree."""
    stage: jax.Array            # i32 Stage code
    ring: KeyframeRing
    pool: LandmarkPool
    last_frame: FrameState
    init_ref: FrameState        # first keyframe during initialization
    init_px: jax.Array          # [N,2] incremental KLT guesses (init)
    T_rel_prev: SE3             # constant-velocity model
    depth_state: jax.Array      # [2] = (depth_median, depth_min)
    frames_since_kf: jax.Array  # i32
    prev_n_tracked: jax.Array   # i32 (quality drop check)
    reloc_trials: jax.Array     # i32
    rng_key: jax.Array
    # --- output trace ring (drained by the host at the end of a run) ---
    trace_q: jax.Array          # [CAP, 4] T_world_cam quaternion
    trace_t: jax.Array          # [CAP, 3] T_world_cam translation
    trace_meta: jax.Array       # [CAP, 4] (stage, n_tracked, is_kf, ts)
    trace_ptr: jax.Array        # i32


class DevicePipelineMono(FrameHandlerMono):
    """Transfer-free mono VO: one device program per frame, zero readbacks.

    ``sync=True`` restores the per-frame stats readback of the parent class
    (useful in tests / on CPU); the default is fully asynchronous.
    """

    def __init__(self, cfg: Config, cam: proj.Camera,
                 T_cam_body: Optional[SE3] = None, seed: int = 0,
                 imu_handler=None, trace_capacity: int = 8192,
                 sync: bool = False):
        super().__init__(cfg, cam, T_cam_body=T_cam_body, seed=seed,
                         imu_handler=imu_handler)
        self.sync = sync
        self.trace_capacity = trace_capacity
        # Session epoch: absolute timestamps (EuRoC stamps are ~1.4e9 s)
        # are unrepresentable in f32 (ULP = 128 s there), so everything
        # shipped to the device is SESSION-RELATIVE (timestamp − epoch);
        # the host keeps absolute stamps (ADVICE r3 high).
        self._t_epoch: Optional[float] = None
        self.world = self._make_world(seed)
        self._jit_step = jax.jit(self._step_program)

    def _rel_ts(self, timestamp: float) -> float:
        if self._t_epoch is None:
            self._t_epoch = float(timestamp)
        return float(timestamp) - self._t_epoch

    # ------------------------------------------------------------------
    def _make_world(self, seed: int) -> WorldState:
        cap = self.cfg.capacity
        template = make_empty_frame(
            build_pyramid(jnp.zeros((self.cam.height, self.cam.width),
                                    jnp.float32), self.n_levels),
            self.max_fts, T_cam_body=self.T_cam_body)
        C = self.trace_capacity
        d0 = float(self.cfg.init.expected_avg_depth)
        return WorldState(
            stage=jnp.asarray(Stage.FIRST_FRAME.value, jnp.int32),
            ring=make_ring(template, cap.max_kfs),
            pool=make_pool(cap.max_points, cap.max_obs_per_point),
            last_frame=template,
            init_ref=template,
            init_px=jnp.zeros((self.max_fts, 2), jnp.float32),
            T_rel_prev=SE3.identity(),
            depth_state=jnp.asarray([d0, 0.1 * d0], jnp.float32),
            frames_since_kf=jnp.asarray(0, jnp.int32),
            prev_n_tracked=jnp.asarray(0, jnp.int32),
            reloc_trials=jnp.asarray(0, jnp.int32),
            rng_key=jax.random.PRNGKey(seed),
            trace_q=jnp.zeros((C, 4), jnp.float32).at[:, 0].set(1.0),
            trace_t=jnp.zeros((C, 3), jnp.float32),
            trace_meta=jnp.zeros((C, 4), jnp.float32),
            trace_ptr=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------
    # stage branches — each maps (world, frame, ts, T_prior_rel)
    # to (world', n_tracked, is_kf)
    # ------------------------------------------------------------------
    def _branch_first_frame(self, world: WorldState, frame: FrameState,
                            ts, T_prior_rel):
        cfg = self.cfg
        key, k = jax.random.split(world.rng_key)
        frame, n_new = self._detect_into_frame(frame, k, world.depth_state)
        enough = n_new >= cfg.init.init_min_features
        frame = frame._replace(is_keyframe=enough)

        if cfg.init.init_method == "OneShot":
            # constant-depth bootstrap (reference: OneShotInit)
            def go(w: WorldState) -> WorldState:
                valid = frame.valid_mask()
                depth = jnp.asarray(cfg.init.expected_avg_depth, jnp.float32)
                pts_w = frame.T_world_cam.apply(frame.f * depth)
                pool, slots = allocate(w.pool, pts_w, valid)
                pool = add_observations(
                    pool, slots, jnp.zeros_like(slots),
                    jnp.arange(self.max_fts, dtype=jnp.int32), valid)
                fr = frame._replace(
                    landmark_id=jnp.where(valid, slots, -1),
                    ftype=jnp.where(valid, jnp.int32(ft.FeatureType.CORNER),
                                    frame.ftype))
                return w._replace(
                    stage=jnp.asarray(Stage.TRACKING.value, jnp.int32),
                    ring=insert_keyframe(w.ring, fr, jnp.asarray(0)),
                    pool=pool, last_frame=fr, T_rel_prev=SE3.identity(),
                    frames_since_kf=jnp.asarray(0, jnp.int32))
        else:
            def go(w: WorldState) -> WorldState:
                return w._replace(
                    stage=jnp.asarray(Stage.INITIALIZING.value, jnp.int32),
                    ring=insert_keyframe(w.ring, frame, jnp.asarray(0)),
                    last_frame=frame, init_ref=frame,
                    init_px=frame.px)

        def stay(w: WorldState) -> WorldState:
            return w._replace(last_frame=frame)

        world = world._replace(rng_key=key)
        world = jax.lax.cond(enough, go, stay, world)
        return world, n_new, enough

    def _branch_init(self, world: WorldState, frame: FrameState,
                     ts, T_prior_rel):
        """Second-keyframe search: KLT tracks + RANSAC relative pose
        (reference: processSecondFrame frame_handler_mono.cpp:82-117,
        FivePointInit initialization.cpp:292-347 — 8pt LO-RANSAC here)."""
        cfg = self.cfg
        ref = world.init_ref
        ref_valid = ref.valid_mask()
        # incremental guesses: start each KLT from the PREVIOUS frame's
        # track positions (reference FeatureTracker is incremental,
        # feature_tracker.cpp:52-84) — from-scratch re-search from the
        # ref position collapsed track survival past ~4 frames
        px_cur, ok = self._klt_track(ref, frame.pyramid, ref.px, ref_valid,
                                     world.init_px)
        world = world._replace(
            init_px=jnp.where(ok[:, None], px_cur, world.init_px))
        n_ok = jnp.sum(ok.astype(jnp.int32))
        disp = init_mod.disparity(ref.px, px_cur, ok)
        key, k = jax.random.split(world.rng_key)
        world = world._replace(rng_key=key)

        lost = n_ok < cfg.init.init_min_tracked
        ready = (~lost) & (disp >= cfg.init.init_min_disparity)

        def try_init(w: WorldState) -> WorldState:
            f_cur = proj.backproject(self.cam, px_cur)
            res = init_mod.ransac_relative_pose(
                ref.f, f_cur, ok, k, self.cam.focal_length,
                reproj_thresh_px=cfg.init.reproj_error_thresh)
            T_cur_ref, depths, _ = init_mod.rescale_to_mean_depth(
                res.T_cur_ref, res.depth_ref, res.inliers,
                cfg.init.expected_avg_depth)
            good = res.n_inliers >= cfg.init.init_min_inliers

            def finish(w2: WorldState) -> WorldState:
                med = cfg.init.expected_avg_depth
                inl = (ok & res.inliers & (depths > 0.1 * med)
                       & (depths < 5.0 * med))
                pts_w = ref.f * depths[:, None]
                pool, slots = allocate(w2.pool, pts_w, inl)
                idx = jnp.arange(self.max_fts, dtype=jnp.int32)
                pool = add_observations(pool, slots,
                                        jnp.zeros_like(idx), idx, inl)
                pool = add_observations(pool, slots,
                                        jnp.ones_like(idx), idx, inl)
                corner = jnp.int32(ft.FeatureType.CORNER)
                invalid = jnp.int32(ft.FeatureType.INVALID)
                ref_upd = ref._replace(
                    landmark_id=jnp.where(inl, slots, -1),
                    ftype=jnp.where(inl, corner, ref.ftype))
                ring = insert_keyframe(w2.ring, ref_upd, jnp.asarray(0))
                fr = frame._replace(
                    T_cam_world=T_cur_ref.compose(ref.T_cam_world),
                    px=px_cur, f=f_cur, grad=ref.grad, level=ref.level,
                    ftype=jnp.where(inl, corner, invalid),
                    landmark_id=jnp.where(inl, slots, -1),
                    is_keyframe=jnp.asarray(True))
                key2, k2 = jax.random.split(w2.rng_key)
                d0 = jnp.asarray([cfg.init.expected_avg_depth,
                                  0.1 * cfg.init.expected_avg_depth],
                                 jnp.float32)
                fr, _ = self._detect_into_frame(fr, k2, d0)
                ring = insert_keyframe(ring, fr, jnp.asarray(1))
                return w2._replace(
                    stage=jnp.asarray(Stage.TRACKING.value, jnp.int32),
                    ring=ring, pool=pool, last_frame=fr,
                    init_ref=fr,        # drop the stale reference
                    T_rel_prev=SE3.identity(), depth_state=d0,
                    frames_since_kf=jnp.asarray(0, jnp.int32),
                    rng_key=key2)

            def keep(w2: WorldState) -> WorldState:
                return w2._replace(last_frame=frame)

            return jax.lax.cond(good, finish, keep, w)

        def restart(w: WorldState) -> WorldState:
            # lost too many tracks → restart initialization from scratch
            return self._reset_world_extras(w._replace(
                stage=jnp.asarray(Stage.FIRST_FRAME.value, jnp.int32),
                ring=jax.tree.map(jnp.zeros_like, w.ring),
                last_frame=frame))

        def keep_tracking(w: WorldState) -> WorldState:
            return jax.lax.cond(ready, try_init,
                                lambda w2: w2._replace(last_frame=frame), w)

        world = jax.lax.cond(lost, restart, keep_tracking, world)
        return world, n_ok, world.stage == Stage.TRACKING.value

    def _device_align_extra(self, world):
        """Secondary-camera pyramids for joint alignment, read from the
        world state (stereo device pipeline overrides; mono: none)."""
        return None

    def _reset_world_extras(self, world):
        """Hook for subclasses to clear their extra world-state fields on
        a full pipeline restart (tracking loss / failed relocalization).
        The VIO subclass zeroes its backend window here — after a reset
        the new map lives in an unrelated world frame and stale window
        states/IMU factors must not co-optimize with it (ADVICE r3
        medium)."""
        return world

    def _branch_tracking(self, world: WorldState, frame: FrameState,
                         ts, T_prior_rel):
        cfg = self.cfg
        key, k = jax.random.split(world.rng_key)
        ring, pool, tracked, stats = self._tracking_step(
            world.ring, world.pool, world.last_frame, frame, T_prior_rel,
            world.depth_state, self._device_align_extra(world))

        # keyframe decision (reference needNewKf frame_handler_base.cpp:1012)
        n_tracked = stats["n_tracked"]
        med_disp = stats["med_disparity"]
        is_kf = n_tracked <= cfg.base.kfselect_numkfs_upper_thresh
        is_kf &= (world.frames_since_kf
                  >= cfg.base.kfselect_min_num_frames_between_kfs)
        need_more = n_tracked < cfg.base.kfselect_numkfs_lower_thresh
        gates = jnp.asarray(True)
        if cfg.base.kfselect_min_disparity > 0:
            gates &= ~(jnp.isfinite(med_disp)
                       & (med_disp < cfg.base.kfselect_min_disparity))
        gates &= ~stats["kf_too_close"]
        is_kf &= (need_more | gates)
        quality_ok = n_tracked >= cfg.base.quality_min_fts
        is_kf &= quality_ok

        ring, pool, tracked = jax.lax.cond(
            is_kf,
            lambda a: self._keyframe_step(a[0], a[1], a[2], k,
                                          world.depth_state)[:3],
            lambda a: a, (ring, pool, tracked))

        T_rel = tracked.T_cam_world.compose(
            world.last_frame.T_cam_world.inverse())
        dm, dmin = stats["depth_median"], stats["depth_min"]
        dm_ok = jnp.isfinite(dm) & (dm > 1e-3) & (dm < 1e6)
        new_depth = jnp.where(
            dm_ok, jnp.stack([dm, jnp.maximum(0.5 * dmin, 1e-3)]),
            world.depth_state)

        # tracking-quality monitor (reference :991-1009)
        drop = (world.prev_n_tracked - n_tracked
                > cfg.base.quality_max_fts_drop)
        insufficient = ~quality_ok

        def to_reloc(w: WorldState) -> WorldState:
            # keep the last good frame as the relocalization anchor
            return w._replace(
                stage=jnp.asarray(Stage.RELOCALIZING.value, jnp.int32),
                ring=ring, pool=pool,
                reloc_trials=jnp.asarray(0, jnp.int32),
                prev_n_tracked=n_tracked, rng_key=key)

        _ = drop  # BAD quality only logs in the reference (:1001-1006)

        def keep(w: WorldState) -> WorldState:
            return w._replace(
                ring=ring, pool=pool, last_frame=tracked, T_rel_prev=T_rel,
                depth_state=new_depth,
                frames_since_kf=jnp.where(is_kf, 0,
                                          w.frames_since_kf + 1),
                prev_n_tracked=n_tracked, rng_key=key)

        world = jax.lax.cond(insufficient, to_reloc, keep, world)
        return world, n_tracked, is_kf & ~insufficient

    def _branch_reloc(self, world: WorldState, frame: FrameState,
                      ts, T_prior_rel):
        """Relocalize against the closest keyframe
        (reference: relocalizeFrame frame_handler_mono.cpp:254-279)."""
        cfg = self.cfg
        slot = closest_keyframe_slot(world.ring, world.last_frame.T_cam_world)
        kf = jax.tree.map(lambda x: x[slot], world.ring.frames)
        ring, pool, tracked, stats = self._tracking_step(
            world.ring, world.pool, kf, frame, SE3.identity(),
            world.depth_state)
        n_tracked = stats["n_tracked"]
        success = n_tracked >= cfg.base.quality_min_fts

        def ok(w: WorldState) -> WorldState:
            return w._replace(
                stage=jnp.asarray(Stage.TRACKING.value, jnp.int32),
                ring=ring, pool=pool, last_frame=tracked,
                T_rel_prev=SE3.identity(),
                prev_n_tracked=n_tracked)

        def fail(w: WorldState) -> WorldState:
            trials = w.reloc_trials + 1
            give_up = trials >= cfg.base.relocalization_max_trials

            def reset(w2: WorldState) -> WorldState:
                return self._reset_world_extras(w2._replace(
                    stage=jnp.asarray(Stage.FIRST_FRAME.value, jnp.int32),
                    ring=jax.tree.map(jnp.zeros_like, w2.ring),
                    pool=jax.tree.map(jnp.zeros_like, w2.pool)._replace(
                        next_id=jnp.zeros_like(w2.pool.next_id)),
                    reloc_trials=jnp.asarray(0, jnp.int32)))

            return jax.lax.cond(give_up, reset,
                                lambda w2: w2._replace(reloc_trials=trials),
                                w)

        world = jax.lax.cond(success, ok, fail, world)
        return world, n_tracked, jnp.asarray(False)

    # ------------------------------------------------------------------
    def _step_program(self, world: WorldState, img, ts, T_prior_rel):
        pyr = build_pyramid(image_to_float(img), self.n_levels)
        frame = make_empty_frame(pyr, self.max_fts,
                                 T_cam_body=self.T_cam_body, timestamp=ts)
        return self._run_state_machine(world, frame, ts, T_prior_rel)

    def _run_state_machine(self, world: WorldState, frame, ts,
                           T_prior_rel):
        """Dispatch the 4-stage `lax.switch` + append the trace entry
        (shared by the mono/VIO/stereo device pipelines)."""
        idx = jnp.clip(world.stage - Stage.FIRST_FRAME.value, 0, 3)
        world, n_tracked, is_kf = jax.lax.switch(
            idx,
            [self._branch_first_frame, self._branch_init,
             self._branch_tracking, self._branch_reloc],
            world, frame, ts, T_prior_rel)

        # append pose + meta to the trace ring
        T_wc = world.last_frame.T_world_cam
        p = jnp.minimum(world.trace_ptr, self.trace_capacity - 1)
        world = world._replace(
            trace_q=world.trace_q.at[p].set(quat_normalize(T_wc.q)),
            trace_t=world.trace_t.at[p].set(T_wc.t),
            trace_meta=world.trace_meta.at[p].set(jnp.stack([
                world.stage.astype(jnp.float32),
                n_tracked.astype(jnp.float32),
                is_kf.astype(jnp.float32),
                jnp.asarray(ts, jnp.float32)])),
            trace_ptr=world.trace_ptr + 1)
        return world

    # ------------------------------------------------------------------
    # host API
    # ------------------------------------------------------------------
    def add_image(self, img, timestamp: float):
        """One async device dispatch; NO device→host transfer."""
        self.frame_count += 1
        prior = self._motion_prior_device(timestamp)
        self.world = self._jit_step(
            self.world, jnp.asarray(img),
            jnp.float32(self._rel_ts(timestamp)), prior)
        self._last_ts = timestamp
        if self.sync:
            return self._sync_result()
        return None

    def _motion_prior_device(self, timestamp: float) -> SE3:
        """Constant-velocity + optional gyro prior, with NO device reads
        and no per-frame eager device ops (the matrix→quat conversion
        runs in numpy; each eager op would pay tunnel dispatch)."""
        if self.imu is None or self._last_ts is None:
            return self.world.T_rel_prev
        R = self.imu.relative_rotation_prior_np(
            self._last_ts, timestamp, self._R_cam_body_np)
        from svo_pro_universal_tpu.utils.transform import matrix_to_quat_np
        q = jnp.asarray(matrix_to_quat_np(R))
        return SE3(q, self.world.T_rel_prev.t)

    def _sync_result(self):
        """Read back the latest trace entry (tests / debugging only)."""
        p = int(self.world.trace_ptr) - 1
        q = np.asarray(self.world.trace_q[p])
        t = np.asarray(self.world.trace_t[p])
        meta = np.asarray(self.world.trace_meta[p])
        self.stage = Stage(int(meta[0]))
        T = np.asarray(SE3(jnp.asarray(q), jnp.asarray(t)).as_matrix())
        from svo_pro_universal_tpu.frontend.frame_handler import FrameResult
        return FrameResult(T, self.stage, int(meta[1]),
                           TrackingQuality.GOOD, bool(meta[2]))

    def drain(self):
        """Block, then fetch the whole pose/meta trace (ONE sync point).

        Returns (T_world_cam [N,4,4], meta [N,4]) as numpy.
        """
        jax.block_until_ready(self.world.trace_ptr)
        n = int(self.world.trace_ptr)
        q = np.asarray(self.world.trace_q[:n])
        t = np.asarray(self.world.trace_t[:n])
        meta = np.asarray(self.world.trace_meta[:n])
        mats = np.asarray(jax.vmap(
            lambda qq, tt: SE3(qq, tt).as_matrix())(
            jnp.asarray(q), jnp.asarray(t)))
        return mats, meta

    def block(self):
        """Wait for all in-flight frames without transferring anything."""
        jax.block_until_ready(self.world.trace_ptr)
