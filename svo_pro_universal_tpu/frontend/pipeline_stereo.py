"""Fully on-device stereo VO: both cameras' images in one upload, joint
two-camera alignment, stereo triangulation at keyframes — the whole
state machine in one jitted step with zero steady-state readbacks.

Device counterpart of the host `FrameHandlerStereo` (reference:
frame_handler_stereo.cpp:66-213 + stereo_triangulation.cpp:23-141):
stereo never needs the monocular two-view bootstrap — the first frame
with enough stereo-triangulated landmarks goes straight to TRACKING with
metric scale.

Transfer discipline (the axon tunnel is bandwidth/latency bound — see
pipeline_vio.py): the stereo pair ships as ONE stacked [2H, W] array per
frame; the right pyramid is rebuilt on device and also retained in the
world state so the NEXT frame's joint alignment can use the previous
right image as its photometric reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.common import types as ft
from svo_pro_universal_tpu.common.frame import make_empty_frame
from svo_pro_universal_tpu.common.point import add_observations, allocate
from svo_pro_universal_tpu.config import Config
from svo_pro_universal_tpu.frontend import stereo_triangulation as st
from svo_pro_universal_tpu.frontend.frame_handler import (
    Stage, _feature_world_points)
from svo_pro_universal_tpu.frontend.map import insert_keyframe
from svo_pro_universal_tpu.frontend.pipeline import (
    DevicePipelineMono, WorldState)
from svo_pro_universal_tpu.ops import sparse_img_align as sia_mod
from svo_pro_universal_tpu.ops.pyramid import build_pyramid, image_to_float
from svo_pro_universal_tpu.utils.transform import SE3

I32 = jnp.int32


class WorldStateStereo(NamedTuple):
    """WorldState + the right camera's current/previous pyramids."""
    stage: jax.Array
    ring: object
    pool: object
    last_frame: object
    init_ref: object
    init_px: jax.Array
    T_rel_prev: SE3
    depth_state: jax.Array
    frames_since_kf: jax.Array
    prev_n_tracked: jax.Array
    reloc_trials: jax.Array
    rng_key: jax.Array
    trace_q: jax.Array
    trace_t: jax.Array
    trace_meta: jax.Array
    trace_ptr: jax.Array
    # --- stereo extras ---
    pyr1_cur: jax.Array      # [L, H, W] right pyramid of THIS frame
    pyr1_prev: jax.Array     # right pyramid of the previous frame


class DevicePipelineStereo(DevicePipelineMono):
    """Zero-readback stereo VO with metric scale from frame one."""

    def __init__(self, cfg: Config, cam0: proj.Camera, cam1: proj.Camera,
                 T_body_cam0: SE3, T_body_cam1: SE3, seed: int = 0,
                 trace_capacity: int = 8192):
        self.cam1 = cam1
        self.T_c1_c0 = T_body_cam1.inverse().compose(T_body_cam0)
        self._st_opts_holder = None
        super().__init__(cfg, cam0, T_cam_body=T_body_cam0.inverse(),
                         seed=seed, trace_capacity=trace_capacity,
                         sync=False)
        self._st_opts = st.StereoTriangulationOptions(
            mean_depth_inv=cfg.stereo.mean_depth_inv,
            min_depth_inv=cfg.stereo.min_depth_inv,
            max_depth_inv=cfg.stereo.max_depth_inv,
            max_search_level=cfg.detector.max_level)

    # ------------------------------------------------------------------
    def _make_world(self, seed: int) -> WorldStateStereo:
        base = super()._make_world(seed)
        zpyr = base.last_frame.pyramid
        return WorldStateStereo(*base, pyr1_cur=zpyr, pyr1_prev=zpyr)

    # ------------------------------------------------------------------
    def _device_align_extra(self, world):
        """Joint stereo alignment: primary features' points projected
        into the right camera; right REF photometry = previous frame's
        right pyramid (mirrors FrameHandlerStereo._extra_align_inputs)."""
        last = world.last_frame
        xyz_w, has_pt = _feature_world_points(last, world.ring, world.pool)
        T_c1_world = self.T_c1_c0.compose(last.T_cam_world)
        p_c1 = T_c1_world.apply(xyz_w)
        px1, ok1 = proj.project(self.cam1, p_c1)
        depth1 = jnp.linalg.norm(p_c1, axis=-1)
        f1 = p_c1 / jnp.maximum(depth1[:, None], 1e-9)
        valid = (last.valid_mask() & has_pt & ok1 & (p_c1[:, 2] > 0.1))
        return [sia_mod.CameraInput(
            pyr_ref=world.pyr1_prev, pyr_cur=world.pyr1_cur,
            px_ref=px1, f_ref=f1, depth_ref=depth1, valid=valid,
            T_cam_body=self.T_c1_c0.compose(self.T_cam_body),
            cam=self.cam1)]

    # ------------------------------------------------------------------
    def _stereo_triangulate(self, ring, pool, frame, pyr1):
        """Promote this keyframe's fresh seeds to metric landmarks via
        the calibrated pair (same math as the host handler's
        _stereo_landmarks)."""
        own_seed = (frame.valid_mask() & ft.is_unconverged_seed(frame.ftype)
                    & (frame.seed_ref_kf < 0) & (frame.landmark_id < 0))
        m = st.triangulate_pair(
            frame.pyramid, pyr1, self.cam, self.cam1, self.T_c1_c0,
            frame.px, frame.f, frame.grad, frame.level, frame.ftype,
            own_seed, self._st_opts)
        ok = m.success & own_seed
        xyz_w = frame.T_world_cam.apply(frame.f * m.depth0[:, None])
        pool, slots = allocate(pool, xyz_w, ok)
        slot_kf = ring.last_added
        pool = add_observations(
            pool, slots, jnp.broadcast_to(slot_kf, slots.shape),
            jnp.arange(self.max_fts, dtype=I32), ok)
        frame = frame._replace(
            landmark_id=jnp.where(ok, slots, frame.landmark_id),
            ftype=jnp.where(ok, ft.seed_to_landmark_type(
                ft.seed_to_converged(frame.ftype)), frame.ftype))
        ring = insert_keyframe(ring, frame, slot_kf)
        return ring, pool, frame, jnp.sum(ok.astype(I32))

    # ------------------------------------------------------------------
    # stage branches
    # ------------------------------------------------------------------
    def _branch_first_frame(self, world, frame, ts, T_prior_rel):
        """Stereo bootstrap: detect seeds, triangulate against the right
        image, straight to TRACKING when enough metric landmarks stick
        (reference: frame_handler_stereo.cpp processFirstFrame)."""
        cfg = self.cfg
        key, k = jax.random.split(world.rng_key)
        frame, n_new = self._detect_into_frame(frame, k, world.depth_state)
        frame = frame._replace(is_keyframe=jnp.asarray(True))
        ring0 = insert_keyframe(world.ring, frame, jnp.asarray(0))
        ring, pool, fr, n_lm = self._stereo_triangulate(
            ring0, world.pool, frame, world.pyr1_cur)
        enough = (n_new >= cfg.init.init_min_features) \
            & (n_lm >= cfg.init.init_min_inliers)

        def go(w):
            return w._replace(
                stage=jnp.asarray(Stage.TRACKING.value, I32),
                ring=ring, pool=pool, last_frame=fr,
                T_rel_prev=SE3.identity(),
                frames_since_kf=jnp.asarray(0, I32))

        def stay(w):
            return w._replace(
                ring=jax.tree.map(jnp.zeros_like, w.ring),
                pool=jax.tree.map(jnp.zeros_like, w.pool)._replace(
                    next_id=jnp.zeros_like(w.pool.next_id)),
                last_frame=frame)

        world = world._replace(rng_key=key)
        world = jax.lax.cond(enough, go, stay, world)
        return world, n_lm, enough

    def _branch_init(self, world, frame, ts, T_prior_rel):
        # stereo never needs the monocular two-view bootstrap
        return self._branch_first_frame(world, frame, ts, T_prior_rel)

    def _branch_tracking(self, world, frame, ts, T_prior_rel):
        world, n_tracked, is_kf = super()._branch_tracking(
            world, frame, ts, T_prior_rel)

        def re_triangulate(w):
            ring, pool, fr, _ = self._stereo_triangulate(
                w.ring, w.pool, w.last_frame, w.pyr1_cur)
            return w._replace(ring=ring, pool=pool, last_frame=fr)

        world = jax.lax.cond(
            is_kf & (world.stage == Stage.TRACKING.value),
            re_triangulate, lambda w: w, world)
        return world, n_tracked, is_kf

    # ------------------------------------------------------------------
    def _step_program_stereo(self, world, ext):
        H = self.cam.height
        img0 = ext[:H]
        img1 = ext[H: 2 * H]
        ts = ext[2 * H, 0]
        pyr1 = build_pyramid(image_to_float(img1), self.n_levels)
        world = world._replace(pyr1_prev=world.pyr1_cur, pyr1_cur=pyr1)
        pyr0 = build_pyramid(image_to_float(img0), self.n_levels)
        frame = make_empty_frame(pyr0, self.max_fts,
                                 T_cam_body=self.T_cam_body, timestamp=ts)
        return self._run_state_machine(world, frame, ts,
                                       world.T_rel_prev)

    def add_image_pair(self, img0, img1, timestamp: float):
        """One stacked upload ([2H+1, W]: left, right, ts row); one
        async dispatch; nothing read back."""
        import numpy as np
        self.frame_count += 1
        H, W = self.cam.height, self.cam.width
        ext = np.zeros((2 * H + 1, W), np.float32)
        ext[:H] = np.asarray(img0, np.float32)
        ext[H: 2 * H] = np.asarray(img1, np.float32)
        # session-relative ts (f32 can't carry absolute EuRoC stamps)
        ext[2 * H, 0] = np.float32(self._rel_ts(timestamp))
        if not hasattr(self, "_jit_stereo"):
            self._jit_stereo = jax.jit(self._step_program_stereo)
        self.world = self._jit_stereo(self.world, jnp.asarray(ext))
        self._last_ts = timestamp
        return None
