"""SLAM pipeline: VO frontend + loop closing + pose-graph correction +
global map.

TPU-native counterpart of the reference's full (never-integrated) SLAM
wiring: keyframe handoff to loop closing (frame_handler_base.cpp:447-453
addFrameToPR), correction consumption (:368-455), PGO feed
(loop_closing.cpp:677-720), and global-map absorption (doc/global_map.md:
5-13). The detached per-keyframe threads become synchronous batched calls
(each is one fused device program); corrections apply as one rigid
world-frame transform program over the whole map state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.backend import pgo as pgo_mod
from svo_pro_universal_tpu.backend.global_map import GlobalMap, \
    GlobalMapOptions
from svo_pro_universal_tpu.backend.loop_closing import (
    LoopClosing, LoopClosingOptions, snapshot_keyframe)
from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.config import Config
from svo_pro_universal_tpu.frontend.frame_handler import (
    FrameHandlerMono, FrameResult, _feature_world_points)
from svo_pro_universal_tpu.utils.transform import SE3


class FrameHandlerSLAM(FrameHandlerMono):
    def __init__(self, cfg: Config, cam: proj.Camera,
                 T_cam_body: Optional[SE3] = None, seed: int = 0,
                 lc_opts: LoopClosingOptions = LoopClosingOptions(),
                 max_pgo_nodes: int = 256,
                 use_global_map: bool = True,
                 global_map_mesh=None,
                 global_map_mesh_axes: tuple[str, ...] | None = None):
        super().__init__(cfg, cam, T_cam_body=T_cam_body, seed=seed)
        self.loop_closer = LoopClosing(lc_opts, seed=seed)
        self.graph = pgo_mod.make_graph(max_pgo_nodes, 2 * max_pgo_nodes)
        self._pgo_n = 0
        self._pgo_c = 0
        self._kf_poses: list[SE3] = []       # T_cam_world per pgo node
        self.global_map = (GlobalMap(cam.focal_length,
                                     T_cam_body or SE3.identity(),
                                     mesh=global_map_mesh,
                                     mesh_axes=global_map_mesh_axes)
                           if use_global_map else None)
        self.n_loops_closed = 0
        self._uid2slot: dict[int, int] = {}   # unique landmark id → pool slot
        self._jit_snapshot_data = jax.jit(self._snapshot_data)
        self._jit_apply_corr = jax.jit(self._apply_correction)
        self._jit_pgo = jax.jit(
            lambda g: pgo_mod.optimize(g, max_iter=15))

    # ------------------------------------------------------------------
    def _snapshot_data(self, ring, pool, frame):
        """Feature depths + validity for the loop-closing snapshot."""
        xyz_w, has = _feature_world_points(frame, ring, pool)
        p_cam = frame.T_cam_world.apply(xyz_w)
        depth = jnp.linalg.norm(p_cam, axis=-1)
        valid = frame.valid_mask() & has & (p_cam[:, 2] > 1e-6)
        return depth, valid

    def _apply_correction(self, ring, pool, frame, dq, dt):
        """Rigid world-frame correction T_delta applied to every pose and
        landmark (reference: setCorrectionInWorld / transformMap)."""
        delta = SE3(dq, dt)                      # world_new ← world_old
        inv = delta.inverse()

        def fix_T(T: SE3) -> SE3:
            return T.compose(inv)                # T_cam_worldnew

        frames = ring.frames._replace(
            T_cam_world=fix_T(ring.frames.T_cam_world))
        pool = pool._replace(pos=delta.apply(pool.pos))
        frame = frame._replace(T_cam_world=fix_T(frame.T_cam_world))
        return ring._replace(frames=frames), pool, frame

    def _process_tracking(self, img, timestamp: float) -> FrameResult:
        res = super()._process_tracking(img, timestamp)
        if not res.is_keyframe:
            return res
        kf = self.last_frame
        depth, valid = self._jit_snapshot_data(self.ring, self.pool, kf)
        snap = snapshot_keyframe(
            kf.image, kf.px, kf.f, jnp.where(valid, depth, 0.0), valid,
            self.loop_closer.opts)
        node = self._pgo_n
        # PGO nodes store T_world_cam so relative constraints are
        # world-free: T_i⁻¹·T_j = T_cami_camj
        T_cw = jax.tree.map(lambda x: np.asarray(jax.device_get(x)),
                            kf.T_cam_world)
        T_cw = SE3(jnp.asarray(T_cw.q), jnp.asarray(T_cw.t))
        T_wc = T_cw.inverse()
        if node < self.graph.N:
            self.graph = self.graph._replace(
                q=self.graph.q.at[node].set(T_wc.q),
                t=self.graph.t.at[node].set(T_wc.t),
                node_valid=self.graph.node_valid.at[node].set(True))
            if node > 0 and self._pgo_c < self.graph.C:
                T_prev_wc = self._kf_poses[-1]
                T_ij = T_prev_wc.inverse().compose(T_wc)  # T_cami_camj
                self.graph = pgo_mod.add_constraint(
                    self.graph, self._pgo_c, node - 1, node, T_ij)
                self._pgo_c += 1
            self._kf_poses.append(T_wc)
            self._pgo_n += 1

        constraint = self.loop_closer.add_keyframe(
            node, snap, self.cam.focal_length)
        if constraint is not None and self._pgo_c < self.graph.C:
            # verified T_cur_old maps old-cam → cur-cam; with i=cur, j=old
            # the measurement is exactly T_camcur_camold = T_cur_old
            self.graph = pgo_mod.add_constraint(
                self.graph, self._pgo_c, constraint.kf_id_from,
                constraint.kf_id_to, constraint.T_cur_old,
                weight_rot=50.0, weight_trans=50.0)
            self._pgo_c += 1
            self.graph, _ = self._jit_pgo(self.graph)
            self.n_loops_closed += 1
            # correction of the latest pose → rigid map update:
            # x_new = delta·x_old with delta = T_opt_wc · T_cam_world_old
            T_opt_wc = SE3(self.graph.q[node], self.graph.t[node])
            delta = T_opt_wc.compose(T_cw)
            ring, pool, frame = self._jit_apply_corr(
                self.ring, self.pool, self.last_frame, delta.q, delta.t)
            self.ring, self.pool, self.last_frame = ring, pool, frame
            # refresh stored node poses after correction
            for i in range(len(self._kf_poses)):
                self._kf_poses[i] = SE3(self.graph.q[i], self.graph.t[i])
            self.stats["loop_closed_to"] = constraint.kf_id_to

        if self.global_map is not None:
            slots = np.asarray(jax.device_get(kf.landmark_id))
            v = np.asarray(jax.device_get(valid))
            slots = np.where(v, slots, -1)
            slotc = np.clip(slots, 0, self.pool.capacity - 1)
            # key the global map by the pool's globally-unique landmark id
            # so slot reuse in the frontend ring can't alias global states
            uids = np.asarray(jax.device_get(self.pool.ids))[slotc]
            uids = np.where(slots >= 0, uids, -1)
            for s, u in zip(slots.tolist(), uids.tolist()):
                if s >= 0 and u >= 0:
                    self._uid2slot[u] = s
            f = np.asarray(jax.device_get(kf.f))
            lm_pos = np.asarray(jax.device_get(
                self.pool.pos[jnp.asarray(slotc)]))
            chi2 = self.global_map.add_keyframe(node, T_cw, uids, f, lm_pos)
            if chi2 is not None:
                self._reinject_fixed_landmarks()
        return res

    def _reinject_fixed_landmarks(self) -> None:
        """Write globally-optimized landmark positions back into the
        frontend pool and mark them FIXED (reference: fixed-landmark
        feedback to the reprojector, frame_handler_base.cpp:662-676 +
        reprojector.h:64-69). Fixed points win reprojection-grid priority
        and are excluded from the frontend's structure GN."""
        uids, pos = self.global_map.optimized_landmarks()
        if uids.size == 0:
            return
        slots = np.asarray([self._uid2slot.get(int(u), -1) for u in uids],
                           np.int32)
        keep = slots >= 0
        if not keep.any():
            return
        s = jnp.asarray(slots[keep])
        p = jnp.asarray(pos[keep], jnp.float32)
        u = jnp.asarray(uids[keep])
        ok = self.pool.valid[s] & (self.pool.ids[s] == u)
        widx = jnp.where(ok, s, self.pool.capacity)
        self.pool = self.pool._replace(
            pos=self.pool.pos.at[widx].set(p, mode="drop"),
            fixed=self.pool.fixed.at[widx].set(True, mode="drop"))
        self.stats["n_fixed_landmarks"] = int(jnp.sum(ok))

    def _process_reloc(self, frame):
        """Relocalize against the WHOLE keyframe database via place
        recognition + 3D-2D verification before falling back to the
        closest-keyframe retry (upgrade over the reference's
        relocalizeFrame, frame_handler_mono.cpp:254-279 — its map-wide
        relocalization lived in the never-integrated loop-closing
        module's map_alignment)."""
        if len(self.loop_closer) >= 1:
            self.rng_key, k = jax.random.split(self.rng_key)
            det_frame, _ = self._jit_detect(frame, k, self._depth_scalars())
            snap = snapshot_keyframe(
                det_frame.image, det_frame.px, det_frame.f,
                jnp.zeros((self.max_fts,)), det_frame.valid_mask(),
                self.loop_closer.opts)
            cand = self.loop_closer._query(snap, include_recent=True)
            if cand is not None:
                out = self.loop_closer._verify(-1, snap, cand,
                                               self.cam.focal_length)
                if out is not None:
                    # cand.kf_id is a database ROW; once ring eviction
                    # starts, rows no longer equal node ids — map through
                    # kf_ids like _verify does (ADVICE r4 medium)
                    node_id = int(self.loop_closer.kf_ids[cand.kf_id])
                    T_old_wc = self._kf_poses[node_id]     # T_world_cam
                    T_new_cw = out.T_cur_old.compose(T_old_wc.inverse())
                    self.last_frame = self.last_frame._replace(
                        T_cam_world=T_new_cw)
                    self.stats["reloc_pr_node"] = node_id
        return super()._process_reloc(frame)

    def pgo_trajectory(self) -> np.ndarray:
        """Optimized keyframe camera positions [n, 3] (nodes are
        T_world_cam, so translations are camera centers directly)."""
        n = self._pgo_n
        return np.asarray(self.graph.t[:n])
