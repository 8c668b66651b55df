"""Backend interface: feeds keyframes to the sliding-window VI-BA and
returns corrected poses/landmarks to the frontend.

TPU-native equivalent of the reference's CeresBackendInterface /
AbstractBundleAdjustment (reference: extra/svo_ceres_backend/src/
ceres_backend_interface.cpp — addKeyframe/bundleAdjustment handshake
:200-360, optimizationLoop:597-732, loadMapFromBundleAdjustment feedback
:hpp:135; window config hpp:21-58). The optimizer thread + condvar become
a synchronous jitted optimize per keyframe (the whole LM solve is one
device program, cheaper than the thread handshake it replaces); the
mutex-guarded shared Frame/Point objects become explicit array exchange.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.backend import imu_factor as imf
from svo_pro_universal_tpu.backend import window_ba as wba
from svo_pro_universal_tpu.frontend.imu_handler import ImuHandler
from svo_pro_universal_tpu.utils.transform import SE3


class BackendResult(NamedTuple):
    T_cam_world: SE3          # corrected pose of the newest keyframe
    lm_slots_pool: np.ndarray  # pool ids of updated landmarks
    lm_pos: jax.Array          # their optimized positions
    chi2: float


class BackendInterface:
    def __init__(self, cam_focal, T_cam_body: SE3,
                 num_keyframes: int = 5, max_landmarks: int = 256,
                 max_obs: int = 1024, max_obs_per_kf: int = 120,
                 imu_params=None,
                 opts: Optional[wba.BAOptions] = None):
        self.S = num_keyframes
        self.L = max_landmarks
        self.No = max_obs
        self.max_obs_per_kf = max_obs_per_kf
        self.T_cam_body = T_cam_body
        self.focal = jnp.asarray(cam_focal)
        self.opts = opts or wba.BAOptions(max_iter=3)
        self.imu_params = imu_params
        self.window = wba.make_window(self.S, self.L, self.No)
        self.n_states = 0
        self.kf_ts: list[float] = []
        self.lid2slot: dict[int, int] = {}
        self.slot2lid: dict[int, int] = {}
        self._lm_cursor = 0
        self._obs_cursor = 0
        self._jit_opt = jax.jit(
            lambda w: wba.optimize(w, self.T_cam_body, self.focal,
                                   self.opts))
        self._jit_marg = jax.jit(
            lambda w: wba.marginalize_oldest(w, self.T_cam_body,
                                            self.focal, self.opts))

    # ------------------------------------------------------------------
    def _assign_lm_slot(self, lid: int) -> int:
        if lid in self.lid2slot:
            return self.lid2slot[lid]
        slot = self._lm_cursor % self.L
        self._lm_cursor += 1
        old = self.slot2lid.pop(slot, None)
        if old is not None:
            self.lid2slot.pop(old, None)
        self.lid2slot[lid] = slot
        self.slot2lid[slot] = lid
        return slot

    def add_keyframe(self, timestamp: float, T_cam_world: SE3,
                     landmark_ids: np.ndarray, bearings: np.ndarray,
                     lm_positions: np.ndarray,
                     imu_handler: Optional[ImuHandler] = None
                     ) -> Optional[BackendResult]:
        """Insert a keyframe (+ IMU factor since the previous one), run the
        window optimization, and return corrections.

        landmark_ids/bearings/lm_positions: per-feature arrays (host numpy)
        of the keyframe's landmark-backed features.
        """
        w = self.window
        if self.n_states == self.S:
            w = self._jit_marg(w)
            self.n_states -= 1
            self.kf_ts.pop(0)
            # observation state indices were shifted in marginalize
        k = self.n_states

        # state initialization from the frontend pose
        T_w_b = T_cam_world.inverse().compose(self.T_cam_body)
        v0 = jnp.zeros(3)
        if k > 0:
            dt = max(timestamp - self.kf_ts[-1], 1e-3)
            v0 = (T_w_b.t - w.p[k - 1]) / dt
        w = w._replace(
            q=w.q.at[k].set(T_w_b.q), p=w.p.at[k].set(T_w_b.t),
            v=w.v.at[k].set(v0),
            bg=w.bg.at[k].set(w.bg[max(k - 1, 0)]),
            ba=w.ba.at[k].set(w.ba[max(k - 1, 0)]),
            state_valid=w.state_valid.at[k].set(True))

        # IMU factor from previous keyframe
        if k > 0 and imu_handler is not None and self.imu_params is not None:
            win = imu_handler.window_between(self.kf_ts[-1], timestamp)
            factor = imf.preintegrate_with_cov(
                win, w.bg[k - 1], w.ba[k - 1],
                self.imu_params.sigma_omega_c, self.imu_params.sigma_acc_c)
            info = imf.imu_information(
                factor, self.imu_params.sigma_omega_bias_c,
                self.imu_params.sigma_acc_bias_c)
            imu = jax.tree.map(
                lambda arr, f: arr.at[k - 1].set(f), w.imu, factor)
            w = w._replace(
                imu=imu, imu_info=w.imu_info.at[k - 1].set(info),
                imu_valid=w.imu_valid.at[k - 1].set(True))

        # observations (bounded per keyframe)
        sel = np.nonzero(landmark_ids >= 0)[0][: self.max_obs_per_kf]
        obs_s, obs_l, obs_f, lm_init_slots, lm_init_pos = [], [], [], [], []
        for i in sel:
            lid = int(landmark_ids[i])
            new = lid not in self.lid2slot
            slot = self._assign_lm_slot(lid)
            if new:
                lm_init_slots.append(slot)
                lm_init_pos.append(lm_positions[i])
            obs_s.append(k)
            obs_l.append(slot)
            obs_f.append(bearings[i])
        if obs_s:
            n = len(obs_s)
            idx = (self._obs_cursor + np.arange(n)) % self.No
            self._obs_cursor += n
            w = w._replace(
                obs_state=w.obs_state.at[idx].set(
                    jnp.asarray(obs_s, jnp.int32)),
                obs_lm=w.obs_lm.at[idx].set(jnp.asarray(obs_l, jnp.int32)),
                obs_f=w.obs_f.at[idx].set(
                    jnp.asarray(np.stack(obs_f), jnp.float32)),
                obs_valid=w.obs_valid.at[idx].set(True))
        if lm_init_slots:
            s = jnp.asarray(lm_init_slots, jnp.int32)
            w = w._replace(
                lm_pos=w.lm_pos.at[s].set(
                    jnp.asarray(np.stack(lm_init_pos), jnp.float32)),
                lm_valid=w.lm_valid.at[s].set(True))

        self.n_states = k + 1
        self.kf_ts.append(timestamp)

        w, chi2 = self._jit_opt(w)
        self.window = w

        # corrections back to the frontend
        T_w_b_opt = SE3(w.q[k], w.p[k])
        T_cam_world_new = self.T_cam_body.compose(T_w_b_opt.inverse())
        slots = np.asarray(sorted(self.slot2lid.keys()), np.int32)
        pool_ids = np.asarray([self.slot2lid[s] for s in slots], np.int32)
        return BackendResult(T_cam_world_new, pool_ids,
                             self.window.lm_pos[jnp.asarray(slots)],
                             float(chi2))
