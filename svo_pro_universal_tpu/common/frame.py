"""FrameState: fixed-capacity SoA frame pytree.

TPU-native mirror of the reference's SoA ``Frame``
(reference: src/svo_common/include/svo/common/frame.h:30,62-73 — px_vec_,
f_vec_, score_vec_, level_vec_, grad_vec_, type_vec_, track_id_vec_,
landmark ids, invmu_sigma2_a_b_vec_). Differences by design:

- Feature arrays are ``[MAX_FTS]``-padded; empty slots carry
  ``FeatureType.INVALID``. `num_features` counts the live prefix is NOT
  required — masks rule, so features may live in any slot.
- The image pyramid is ONE padded [L, H, W] float32 array (level l in the
  top-left (H>>l, W>>l) corner — see ops.pyramid), so dynamic per-feature
  level sampling is a fast sliced gather (ops.tiles).
- Pose ``T_cam_world`` (T_f_w in the reference) and the IMU-body extrinsic
  ``T_cam_body`` (T_cam_imu) ride along as SE3 leaves.
- Landmark linkage is by index into the global landmark pool
  (`landmark_id`), seed linkage by (keyframe slot, feature index) pair —
  no pointers.

The whole structure is a NamedTuple → automatically a JAX pytree: it can be
jitted over, vmapped over cameras, stacked into the keyframe ring.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.common.types import FeatureType
from svo_pro_universal_tpu.common import types as ft
from svo_pro_universal_tpu.utils.transform import SE3


class FrameState(NamedTuple):
    # --- identity ---
    frame_id: jax.Array         # i32 scalar
    timestamp: jax.Array        # f32 seconds relative to sequence start
    #   (absolute nanosecond stamps live host-side; f32 relative seconds keep
    #    sub-microsecond precision over hours without requiring x64 on TPU)
    # --- geometry ---
    T_cam_world: SE3            # camera-from-world (reference: T_f_w_)
    T_cam_body: SE3             # camera-from-IMU/body (reference: T_cam_imu)
    # --- images ---
    pyramid: jax.Array          # padded [L, H, W] float32 (ops.pyramid)
    # --- feature store, all [MAX_FTS] leading dim ---
    px: jax.Array               # [N, 2] pixel coords at level 0
    f: jax.Array                # [N, 3] unit bearing vectors
    grad: jax.Array             # [N, 2] edgelet gradient direction (unit)
    score: jax.Array            # [N] detector score
    level: jax.Array            # [N] i32 detection pyramid level
    ftype: jax.Array            # [N] i32 FeatureType code
    track_id: jax.Array         # [N] i32 (-1 = none)
    landmark_id: jax.Array      # [N] i32 index into landmark pool (-1 = none)
    seed_ref_kf: jax.Array      # [N] i32 keyframe ring slot owning the seed (-1)
    seed_ref_idx: jax.Array     # [N] i32 feature index within that keyframe
    seed_state: jax.Array       # [N, 4] [inv_mu, sigma2, a, b]
    seed_mu_range: jax.Array    # f32 scalar: 1/depth_min at seed init
    # --- misc ---
    is_keyframe: jax.Array      # bool scalar

    # ------------------------------------------------------------------
    @property
    def max_fts(self) -> int:
        return self.px.shape[0]

    @property
    def image(self) -> jax.Array:
        return self.pyramid[0]

    @property
    def img_shape(self) -> tuple[int, int]:
        return self.pyramid.shape[-2:]

    def valid_mask(self) -> jax.Array:
        return ft.is_valid(self.ftype)

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid_mask().astype(jnp.int32))

    # --- poses ---
    @property
    def T_world_cam(self) -> SE3:
        return self.T_cam_world.inverse()

    @property
    def T_body_world(self) -> SE3:
        """IMU/body-from-world (reference: T_imu_world)."""
        return self.T_cam_body.inverse().compose(self.T_cam_world)

    def pos(self) -> jax.Array:
        """Camera center in world coordinates."""
        return self.T_world_cam.t

    def set_pose_cam_world(self, T_cam_world: SE3) -> "FrameState":
        return self._replace(T_cam_world=T_cam_world)

    # --- seed geometry ---
    def seed_pos_in_frame(self, idx: jax.Array) -> jax.Array:
        """3D position (camera frame) of seed `idx` at its current mean depth
        (reference: frame.h getSeedPosInFrame)."""
        mu = jnp.maximum(self.seed_state[idx, 0], 1e-12)
        return self.f[idx] * (1.0 / mu)


def make_empty_frame(
    pyramid: jax.Array,
    max_fts: int,
    T_cam_world: SE3 | None = None,
    T_cam_body: SE3 | None = None,
    frame_id: int = -1,
    timestamp: float = 0.0,
    dtype=jnp.float32,
) -> FrameState:
    """Allocate a frame with an empty (all-INVALID) feature store."""
    n = max_fts
    if T_cam_world is None:
        T_cam_world = SE3.identity(dtype=dtype)
    if T_cam_body is None:
        T_cam_body = SE3.identity(dtype=dtype)
    return FrameState(
        frame_id=jnp.asarray(frame_id, jnp.int32),
        timestamp=jnp.asarray(timestamp, dtype),
        T_cam_world=T_cam_world,
        T_cam_body=T_cam_body,
        pyramid=jnp.asarray(pyramid),
        px=jnp.zeros((n, 2), dtype),
        f=jnp.zeros((n, 3), dtype),
        grad=jnp.zeros((n, 2), dtype),
        score=jnp.zeros((n,), dtype),
        level=jnp.zeros((n,), jnp.int32),
        ftype=jnp.full((n,), int(FeatureType.INVALID), jnp.int32),
        track_id=jnp.full((n,), -1, jnp.int32),
        landmark_id=jnp.full((n,), -1, jnp.int32),
        seed_ref_kf=jnp.full((n,), -1, jnp.int32),
        seed_ref_idx=jnp.full((n,), -1, jnp.int32),
        seed_state=jnp.zeros((n, 4), dtype),
        seed_mu_range=jnp.asarray(0.0, dtype),
        is_keyframe=jnp.asarray(False),
    )


def scene_depth_stats(frame: FrameState, points_w: jax.Array,
                      valid: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(median, min, max) scene depth of `points_w` seen from `frame`.

    Masked median over padded arrays (reference: frame.cpp:388 getSceneDepth).
    """
    p_cam = frame.T_cam_world.apply(points_w)
    z = p_cam[..., 2]
    ok = valid & (z > 1e-6)
    big = jnp.asarray(1e10, z.dtype)
    z_for_min = jnp.where(ok, z, big)
    z_for_max = jnp.where(ok, z, -big)
    z_min = jnp.min(z_for_min)
    z_max = jnp.max(z_for_max)
    # masked median: sort with invalid pushed to +inf, take index (count-1)//2
    n = jnp.sum(ok.astype(jnp.int32))
    z_sorted = jnp.sort(z_for_min)
    idx = jnp.clip((n - 1) // 2, 0, z.shape[0] - 1)
    z_med = z_sorted[idx]
    return z_med, z_min, z_max
