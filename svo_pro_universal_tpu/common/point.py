"""LandmarkPool: fixed-capacity global 3D point store.

TPU-native mirror of the reference's heap-allocated ``Point`` objects with
observation lists (reference: src/svo_common/include/svo/common/point.h:66,
obs_ list + n_failed/succeeded reprojection counters). Points live in a
preallocated ``[MAX_POINTS]`` pool; observations are (keyframe slot, feature
index) pairs in a fixed ``[MAX_OBS]`` ring per point. Allocation is a pure
function over a cursor + valid mask (free slots are reused host-side between
frames if needed).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LandmarkPool(NamedTuple):
    pos: jax.Array           # [P, 3] world position
    valid: jax.Array         # [P] bool
    ids: jax.Array           # [P] i32 globally unique id (-1 free)
    obs_kf: jax.Array        # [P, MAX_OBS] i32 keyframe ring slot (-1 empty)
    obs_idx: jax.Array       # [P, MAX_OBS] i32 feature index in that keyframe
    n_obs: jax.Array         # [P] i32 observation count (saturating)
    n_failed_reproj: jax.Array     # [P] i32
    n_succeeded_reproj: jax.Array  # [P] i32
    last_structure_optim: jax.Array  # [P] i32 frame id of last point GN
    fixed: jax.Array         # [P] bool: globally-optimized FIXED_LANDMARK
    # (reference: reprojector.h:64-69 fixed_landmark feedback — positions
    #  owned by the global map; excluded from frontend structure GN)
    cursor: jax.Array        # i32 scalar: next allocation slot
    next_id: jax.Array       # i32 scalar: next global id

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def max_obs(self) -> int:
        return self.obs_kf.shape[1]


def make_pool(max_points: int, max_obs: int, dtype=jnp.float32) -> LandmarkPool:
    return LandmarkPool(
        pos=jnp.zeros((max_points, 3), dtype),
        valid=jnp.zeros((max_points,), bool),
        ids=jnp.full((max_points,), -1, jnp.int32),
        obs_kf=jnp.full((max_points, max_obs), -1, jnp.int32),
        obs_idx=jnp.full((max_points, max_obs), -1, jnp.int32),
        n_obs=jnp.zeros((max_points,), jnp.int32),
        n_failed_reproj=jnp.zeros((max_points,), jnp.int32),
        n_succeeded_reproj=jnp.zeros((max_points,), jnp.int32),
        last_structure_optim=jnp.full((max_points,), -1, jnp.int32),
        fixed=jnp.zeros((max_points,), bool),
        cursor=jnp.asarray(0, jnp.int32),
        next_id=jnp.asarray(0, jnp.int32),
    )


def allocate(pool: LandmarkPool, positions: jax.Array,
             want: jax.Array) -> tuple[LandmarkPool, jax.Array]:
    """Allocate one pool slot per requested row of `positions`.

    positions: [K, 3]; want: [K] bool. Returns (pool, slot [K] i32; -1 where
    not allocated). Slots are taken sequentially from `cursor`, wrapping —
    the oldest points get overwritten when full (the reference instead trashes
    points explicitly; a ring achieves the same bound, map.h:19-115).
    """
    order = jnp.cumsum(want.astype(jnp.int32)) - 1          # rank among wanted
    slot = (pool.cursor + order) % pool.capacity
    n_new = jnp.sum(want.astype(jnp.int32))

    # out-of-bounds index for unwanted rows → scatter in 'drop' mode skips them
    widx = jnp.where(want, slot, pool.capacity)
    new_ids = pool.next_id + order
    k = positions.shape[0]
    pool = pool._replace(
        pos=pool.pos.at[widx].set(positions, mode="drop"),
        valid=pool.valid.at[widx].set(True, mode="drop"),
        ids=pool.ids.at[widx].set(new_ids, mode="drop"),
        obs_kf=pool.obs_kf.at[widx].set(
            jnp.full((k, pool.max_obs), -1, jnp.int32), mode="drop"),
        obs_idx=pool.obs_idx.at[widx].set(
            jnp.full((k, pool.max_obs), -1, jnp.int32), mode="drop"),
        n_obs=pool.n_obs.at[widx].set(0, mode="drop"),
        n_failed_reproj=pool.n_failed_reproj.at[widx].set(0, mode="drop"),
        n_succeeded_reproj=pool.n_succeeded_reproj.at[widx].set(0, mode="drop"),
        last_structure_optim=pool.last_structure_optim.at[widx].set(-1, mode="drop"),
        fixed=pool.fixed.at[widx].set(False, mode="drop"),
        cursor=(pool.cursor + n_new) % pool.capacity,
        next_id=pool.next_id + n_new,
    )
    return pool, jnp.where(want, slot, -1)


def invalidate_keyframe_observations(pool: LandmarkPool, kf_slot,
                                     apply) -> LandmarkPool:
    """Drop every stored observation referencing ring slot ``kf_slot``.

    MUST run whenever a keyframe-ring slot is evicted and reused:
    ``obs_kf`` stores ring SLOT indices, so stale rows silently rebind to
    the NEW occupant's pose and bearings — garbage constraints that made
    the per-frame structure GN shrink the whole map ~1.5%/frame once
    keyframe churn started (measured r5: windowed trajectory scale
    0.69 → 0.17 over 70 frames; rock-steady 0.69 with structure GN off).
    The reference's Point keeps (FramePtr, index) pairs and erases them
    on keyframe deletion (map.cpp removePtFrameRef) — this is the
    slot-pool equivalent."""
    stale = (pool.obs_kf == kf_slot) & jnp.asarray(apply)
    return pool._replace(obs_kf=jnp.where(stale, -1, pool.obs_kf))


def add_observations(pool: LandmarkPool, point_slot: jax.Array,
                     kf_slot: jax.Array, ft_idx: jax.Array,
                     mask: jax.Array, protect_first: int = 0
                     ) -> LandmarkPool:
    """Append (kf_slot, ft_idx) observations to points `point_slot` [K].

    ``protect_first``: that many leading observation slots are never
    overwritten by the ring — used for RE-observations so the anchor +
    creation pair (the landmark's widest baseline, by seed-convergence
    construction) survives while later keyframes rotate through the
    remaining slots. Letting re-observations evict them left only
    temporally-adjacent (near-zero baseline) observations and made the
    structure GN noise-dominated (measured r5: scale drift onset moved
    EARLIER when naive re-obs registration was added)."""
    n_obs_row = pool.n_obs[jnp.where(mask, point_slot, 0)]
    if protect_first > 0:
        span = max(pool.max_obs - protect_first, 1)
        ring = jnp.where(
            n_obs_row < pool.max_obs, n_obs_row % pool.max_obs,
            protect_first + (n_obs_row - protect_first) % span)
    else:
        ring = n_obs_row % pool.max_obs
    widx = jnp.where(mask, point_slot, pool.capacity)
    obs_kf = pool.obs_kf.at[widx, ring].set(kf_slot, mode="drop")
    obs_idx = pool.obs_idx.at[widx, ring].set(ft_idx, mode="drop")
    n_obs = pool.n_obs.at[widx].add(1, mode="drop")
    return pool._replace(obs_kf=obs_kf, obs_idx=obs_idx, n_obs=n_obs)
