"""Keyframe ring: fixed-capacity stacked-FrameState map.

TPU-native replacement for the reference's Map (heap of Frame pointers with
explicit trash + eviction, reference: src/svo/include/svo/map.h:19-115,
eviction of the furthest keyframe frame_handler_mono.cpp:235-250). Here the
map is ONE pytree: every FrameState leaf gains a leading ``[MAX_KFS]`` axis
(pyramids stacked per level), plus a validity mask. Adding a keyframe is a
``tree_map`` scatter into a slot; overlap queries are masked reductions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.common.frame import FrameState
from svo_pro_universal_tpu.utils.transform import SE3


class KeyframeRing(NamedTuple):
    frames: FrameState        # every leaf has leading [K] axis
    valid: jax.Array          # [K] bool
    last_added: jax.Array     # i32 slot of the most recent keyframe

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]


def make_ring(template: FrameState, max_kfs: int) -> KeyframeRing:
    frames = jax.tree.map(
        lambda x: jnp.zeros((max_kfs,) + jnp.shape(x), jnp.asarray(x).dtype),
        template)
    return KeyframeRing(frames, jnp.zeros((max_kfs,), bool),
                        jnp.asarray(-1, jnp.int32))


def insert_keyframe(ring: KeyframeRing, frame: FrameState,
                    slot: jax.Array) -> KeyframeRing:
    """Write `frame` into ring slot (pure scatter)."""
    frames = jax.tree.map(lambda r, f: r.at[slot].set(f), ring.frames, frame)
    return KeyframeRing(frames, ring.valid.at[slot].set(True),
                        jnp.asarray(slot, jnp.int32))


def eviction_slot(ring: KeyframeRing, cur_pos_world: jax.Array) -> jax.Array:
    """Slot to write the next keyframe into: first free slot, else the
    furthest keyframe from the current camera position
    (reference: frame_handler_mono.cpp:235-250 furthest-KF eviction)."""
    k = ring.capacity
    free = ~ring.valid
    first_free = jnp.argmax(free)                      # 0 if none free
    kf_pos = ring.frames.T_cam_world.inverse().t       # [K, 3]
    d = jnp.linalg.norm(kf_pos - cur_pos_world[None], axis=-1)
    d = jnp.where(ring.valid, d, -1.0)
    furthest = jnp.argmax(d)
    return jnp.where(jnp.any(free), first_free, furthest).astype(jnp.int32)


def overlap_mask(ring: KeyframeRing, T_cur_world: SE3, n_closest: int,
                 ) -> jax.Array:
    """[K] mask of the `n_closest` valid keyframes by camera distance
    (reference: Map::getClosestNKeyframesWithOverlap map.h:92-104 — distance
    ranking; the per-keypoint overlap check is folded into reprojection
    visibility downstream)."""
    cur_pos = T_cur_world.inverse().t
    kf_pos = ring.frames.T_cam_world.inverse().t
    d = jnp.linalg.norm(kf_pos - cur_pos[None], axis=-1)
    d = jnp.where(ring.valid, d, jnp.inf)
    k = ring.capacity
    n = min(n_closest, k)
    _, idx = jax.lax.top_k(-d, n)
    mask = jnp.zeros((k,), bool).at[idx].set(True, mode="drop")
    return mask & ring.valid


def closest_keyframe_slot(ring: KeyframeRing, T_cur_world: SE3) -> jax.Array:
    cur_pos = T_cur_world.inverse().t
    kf_pos = ring.frames.T_cam_world.inverse().t
    d = jnp.linalg.norm(kf_pos - cur_pos[None], axis=-1)
    d = jnp.where(ring.valid, d, jnp.inf)
    return jnp.argmin(d).astype(jnp.int32)


