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


class RingPyramid:
    """Flattened stacked pyramid of the whole ring: gathers by
    (kf slot, level, x, y) in one op (ring analogue of FlatPyramid)."""

    def __init__(self, pyramids: tuple):
        # pyramids: tuple over levels of [K, H_l, W_l]
        k = pyramids[0].shape[0]
        self.flat = jnp.concatenate(
            [lvl.reshape(k, -1) for lvl in pyramids], axis=1)  # [K, total]
        self.widths = jnp.array([l.shape[2] for l in pyramids], jnp.int32)
        self.heights = jnp.array([l.shape[1] for l in pyramids], jnp.int32)
        offs, o = [], 0
        for lvl in pyramids:
            offs.append(o)
            o += lvl.shape[1] * lvl.shape[2]
        self.offsets = jnp.array(offs, jnp.int32)

    def tree_flatten(self):
        return (self.flat, self.widths, self.heights, self.offsets), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.flat, obj.widths, obj.heights, obj.offsets = children
        return obj

    def bilinear(self, kf: jax.Array, level: jax.Array, uv: jax.Array):
        w = self.widths[level]
        h = self.heights[level]
        off = self.offsets[level]
        u, v = uv[..., 0], uv[..., 1]
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = u - u0
        fv = v - v0
        x0 = jnp.clip(u0.astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(v0.astype(jnp.int32), 0, h - 2)
        inb = (u >= 0) & (v >= 0) \
            & (u <= (w - 1).astype(u.dtype) - 1e-6) \
            & (v <= (h - 1).astype(v.dtype) - 1e-6)
        base = off + y0 * w + x0
        kfc = jnp.clip(kf, 0, self.flat.shape[0] - 1)
        i00 = self.flat[kfc, base]
        i01 = self.flat[kfc, base + 1]
        i10 = self.flat[kfc, base + w]
        i11 = self.flat[kfc, base + w + 1]
        val = ((1 - fu) * (1 - fv) * i00 + fu * (1 - fv) * i01
               + (1 - fu) * fv * i10 + fu * fv * i11)
        return jnp.where(inb, val, 0.0), inb


jax.tree_util.register_pytree_node(
    RingPyramid, RingPyramid.tree_flatten, RingPyramid.tree_unflatten)
