"""Map checkpoint/restore: full pipeline state to disk.

The reference only dumps keyframes+points to YAML (reference:
src/svo/src/io.cpp:22-198 saveMap/loadMap, unused by its examples). The
TPU build makes checkpointing first-class: the whole device state (keyframe
ring, landmark pool, depth state) is a pytree — saved/restored as one NPZ
snapshot, so a session can resume exactly (SURVEY.md §5 checkpoint gap).
A YAML export compatible in spirit with the reference's schema is also
provided for interop/debugging.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p.name) if hasattr(p, "name") else str(p.idx)
                       if hasattr(p, "idx") else str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, handler) -> None:
    """Snapshot a FrameHandler's device state + host scalars."""
    arrays = {}
    for name in ("ring", "pool", "last_frame"):
        obj = getattr(handler, name)
        if obj is None:
            continue
        leaves = jax.tree_util.tree_leaves(obj)
        for i, leaf in enumerate(leaves):
            arrays[f"{name}.{i}"] = np.asarray(leaf)
    arrays["_depth_state"] = np.asarray(handler._depth_state)
    meta = dict(
        stage=handler.stage.name,
        frame_count=handler.frame_count,
        frames_since_kf=handler.frames_since_kf,
        depth_median=handler.depth_median,
        depth_min=handler.depth_min,
    )
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_state(path: str, handler) -> None:
    """Restore a snapshot into a compatible handler (same capacities)."""
    from svo_pro_universal_tpu.frontend.frame_handler import Stage
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if handler.last_frame is None and "last_frame.0" in data:
        # template with the right pytree structure/shapes
        handler.last_frame = handler._make_frame(
            np.zeros((handler.cam.height, handler.cam.width), np.float32),
            0.0)
    for name in ("ring", "pool", "last_frame"):
        obj = getattr(handler, name)
        if obj is None and f"{name}.0" not in data:
            continue
        leaves, treedef = jax.tree_util.tree_flatten(obj)
        new_leaves = [jnp.asarray(data[f"{name}.{i}"])
                      for i in range(len(leaves))]
        setattr(handler, name, jax.tree_util.tree_unflatten(
            treedef, new_leaves))
    handler._depth_state = jnp.asarray(data["_depth_state"])
    handler.stage = Stage[meta["stage"]]
    handler.frame_count = meta["frame_count"]
    handler.frames_since_kf = meta["frames_since_kf"]
    handler.depth_median = meta["depth_median"]
    handler.depth_min = meta["depth_min"]


def export_map_yaml(path: str, handler) -> None:
    """Keyframe poses + valid landmarks in a YAML document (the reference's
    saveMap shape, io.cpp:22-100)."""
    import yaml
    ring, pool = handler.ring, handler.pool
    kfs = []
    valid = np.asarray(ring.valid)
    for k in range(ring.capacity):
        if not valid[k]:
            continue
        q = np.asarray(ring.frames.T_cam_world.q[k]).tolist()
        t = np.asarray(ring.frames.T_cam_world.t[k]).tolist()
        kfs.append(dict(slot=int(k),
                        frame_id=int(np.asarray(ring.frames.frame_id[k])),
                        q_cam_world=q, t_cam_world=t))
    pts = []
    pv = np.asarray(pool.valid)
    pos = np.asarray(pool.pos)
    ids = np.asarray(pool.ids)
    for i in np.nonzero(pv)[0]:
        pts.append(dict(id=int(ids[i]), pos=pos[i].tolist()))
    with open(path, "w") as f:
        yaml.safe_dump(dict(keyframes=kfs, points=pts), f)
