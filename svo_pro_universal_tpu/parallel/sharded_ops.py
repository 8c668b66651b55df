"""Multi-chip sharded frontend ops: feature-parallel alignment + seed update.

Replaces the reference's intra-process parallelism (depth-filter worker
thread depth_filter.h:83-177, per-camera std::async reprojectors
frame_handler_base.cpp:681-695) with mesh-sharded programs:

- ``distributed_align``: features shard over the `f` mesh axis; each device
  accumulates its local 8×8 photometric normal system per GN iteration and
  the system is `psum`-reduced over ICI (ops/sparse_img_align.py takes the
  `axis_name`). The solved update is replicated, so every device carries an
  identical pose state — the classic data-parallel GN decomposition.
- ``distributed_seed_update``: embarrassingly parallel — each device
  updates its seed shard against the (replicated) current frame; only the
  counters are `psum`-reduced.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.ops import depth_filter as df_mod
from svo_pro_universal_tpu.ops import matcher as matcher_mod
from svo_pro_universal_tpu.ops import sparse_img_align as sia
from svo_pro_universal_tpu.parallel.mesh import FEATURE_AXIS
from svo_pro_universal_tpu.utils.transform import SE3


def distributed_align(
    inp: sia.CameraInput,
    state0: sia.AlignState,
    opts: sia.SparseImgAlignOptions,
    mesh: Mesh,
) -> tuple[sia.AlignState, sia.AlignStats]:
    """Sparse image alignment with features sharded across the mesh."""
    rep = P()
    shard = P(FEATURE_AXIS)
    in_spec = sia.CameraInput(
        pyr_ref=rep,
        pyr_cur=rep,
        px_ref=shard, f_ref=shard, depth_ref=shard, valid=shard,
        T_cam_body=SE3(rep, rep),
        cam=jax.tree.map(lambda _: rep, inp.cam),
    )
    state_spec = sia.AlignState(SE3(rep, rep), rep, rep)
    out_spec = (state_spec, sia.AlignStats(rep, rep, rep))

    @partial(shard_map, mesh=mesh, in_specs=(in_spec, state_spec),
             out_specs=out_spec, check_vma=False)
    def step(local_inp, st0):
        return sia.run([local_inp], st0, opts, axis_name=FEATURE_AXIS)

    return step(inp, state0)


def distributed_seed_update(
    ring_pyramid: jax.Array,      # padded [L,H,W] anchor pyramid
    cur_pyramid: jax.Array,
    cam: proj.Camera,
    T_cur_ref: SE3,
    px_ref: jax.Array,
    f_ref: jax.Array,
    grad_ref: jax.Array,
    level_ref: jax.Array,
    ftype: jax.Array,
    seed_state: jax.Array,
    seed_mu_range: jax.Array,
    mesh: Mesh,
    max_search_level: int = 2,
    sigma2_convergence_threshold: float = 200.0,
) -> df_mod.SeedUpdateResult:
    """Depth-filter update with seeds sharded across the mesh (the TPU
    answer to the reference's depth-filter worker thread)."""
    rep = P()
    shard = P(FEATURE_AXIS)
    in_specs = (
        rep, rep,
        jax.tree.map(lambda _: rep, cam), SE3(rep, rep),
        shard, shard, shard, shard, shard, shard, rep)
    out_specs = df_mod.SeedUpdateResult(shard, shard, rep, rep)

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_vma=False)
    def step(pyr_ref, pyr_cur, cam_, T, px, f, grad, lvl, ftp, seeds,
             mu_range):
        res = df_mod.update_seeds(
            pyr_ref, pyr_cur,
            cam_, cam_, T, px, f, grad, lvl, ftp, seeds, mu_range,
            max_search_level=max_search_level,
            sigma2_convergence_threshold=sigma2_convergence_threshold,
            matcher_opts=matcher_mod.MatcherOptions(max_epi_search_steps=32))
        return df_mod.SeedUpdateResult(
            res.seed_state, res.ftype,
            jax.lax.psum(res.n_updated, FEATURE_AXIS),
            jax.lax.psum(res.n_converged, FEATURE_AXIS))

    return step(ring_pyramid, cur_pyramid, cam, T_cur_ref, px_ref, f_ref,
                grad_ref, level_ref, ftype, seed_state, seed_mu_range)
