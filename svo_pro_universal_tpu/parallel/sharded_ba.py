"""Distributed sliding-window BA: landmark blocks sharded over the mesh.

The decomposition from SURVEY.md §2.3 / BASELINE.md: each device owns a
slice of the landmark blocks (U, Hll, bl) and its observations; the reduced
camera-camera Schur system is `psum`-reduced over ICI; the small dense
state solve replicates. The reference's 2-thread Ceres solve
(ceres_backend_interface.hpp:29) becomes an N-chip data-parallel solve with
one collective per LM iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from svo_pro_universal_tpu.backend import imu_factor as imf
from svo_pro_universal_tpu.backend import window_ba as wba
from svo_pro_universal_tpu.parallel.mesh import FEATURE_AXIS
from svo_pro_universal_tpu.utils.transform import SE3


def partition_observations(w: wba.Window, n_shards: int
                           ) -> tuple[wba.Window, int]:
    """Reorder observation rows so each row sits in its landmark owner's
    shard slice (host-side, vectorized numpy — no Python row loop).
    Landmark slot ranges are contiguous: shard d owns slots
    [d·L/n, (d+1)·L/n).

    Returns (partitioned window, n_dropped): rows that overflow their
    shard's No/n-row slice are dropped and COUNTED — callers must surface
    a nonzero drop count (the distributed solve would otherwise silently
    use fewer residuals than the single-device path).
    """
    L, No = w.L, w.obs_state.shape[0]
    assert L % n_shards == 0 and No % n_shards == 0
    per_lm = L // n_shards
    per_obs = No // n_shards
    obs_lm = np.asarray(w.obs_lm)
    obs_valid = np.asarray(w.obs_valid)

    idx = np.nonzero(obs_valid)[0]
    d = obs_lm[idx] // per_lm
    in_range = (d >= 0) & (d < n_shards)
    idx, d = idx[in_range], d[in_range]
    # stable group-by shard: position within each shard's run
    order = np.argsort(d, kind="stable")
    idx_s, d_s = idx[order], d[order]
    starts = np.searchsorted(d_s, np.arange(n_shards))
    pos = np.arange(len(d_s)) - starts[d_s]
    keep = pos < per_obs
    n_dropped = int((~keep).sum()) + int((~in_range).sum())
    src = idx_s[keep]
    dst = d_s[keep] * per_obs + pos[keep]

    def scatter(x):
        a = np.asarray(x)
        out = np.zeros_like(a)
        out[dst] = a[src]
        return jnp.asarray(out)

    new_valid = np.zeros(No, dtype=bool)
    new_valid[dst] = True
    return w._replace(
        obs_state=scatter(w.obs_state), obs_lm=scatter(w.obs_lm),
        obs_f=scatter(w.obs_f), obs_valid=jnp.asarray(new_valid)), n_dropped


def comms_volume_per_solve(S: int, n_iter: int) -> dict:
    """Analytic cross-device traffic of one distributed window solve.

    Per LM iteration exactly TWO psums cross the mesh: the reduced
    camera-camera Schur system S_red [D,D] and b_red [D] (plus the
    state-block Hpp/bp/chi2 reduction in build_system — same D² order).
    Landmark blocks never move (they live on their owner shard). With a
    2-D [host × chip] mesh only the host-axis hop rides DCN. This is the
    per-solve comms accounting the weak-scaling target is judged by
    (BASELINE.md ≥70% at 2+ hosts; unmeasurable on this 1-chip env, so
    the VOLUME is reported instead)."""
    D = S * wba.DOF
    per_iter = 2 * (D * D + D) * 4            # Hpp+S_red f32 bytes
    # +1: the initial chi2 evaluation before the loop
    return dict(bytes_per_iter=per_iter,
                bytes_per_solve=per_iter * (n_iter + 1),
                state_dim=D)


def distributed_optimize(w: wba.Window, T_cam_body: SE3, focal,
                         mesh: Mesh, opts: wba.BAOptions = wba.BAOptions(),
                         axes: tuple[str, ...] = (FEATURE_AXIS,)
                         ) -> tuple[wba.Window, jax.Array]:
    """Optimize with landmarks/observations sharded over `mesh`.

    `w` must be pre-partitioned with `partition_observations(w, n)` where
    n is the product of the `axes` sizes. With a 2-D [host × chip] mesh
    (mesh.make_mesh_2d) pass axes=(HOST_AXIS, FEATURE_AXIS): landmark
    blocks stay host-local and the single psum of the reduced
    camera-camera system per LM iteration is the only traffic that
    crosses DCN — the keyframe/map-block partitioning of the reference's
    global map (SURVEY.md §5 long-context analogue)."""
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    rep = P()
    shard = P(axes)

    imu_spec = jax.tree.map(lambda _: rep, w.imu)
    in_spec = wba.Window(
        q=rep, p=rep, v=rep, bg=rep, ba=rep, state_valid=rep,
        lm_pos=shard, lm_valid=shard,
        obs_state=shard, obs_lm=shard, obs_f=shard, obs_valid=shard,
        imu=imu_spec, imu_info=rep, imu_valid=rep, zupt=rep,
        H_prior=rep, b_prior=rep, q0=rep, p0=rep, v0=rep, bg0=rep,
        ba0=rep, has_prior=rep, align_n=rep, align_log=rep,
        align_min_rel=rep)
    out_spec = (in_spec, rep)
    L_local = w.L // n

    # static shard-index arithmetic: flat index over `axes`, row-major
    sizes = [mesh.shape[a] for a in axes]

    @partial(shard_map, mesh=mesh, in_specs=(in_spec,),
             out_specs=out_spec, check_vma=False)
    def step(wl):
        flat = jnp.zeros((), jnp.int32)
        for a, s in zip(axes, sizes):
            flat = flat * s + jax.lax.axis_index(a)
        return wba.optimize(wl, T_cam_body, focal, opts,
                            axis_name=axes, lm_offset=flat * L_local)

    return step(w)
