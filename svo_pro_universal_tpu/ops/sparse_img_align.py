"""Sparse image alignment: frame-to-frame pose by direct photometric GN.

TPU-native replacement for the reference's SparseImgAlign — CPU path
src/svo_img_align/src/sparse_img_align.cpp (run:34-113, precomputeBaseCaches
:265-318, precomputeJacobiansAndRefPatches:320-403, computeResidualsOfFrame
:405-498, computeHessianAndGradient:500-545) and the dormant CUDA port
(sparse_img_align_device_utils.cu), whose existence marks this stage as the
intended accelerator kernel. State and math follow sparse_img_align_base.h:
49-56 / sparse_img_align_base.cpp:64-75:

- optimized state is the **body/IMU relative pose** ``T_icur_iref`` plus
  affine illumination ``alpha, beta``;
- residual per patch pixel: ``I_cur·(1+alpha) + beta − I_ref``;
- inverse-compositional: template patches and an 8-dof Jacobian
  ``[(∇I·J_proj)·s, −I_ref, −1]`` are cached once per pyramid level;
- update: ``T ← T·exp(−dx[:6])``, ``alpha ← (alpha−dx6)/(1+dx6)``,
  ``beta ← (beta−dx7)/(1+dx6)``; coarse-to-fine over levels.

Sampling strategy (the TPU-specific part): per level, each feature cuts ONE
axis-aligned tile around its projected position from the current pyramid
(ops.tiles — the fast sliced-gather path); every GN iteration then samples
its 4×4 patch *inside* the tile as batched bilinear-form einsums, so the
sequential iterations contain no scattered gathers at all. Features whose
motion leaves the tile margin are masked for the level, exactly like the
reference's image-border visibility check.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.ops import tiles as tl
from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_to_matrix, se3_exp, se3_log, skew)


def _use_fused_evaluate() -> bool:
    """Fused Pallas evaluate kernel (ops/pallas_align.py) — OPT-IN via
    SVO_FUSED_ALIGN=1 on real TPU.

    Measured end-to-end on v5e (N=360, 3 levels, LM keep-best loop):
    XLA path 2.03 ms vs fused 2.31 ms per full align. The kernel itself
    is 10-15 µs per evaluate, but the stage is bound by ~30 SEQUENTIAL
    GN iterations of small dependent ops, which XLA pipelines/overlaps
    across the iteration boundary better than an opaque pallas_call
    chain. Kept as tested infrastructure (tests/test_pallas_align.py);
    the next structural win would be the whole per-level GN loop inside
    one kernel (the full CUDA-module analogue), not a fused evaluate."""
    if not os.environ.get("SVO_FUSED_ALIGN", ""):
        return False
    from svo_pro_universal_tpu.ops.pallas_tiles import pallas_supported
    return pallas_supported()

CUR_TILE = 24     # per-feature current-image tile (patch 4 + ~±9px margin)
REF_TILE = 12     # reference patch-with-border tile


class SparseImgAlignOptions(NamedTuple):
    max_level: int = 4
    min_level: int = 2
    patch_size: int = 4
    max_iter: int = 10
    estimate_alpha: bool = False
    estimate_beta: bool = False
    use_distortion_jacobian: bool = False
    min_update_squared: float = 1e-10
    prior_lambda_rot: float = 0.0
    prior_lambda_trans: float = 0.0


class CameraInput(NamedTuple):
    """Per-camera alignment inputs (mono = a 1-element list of these)."""
    pyr_ref: jax.Array        # padded [L, H, W] ref pyramid
    pyr_cur: jax.Array        # padded [L, H, W] cur pyramid
    px_ref: jax.Array         # [N, 2] feature px (level 0)
    f_ref: jax.Array          # [N, 3] unit bearings
    depth_ref: jax.Array      # [N] distance along bearing (norm, not z)
    valid: jax.Array          # [N] bool
    T_cam_body: SE3           # camera-from-IMU extrinsic
    cam: proj.Camera


class AlignState(NamedTuple):
    T_icur_iref: SE3
    alpha: jax.Array
    beta: jax.Array


class AlignStats(NamedTuple):
    chi2: jax.Array
    n_tracked: jax.Array
    n_iter_total: jax.Array


def precompute_base(inp: CameraInput, use_distortion_jacobian: bool
                    ) -> tuple[jax.Array, jax.Array]:
    """(xyz_ref [N,3], J_proj [N,2,6]): projection Jacobian w.r.t. the body
    twist, evaluated in the reference frame (reference:
    precomputeBaseCaches sparse_img_align.cpp:265-318 +
    Frame::jacobian_xyz2uv_imu frame.h:342-357)."""
    xyz_ref = inp.f_ref * inp.depth_ref[:, None]
    T_body_cam = inp.T_cam_body.inverse()
    p_imu = T_body_cam.apply(xyz_ref)                      # [N, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xyz_ref.dtype),
                           p_imu.shape[:-1] + (3, 3))
    G = jnp.concatenate([eye, -skew(p_imu)], axis=-1)      # [N, 3, 6]
    R_cam_imu = quat_to_matrix(inp.T_cam_body.q)           # [3, 3]
    RG = jnp.einsum("ij,njk->nik", R_cam_imu, G)           # [N, 3, 6]

    if use_distortion_jacobian or \
            inp.cam.projection != proj.ProjectionModel.PINHOLE:
        J_cam = proj.project_jacobian(inp.cam, xyz_ref)    # [N, 2, 3]
        J = -jnp.einsum("nij,njk->nik", J_cam, RG)
    else:
        x, y, z = xyz_ref[:, 0], xyz_ref[:, 1], xyz_ref[:, 2]
        zi = 1.0 / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
        one = jnp.ones_like(zi)
        zero = jnp.zeros_like(zi)
        J_up = jnp.stack([
            jnp.stack([one, zero, -x * zi], -1),
            jnp.stack([zero, one, -y * zi], -1)], axis=-2)  # [N, 2, 3]
        focal = inp.cam.focal_length
        J = -(zi * focal)[:, None, None] * jnp.einsum(
            "nij,njk->nik", J_up, RG)
    return xyz_ref, J


def precompute_level(inp: CameraInput, level: int, patch_size: int,
                     J_proj: jax.Array, estimate_alpha: bool,
                     estimate_beta: bool
                     ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Cache template patches + full 8-dof per-pixel Jacobian for one level
    (reference: precomputeJacobiansAndRefPatches :320-403).

    Returns (ref_patch [N,P²], jac [N,P²,8], ok_ref [N]).
    """
    n = inp.px_ref.shape[0]
    scale = 1.0 / (1 << level)
    pwb = patch_size + 2
    center_wb = (pwb - 1) / 2.0
    offs = jnp.arange(pwb, dtype=inp.px_ref.dtype) - center_wb
    ou, ov = jnp.meshgrid(offs, offs, indexing="xy")
    center = inp.px_ref * scale                            # level coords
    uv = center[:, None, None, :] + jnp.stack([ou, ov], -1)[None]
    lvl = jnp.full((n,), level, jnp.int32)
    tb = tl.extract_tiles(inp.pyr_ref, lvl,
                          jnp.stack([center[:, 1], center[:, 0]], -1),
                          REF_TILE, REF_TILE)
    flat = uv.reshape(n, pwb * pwb, 2)
    vals, inb = tl.tile_bilinear(tb, flat[..., 1], flat[..., 0])
    patch_wb = vals.reshape(n, pwb, pwb)
    ok = jnp.all(inb, axis=-1)

    val = patch_wb[:, 1:-1, 1:-1]
    dx = 0.5 * (patch_wb[:, 1:-1, 2:] - patch_wb[:, 1:-1, :-2])
    dy = 0.5 * (patch_wb[:, 2:, 1:-1] - patch_wb[:, :-2, 1:-1])
    area = patch_size * patch_size
    val = val.reshape(n, area)
    dx = dx.reshape(n, area)
    dy = dy.reshape(n, area)

    Jp = (dx[..., None] * J_proj[:, None, 0, :]
          + dy[..., None] * J_proj[:, None, 1, :]) * scale  # [N,P²,6]
    Ja = (-val if estimate_alpha else jnp.zeros_like(val))[..., None]
    Jb = (jnp.full_like(val, -1.0) if estimate_beta
          else jnp.zeros_like(val))[..., None]
    jac = jnp.concatenate([Jp, Ja, Jb], axis=-1)            # [N,P²,8]
    return val, jac, ok


def extract_cur_tiles(inp: CameraInput, xyz_ref: jax.Array, T_cur_ref: SE3,
                      level: int) -> tl.TileBatch:
    """Per-level tile cache around the currently-projected feature positions
    (re-centered once per level, coarse-to-fine)."""
    n = xyz_ref.shape[0]
    scale = 1.0 / (1 << level)
    xyz_cur = T_cur_ref.apply(xyz_ref)
    uv_cur, _ = proj.project(inp.cam, xyz_cur)
    c = uv_cur * scale
    lvl = jnp.full((n,), level, jnp.int32)
    return tl.extract_tiles(inp.pyr_cur, lvl,
                            jnp.stack([c[:, 1], c[:, 0]], -1),
                            CUR_TILE, CUR_TILE)


def compute_residuals(inp: CameraInput, tb: tl.TileBatch, xyz_ref: jax.Array,
                      ref_patch: jax.Array, T_cur_ref: SE3,
                      alpha: jax.Array, beta: jax.Array, level: int,
                      patch_size: int) -> tuple[jax.Array, jax.Array]:
    """(res [N,P²], visible [N]) (reference: computeResidualsOfFrame
    :405-498) — sampled inside the level's tile cache."""
    scale = 1.0 / (1 << level)
    xyz_cur = T_cur_ref.apply(xyz_ref)
    uv_cur, _ = proj.project(inp.cam, xyz_cur)
    center = (patch_size - 1) / 2.0
    offs = jnp.arange(patch_size, dtype=uv_cur.dtype) - center
    ou, ov = jnp.meshgrid(offs, offs, indexing="xy")
    n = uv_cur.shape[0]
    area = patch_size * patch_size
    pos = (uv_cur[:, None, :] * scale
           + jnp.stack([ou.ravel(), ov.ravel()], -1)[None])   # [N,P²,2]
    cur, inb = tl.tile_bilinear(tb, pos[..., 1], pos[..., 0])
    visible = (jnp.all(inb, axis=-1) & (xyz_cur[:, 2] > 0.0))
    res = cur * (1.0 + alpha) + beta - ref_patch
    return res, visible


def _state_update(state: AlignState, dx: jax.Array) -> AlignState:
    """Reference update rule (sparse_img_align_base.cpp:64-75)."""
    T = state.T_icur_iref.compose(se3_exp(-dx[:6])).normalized()
    denom = 1.0 + dx[6]
    return AlignState(
        T,
        (state.alpha - dx[6]) / denom,
        (state.beta - dx[7]) / denom,
    )


def run(
    inputs: Sequence[CameraInput],
    state0: AlignState,
    opts: SparseImgAlignOptions,
    T_prior: SE3 | None = None,
    axis_name: str | None = None,
) -> tuple[AlignState, AlignStats]:
    """Coarse-to-fine sparse image alignment over all cameras.

    T_prior: optional prior on T_icur_iref (IMU rotation / constant-velocity
    prior, reference sparse_img_align_base.cpp applyPrior:77-110) weighted by
    prior_lambda_{rot,trans} × max H diagonal.
    """
    pre = [precompute_base(inp, opts.use_distortion_jacobian)
           for inp in inputs]

    state = state0
    total_iters = jnp.asarray(0, jnp.int32)
    chi2 = jnp.asarray(0.0, jnp.float32)
    n_tracked = jnp.asarray(0, jnp.int32)

    for level in range(opts.max_level, opts.min_level - 1, -1):
        caches = []
        for inp, (xyz_ref, J_proj) in zip(inputs, pre):
            ref_patch, jac, ok = precompute_level(
                inp, level, opts.patch_size, J_proj,
                opts.estimate_alpha, opts.estimate_beta)
            T_cur_ref0 = (inp.T_cam_body.compose(state.T_icur_iref)
                          .compose(inp.T_cam_body.inverse()))
            tb = extract_cur_tiles(inp, xyz_ref, T_cur_ref0, level)
            caches.append((xyz_ref, ref_patch, jac, ok & inp.valid, tb))

        use_fused = _use_fused_evaluate()

        def evaluate(st: AlignState):
            H = jnp.zeros((8, 8), jnp.float32)
            g = jnp.zeros((8,), jnp.float32)
            c2 = jnp.asarray(0.0, jnp.float32)
            nm = jnp.asarray(0, jnp.int32)
            for inp, (xyz_ref, ref_patch, jac, ok, tb) in zip(inputs,
                                                              caches):
                T_cur_ref = (inp.T_cam_body.compose(st.T_icur_iref)
                             .compose(inp.T_cam_body.inverse()))
                if use_fused:
                    # ONE Pallas program: bilinear patch sample +
                    # residual + 8×8 normal-system reduction (the
                    # XLA path below emits ~15 small ops whose launch
                    # overheads dominate at these tensor sizes)
                    from svo_pro_universal_tpu.ops import pallas_align
                    P = opts.patch_size
                    scale = 1.0 / (1 << level)
                    xyz_cur = T_cur_ref.apply(xyz_ref)
                    uv_cur, _ = proj.project(inp.cam, xyz_cur)
                    cpy = (P - 1) / 2.0
                    ys0 = uv_cur[:, 1] * scale - cpy   # patch px (0,0)
                    xs0 = uv_cur[:, 0] * scale - cpy
                    ty = ys0 - tb.y0.astype(ys0.dtype)
                    tx = xs0 - tb.x0.astype(xs0.dtype)
                    R, T = tb.shape_rt
                    eps = 1e-6
                    lh = (tb.lh - 1).astype(ys0.dtype) - eps
                    lw = (tb.lw - 1).astype(xs0.dtype) - eps
                    vis = ((ty >= 0) & (ty + (P - 1) <= R - 1 + eps)
                           & (tx >= 0) & (tx + (P - 1) <= T - 1 + eps)
                           & (ys0 >= 0) & (ys0 + (P - 1) <= lh)
                           & (xs0 >= 0) & (xs0 + (P - 1) <= lw)
                           & (xyz_cur[:, 2] > 0.0))
                    wf = (vis & ok).astype(jnp.float32)
                    Hc, gc, c2c, nmc = pallas_align.fused_evaluate(
                        tb.tiles, ty, tx, wf, ref_patch, jac,
                        st.alpha, st.beta, P)
                    H = H + Hc
                    g = g + gc
                    c2 = c2 + c2c
                    nm = nm + nmc.astype(jnp.int32)
                    continue
                res, vis = compute_residuals(
                    inp, tb, xyz_ref, ref_patch, T_cur_ref, st.alpha,
                    st.beta, level, opts.patch_size)
                w = (vis & ok).astype(jnp.float32)[:, None]
                rw = res * w
                H = H + jnp.einsum("npi,npj->ij", jac * w[..., None], jac)
                g = g - jnp.einsum("npi,np->i", jac, rw)
                c2 = c2 + jnp.sum(rw * res)
                nm = nm + jnp.sum((vis & ok).astype(jnp.int32))
            if axis_name is not None:
                # features sharded over the mesh: reduce the normal system
                # over ICI — the collective analogue of the reference's
                # single-threaded accumulation loop
                H = jax.lax.psum(H, axis_name)
                g = jax.lax.psum(g, axis_name)
                c2 = jax.lax.psum(c2, axis_name)
                nm = jax.lax.psum(nm, axis_name)
            if not opts.estimate_alpha:
                H = H.at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            if not opts.estimate_beta:
                H = H.at[7, 7].set(1.0)
                g = g.at[7].set(0.0)
            c2 = c2 / jnp.maximum(nm, 1)
            if T_prior is not None and (opts.prior_lambda_rot > 0
                                        or opts.prior_lambda_trans > 0):
                # e: T·exp(e) = T_prior  → prior drives dx = −e
                e = se3_log(st.T_icur_iref.inverse().compose(T_prior))
                # floor keeps the prior active when photometric info vanishes
                h_t = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(H)[:3])), 1.0)
                h_r = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(H)[3:6])), 1.0)
                lam = jnp.concatenate([
                    jnp.full((3,), opts.prior_lambda_trans) * h_t,
                    jnp.full((3,), opts.prior_lambda_rot) * h_r,
                    jnp.zeros((2,))])
                e8 = jnp.concatenate([e, jnp.zeros((2,))])
                H = H + jnp.diag(lam)
                g = g - lam * e8
                c2 = c2 + jnp.sum(lam * e8 * e8)  # keep-best sees the prior
            return H, g, c2, nm

        # LM-damped GN with keep-best: ONE evaluate per iteration — the
        # normal system of an accepted candidate doubles as the next
        # iteration's linearization (reference mini solver, mu0 = 0.1)
        def cond(carry):
            _, _, _, _, _, it, done = carry
            return (it < opts.max_iter) & (~done)

        def body(carry):
            st, Hg, best_chi2, best_st, mu, it, _ = carry
            H, g = Hg
            diag = jnp.diagonal(H)
            Hd = H + jnp.diag(mu * diag + 1e-8)
            # unrolled 8×8 Cholesky: linalg.solve takes the generic LU
            # path (~19 µs/call, ×~30 GN iterations per frame)
            dx = tl.solve_psd_small(Hd, g, damping=0.0)
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            cand = _state_update(st, dx)
            H_new, g_new, c2_new, _ = evaluate(cand)
            improved = c2_new < best_chi2
            best_st = jax.tree.map(
                lambda a, b: jnp.where(improved, a, b), cand, best_st)
            best_chi2 = jnp.where(improved, c2_new, best_chi2)
            mu = jnp.where(improved, mu * 0.5, mu * 4.0)
            st = jax.tree.map(lambda a, b: jnp.where(improved, a, b),
                              cand, st)
            Hg = jax.tree.map(lambda a, b: jnp.where(improved, a, b),
                              (H_new, g_new), (H, g))
            done = jnp.sum(dx[:6] ** 2) < opts.min_update_squared
            return st, Hg, best_chi2, best_st, mu, it + 1, done

        H0, g0, chi0, n_tracked = evaluate(state)
        init = (state, (H0, g0), chi0, state,
                jnp.asarray(0.1, jnp.float32),
                jnp.asarray(0, jnp.int32), jnp.asarray(False))
        _, _, chi2, state, _, iters, _ = jax.lax.while_loop(
            cond, body, init)
        total_iters = total_iters + iters

    return state, AlignStats(chi2, n_tracked, total_iters)


def make_state(T_icur_iref: SE3 | None = None) -> AlignState:
    if T_icur_iref is None:
        T_icur_iref = SE3.identity()
    return AlignState(T_icur_iref, jnp.asarray(0.0, jnp.float32),
                      jnp.asarray(0.0, jnp.float32))
