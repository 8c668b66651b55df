"""Per-stage device-throughput profile of the frontend hot path.

The reference traces 10 wall-clock timers around every stage
(reference: src/svo/src/frame_handler_base.cpp:89-120 timer registration,
SVO_START_TIMER/SVO_STOP_TIMER around sparseImageAlignment:617,
projectMapInFrame, optimizePose, optimizeStructure, ...). Host timers are
meaningless for a fused single-program TPU pipeline — and on this axon
tunnel a single device→host sync costs ~25 ms, so per-stage host timing
would measure the tunnel, not the chip.

Method here: each stage is timed as K data-dependent iterations inside ONE
jitted ``lax.fori_loop`` (the carry threads a real dependence through every
iteration so XLA cannot hoist the work), with the loop dispatched once and
synced once. Marginal per-iteration time = (t(K) − t(1)) / (K − 1) — pure
device throughput, independent of dispatch/tunnel latency. The stage bodies
call the SAME `FrameHandlerMono._stage_*` methods the fused tracking step
is composed of, so the numbers attribute the real pipeline's work.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.frontend.map import overlap_mask
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp

# TPU v5e single-chip peaks (public spec): used for roofline positioning.
HBM_GBPS = 819.0
PEAK_BF16_TFLOPS = 197.0


def _time_marginal(body: Callable, carry0, reps: int = 48) -> float:
    """Marginal per-iteration seconds of `body` under a jitted fori_loop."""
    def run(c, n):
        return jax.lax.fori_loop(0, n, lambda i, cc: body(cc), c)

    fn = jax.jit(run, static_argnums=1)
    jax.block_until_ready(fn(carry0, 1))       # compile n=1
    jax.block_until_ready(fn(carry0, reps))    # compile n=reps
    t0 = time.perf_counter()
    jax.block_until_ready(fn(carry0, 1))
    t1 = time.perf_counter()
    jax.block_until_ready(fn(carry0, reps))
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 0.0) / (reps - 1)


def profile_frontend(handler, ring, pool, frame, depth_scalars,
                     reps: int = 48) -> dict:
    """Per-stage ms for the mono tracking pipeline at its real shapes.

    `handler` is a FrameHandlerMono (or subclass); ring/pool/frame a live
    (or representative) device state. Returns {stage: ms} plus roofline
    context. Stage names follow the reference tracefile schema
    (utils/perf.py FRONTEND_TIMERS).
    """
    pyr = frame.pyramid
    T_cur = frame.T_cam_world
    ov = overlap_mask(ring, T_cur, handler.cfg.reprojector.max_n_kfs)
    n_levels = handler.n_levels
    img = pyr[0]

    out = {}

    # pyramid_creation ---------------------------------------------------
    def body_pyr(im):
        p = build_pyramid(im, n_levels)
        return im + p[0, :1, :1] * 1e-12

    out["pyramid_creation"] = _time_marginal(body_pyr, img, reps)

    # sparse_img_align ---------------------------------------------------
    def body_align(carry):
        T_prior = carry
        T, stats = handler._stage_align(ring, pool, frame, pyr, T_prior)
        # re-perturb so every iteration does full coarse-to-fine work
        dx = jnp.full((6,), 1e-3) * (1.0 + stats.chi2 * 1e-12)
        return SE3.identity().compose(se3_exp(dx))

    out["sparse_img_align"] = _time_marginal(body_align, SE3.identity(),
                                             reps)

    # reproject (incl. feature_align patch refinement) -------------------
    def body_rep(T):
        fr, rep = handler._stage_reproject(ring, pool, frame, T, ov)
        return SE3(T.q, T.t + rep.n_matches * 1e-12)

    out["reproject"] = _time_marginal(body_rep, T_cur, reps)

    # pose_optimizer -----------------------------------------------------
    def body_pose(fr):
        fr2, po, _, _ = handler._stage_pose(ring, pool, fr)
        return fr2._replace(T_cam_world=SE3(
            frame.T_cam_world.q,
            frame.T_cam_world.t + po.n_inliers * 1e-12))

    out["pose_optimizer"] = _time_marginal(body_pose, frame, reps)

    # point_optimizer ----------------------------------------------------
    def body_struct(pl):
        return handler._stage_structure(ring, pl, frame)

    out["point_optimizer"] = _time_marginal(body_struct, pool, reps)

    # depth_filter -------------------------------------------------------
    def body_seeds(rg):
        rg2, _ = handler._stage_seeds(rg, pyr, T_cur, depth_scalars, ov)
        return rg2

    out["depth_filter"] = _time_marginal(body_seeds, ring, reps)

    # keyframe step (detect + seed init + insert; amortized over frames) -
    key = jax.random.PRNGKey(0)

    def body_kf(carry):
        rg, pl = carry
        rg2, pl2, _ = handler._keyframe_step(rg, pl, frame, key,
                                             depth_scalars)[:3]
        return rg2, pl2

    out["keyframe_step"] = _time_marginal(body_kf, (ring, pool),
                                          max(8, reps // 4))

    # full fused tracking step ------------------------------------------
    def body_track(carry):
        rg, pl, last = carry
        rg2, pl2, fr, _ = handler._tracking_step(
            rg, pl, last, frame, SE3.identity(), depth_scalars)
        return rg2, pl2, fr

    out["frontend_time"] = _time_marginal(body_track, (ring, pool, frame),
                                          max(8, reps // 4))
    return out


def roofline_summary(stage_ms: dict, height: int, width: int,
                     n_levels: int) -> dict:
    """Bandwidth roofline position for the image-touching stages.

    Every image-touching stage must move at least the pyramid it reads
    once from HBM; min_time = bytes / HBM peak. The ratio says how far
    from bandwidth speed-of-light the stage runs (1.0 = at the roof).
    """
    pyr_bytes = sum((height >> l) * (width >> l) * 4
                    for l in range(n_levels))
    img_bytes = height * width * 4
    sol = {}
    # pyramid: reads level0 + writes all levels
    floor_ms = (img_bytes + pyr_bytes) / (HBM_GBPS * 1e9) * 1e3
    if "pyramid_creation" in stage_ms:
        sol["pyramid_creation"] = dict(
            floor_ms=floor_ms,
            x_from_roof=stage_ms["pyramid_creation"] / max(floor_ms, 1e-9))
    # align reads the two pyramids' tiles; lower-bound with one pyramid
    floor_align = pyr_bytes / (HBM_GBPS * 1e9) * 1e3
    if "sparse_img_align" in stage_ms:
        sol["sparse_img_align"] = dict(
            floor_ms=floor_align,
            x_from_roof=stage_ms["sparse_img_align"] / max(floor_align,
                                                           1e-9))
    return sol
