"""Benchmark: mono VO frontend throughput on a EuRoC-resolution synthetic
sequence, end-to-end through the full pipeline (pyramid, sparse align,
reproject+match, pose opt, structure opt, ring-wide depth filter, keyframe
steps), driven by the fully on-device state machine
(frontend/pipeline.py): one async dispatch per frame, zero per-frame
device→host transfers, one drain at the end.

Prints ONE JSON line. Baseline: the reference publishes no numbers
(BASELINE.md) — its capability claim is real-time EuRoC processing, i.e.
the 20 Hz camera rate, on a desktop CPU. vs_baseline is therefore measured
fps / 20.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from svo_pro_universal_tpu.cameras.projections import Camera, backproject, project
    from svo_pro_universal_tpu.config import Config
    from svo_pro_universal_tpu.frontend.frame_handler import Stage
    from svo_pro_universal_tpu.frontend.pipeline import DevicePipelineMono
    from svo_pro_universal_tpu.utils.transform import SE3, se3_exp

    W, H = 752, 480                      # EuRoC cam0 resolution
    cam = Camera.pinhole(460.0, 460.0, W / 2, H / 2, W, H)

    # --- synthetic sphere+plane scene (exact novel-view rendering) -------
    C = jnp.array([0.0, 0.0, 2.8])
    R = 1.4
    PN = jnp.array([0.2, -0.1, 1.0])
    PD = 4.5

    def texture(p):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        smooth = (115.0 + 35.0 * jnp.sin(4.0 * x) * jnp.cos(5.0 * y)
                  + 25.0 * jnp.sin(3.0 * (x + z)))
        checker = (25.0 * jnp.sign(jnp.sin(14.0 * x + 0.7))
                   * jnp.sign(jnp.sin(14.0 * y + 0.3))
                   * jnp.sign(jnp.sin(11.0 * z + 0.5)))
        return jnp.clip(smooth + checker, 0.0, 255.0)

    def render(T_cam_world):
        yy, xx = jnp.mgrid[0:H, 0:W]
        uv = jnp.stack([xx, yy], -1).reshape(-1, 2).astype(jnp.float32)
        f = backproject(cam, uv)
        Twc = T_cam_world.inverse()
        d = Twc.rotate(f)
        oc = Twc.t - C
        b = jnp.sum(d * oc[None], axis=-1)
        c = jnp.sum(oc * oc) - R ** 2
        disc = b * b - c
        oks = disc > 0
        ts = jnp.where(oks, -b - jnp.sqrt(jnp.maximum(disc, 0.0)), -1.0)
        denom = d @ PN
        tp = (PD - jnp.dot(Twc.t, PN)) / jnp.where(jnp.abs(denom) > 1e-9,
                                                   denom, 1e-9)
        t = jnp.where(oks & (ts > 0), ts, tp)
        p = Twc.t[None] + t[:, None] * d
        return texture(p).reshape(H, W).astype(jnp.float32)

    render_j = jax.jit(render)

    cfg = Config()
    cfg.capacity.max_fts = 360
    cfg.capacity.max_kfs = 8
    cfg.capacity.max_points = 4096
    cfg.n_pyr_levels = 4
    cfg.detector.cell_size = 30
    cfg.detector.threshold_primary = 8.0
    cfg.init.init_min_disparity = 20.0
    cfg.init.reproj_error_thresh = 1.0
    cfg.init.expected_avg_depth = 2.0
    cfg.init.init_min_features = 60
    cfg.init.init_min_tracked = 40
    cfg.init.init_min_inliers = 30
    cfg.depth_filter.seed_convergence_sigma2_thresh = 60.0
    cfg.base.quality_min_fts = 20
    cfg.base.kfselect_numkfs_lower_thresh = 60
    cfg.base.kfselect_min_disparity = 30.0
    cfg.base.kfselect_min_dist_metric = 0.1
    cfg.reprojector.max_n_features_per_frame = 200

    n_frames = 140
    warmup = 20                          # init + compile + first keyframes
    poses = []
    for t in range(n_frames):
        tt = min(t, 60)                  # bounded excursion for long runs
        ph = t * 0.11
        tw = np.array([0.02 * tt * np.cos(ph * 0.15),
                       0.01 * np.sin(ph * 0.9),
                       0.003 * tt * 0.2,
                       0.002 * np.sin(ph * 0.6), 0.0003 * tt, 0.001 * tt],
                      np.float32)
        poses.append(se3_exp(jnp.asarray(tw)))
    frames = [np.asarray(render_j(p)).astype(np.uint8) for p in poses]

    handler = DevicePipelineMono(cfg, cam, trace_capacity=n_frames + 1)
    # warmup: compile + initialize; everything stays on device
    for t in range(warmup):
        handler.add_image(frames[t], t * 0.05)
    handler.block()

    t0 = time.perf_counter()
    for t in range(warmup, n_frames):
        handler.add_image(frames[t], t * 0.05)
    handler.block()                      # wait; still zero transfers
    dt = time.perf_counter() - t0

    # post-timing validity check: the run must actually be TRACKING
    mats, meta = handler.drain()
    stages = meta[warmup:, 0].astype(int)
    n_timed = n_frames - warmup
    n_tracking = int((stages == Stage.TRACKING.value).sum())
    fps = n_timed / dt if n_tracking >= 0.9 * n_timed else 0.0
    baseline_fps = 20.0                  # EuRoC camera rate (real-time claim)

    out = {
        "metric": "frontend_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }

    # ---- per-stage device throughput + roofline (VERDICT r2 item 1) ----
    # Times each _stage_* program at the live world state via marginal
    # fori-loop timing (utils/stage_profile.py). Skippable for a fast run.
    import os
    if os.environ.get("SVO_BENCH_STAGES", "1") != "0":
        try:
            from svo_pro_universal_tpu.ops.pallas_tiles import \
                pallas_supported
            from svo_pro_universal_tpu.utils import stage_profile as sp
            w = handler.world
            prof = sp.profile_frontend(
                handler, w.ring, w.pool, w.last_frame, w.depth_state,
                reps=32)
            out["stages_ms"] = {k: round(v * 1e3, 3)
                                for k, v in prof.items()}
            out["roofline"] = {
                k: {kk: round(vv, 4) for kk, vv in d.items()}
                for k, d in sp.roofline_summary(
                    {k: v * 1e3 for k, v in prof.items()},
                    H, W, cfg.n_pyr_levels).items()}
            out["pallas_tile_gather"] = bool(pallas_supported())
        except Exception as e:           # never break the primary metric
            out["stages_error"] = str(e)[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
