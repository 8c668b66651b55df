"""Benchmark: mono VIO frontend throughput on a EuRoC-resolution synthetic
sequence, end-to-end through the full pipeline (pyramid, sparse align,
reproject+match, pose opt, structure opt, ring-wide depth filter, keyframe
steps, sliding-window VI bundle adjustment on keyframes), driven by the
fully on-device state machine (frontend/pipeline_vio.py). Frames feed in
batches of SVO_BENCH_BATCH (default 8): one upload + one scanned device
program per batch, zero per-frame device→host transfers, one drain at the
end. IMU measurements are synthesized consistently with the camera
trajectory by finite differences at 200 Hz.

A second section benches the FULL-SLAM configuration (VIO + loop closing
+ PGO + global map in one device step, frontend/pipeline_slam.py) on a
closed-loop trajectory: fps + verified loop closures + post-loop ATE.

Prints ONE JSON line. Headline `value` is OVERALL throughput of the VIO
configuration (including tunnel hiccups; best-chunk steady state is
reported separately — ADVICE r3). Baseline: the reference publishes no
numbers (BASELINE.md) — its capability claim is real-time EuRoC
processing, i.e. the 20 Hz camera rate, on a desktop CPU. vs_baseline is
therefore measured fps / 20.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: the fused pipeline program costs minutes
    # to compile through the axon tunnel; cached reruns start in seconds
    jax.config.update("jax_compilation_cache_dir", os.environ.get(
        "SVO_JAX_CACHE", os.path.expanduser("~/.cache/svo_jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from svo_pro_universal_tpu.cameras.projections import Camera, backproject
    from svo_pro_universal_tpu.cameras.rig import ImuParams
    from svo_pro_universal_tpu.config import Config
    from svo_pro_universal_tpu.frontend.frame_handler import Stage
    from svo_pro_universal_tpu.frontend.imu_handler import ImuHandler
    from svo_pro_universal_tpu.frontend.pipeline_vio import DevicePipelineVIO
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

    CAM_DT = 0.05                        # 20 Hz camera
    IMU_RATE = 200.0
    BATCH = int(os.environ.get("SVO_BENCH_BATCH", "8"))

    def make_sequence(twist_fn, n_frames, degrade_seed):
        """Frames (degraded), GT poses, and a consistent 200 Hz IMU
        stream by finite differences (body = camera)."""
        poses = [se3_exp(jnp.asarray(twist_fn(float(t))))
                 for t in range(n_frames)]
        frames = [np.asarray(render_j(p)).astype(np.uint8) for p in poses]
        # camera-realistic degradation (exposure drift, vignetting,
        # motion blur, sensor noise): fps/ATE are measured on DEGRADED
        # imagery, not a clean render (VERDICT r2 item 7)
        from svo_pro_universal_tpu.testing.synthetic import degrade_sequence
        frames = degrade_sequence(frames, seed=degrade_seed)

        imu_dt = 1.0 / IMU_RATE
        g_w = np.array([0.0, 0.0, -9.81])
        sub = int(IMU_RATE * CAM_DT)
        n_imu = n_frames * sub
        f_of_i = 1.0 / sub

        def pose_wb(ti):
            T = se3_exp(jnp.asarray(twist_fn(ti)))
            return np.asarray(T.inverse().as_matrix())

        mats_wb = [pose_wb(i * f_of_i) for i in range(n_imu + 2)]
        p_wb = np.stack([m[:3, 3] for m in mats_wb])
        imu_meas = []
        for i in range(n_imu):
            R0, R1 = mats_wb[i][:3, :3], mats_wb[i + 1][:3, :3]
            dR = R0.T @ R1
            w_vec = np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0],
                              dR[1, 0] - dR[0, 1]]) * 0.5 / imu_dt
            a_w = (p_wb[i + 2] - 2 * p_wb[i + 1] + p_wb[i]) / (imu_dt ** 2)
            f_b = R0.T @ (a_w - g_w)
            imu_meas.append((i * imu_dt, w_vec.astype(np.float32),
                             f_b.astype(np.float32)))
        return poses, frames, imu_meas

    class Feeder:
        """Batched feeding: IMU up to the batch end, then ONE upload +
        ONE scanned dispatch for BATCH frames (amortizes the tunnel's
        per-dispatch latency — VERDICT r3 item 2)."""

        def __init__(self, handler, imu, frames, imu_meas):
            self.h, self.imu = handler, imu
            self.frames, self.imu_meas = frames, imu_meas
            self.i_imu = 0

        def feed(self, t0, t1):
            ts_end = (t1 - 1) * CAM_DT
            while (self.i_imu < len(self.imu_meas)
                   and self.imu_meas[self.i_imu][0] <= ts_end):
                m = self.imu_meas[self.i_imu]
                self.imu.add_measurement(m[0], m[1], m[2])
                self.i_imu += 1
            if BATCH <= 1:
                for t in range(t0, t1):
                    self.h.add_image(self.frames[t], t * CAM_DT)
            else:
                for b0 in range(t0, t1, BATCH):
                    b1 = min(b0 + BATCH, t1)
                    self.h.add_images_batched(
                        [self.frames[t] for t in range(b0, b1)],
                        [t * CAM_DT for t in range(b0, b1)])

    # ====================================================================
    # Section 1: mono VIO throughput (headline)
    # ====================================================================
    cfg = Config()
    cfg.capacity.max_fts = 360
    cfg.capacity.max_kfs = 8
    cfg.capacity.max_points = 4096
    cfg.n_pyr_levels = 4
    cfg.detector.cell_size = 30
    cfg.detector.threshold_primary = 8.0
    cfg.init.init_min_disparity = 20.0
    cfg.init.reproj_error_thresh = 1.0
    # scene depth prior: the sphere+plane scene spans ~1.4-4.5 m along
    # the init rays; the measured mean INIT-FEATURE depth is ~3.4 m
    # (4.0 left the mono map 1.19x too large — visible as a persistent
    # sim3 scale offset; the reference ships calibrated per-dataset
    # depth priors the same way, map_scale in its YAML)
    cfg.init.expected_avg_depth = 3.4
    cfg.init.init_min_features = 60
    cfg.init.init_min_tracked = 40
    cfg.init.init_min_inliers = 30
    cfg.depth_filter.seed_convergence_sigma2_thresh = 60.0
    cfg.base.quality_min_fts = 20
    cfg.base.kfselect_numkfs_lower_thresh = 60
    cfg.base.kfselect_min_disparity = 30.0
    cfg.base.kfselect_min_dist_metric = 0.1
    cfg.reprojector.max_n_features_per_frame = 200
    cfg.backend.num_keyframes = 5        # reference window shape
    cfg.backend.max_iterations = 3       # (ceres_backend_interface.hpp:29)

    n_frames = 140
    warmup = 20                          # init + compile + first keyframes

    def twist(t):
        tt = min(t, 60.0)
        ph = t * 0.11
        # initialization-excitation wobble: ±2 cm at 1.2 Hz ≈ 1 m/s² of
        # acceleration variation during the first ~2.5 s, faded out by
        # 3.5 s. The r4 trajectory's acceleration was near-constant
        # (~0.01 m/s²), which makes mono-VIO scale UNOBSERVABLE — the
        # accel-bias/scale degeneracy absorbs any scale error and the
        # alignment's observability gate (correctly) refuses, so
        # scale_error was frozen at the init-prior miscalibration
        # (VERDICT r4 weak #1; measured: 2 valid factors, implied-α
        # scatter 0.4–14). EuRoC's MAV pilots fly exactly this kind of
        # excitation wiggle at sequence start to initialize VI scale; a
        # scale benchmark without any excitation measures nothing.
        ts = t * 0.05                        # seconds (CAM_DT)
        env = (1.0 if ts < 2.5 else
               0.5 * (1.0 + np.cos(np.pi * (ts - 2.5)))
               if ts < 3.5 else 0.0)
        wob = env * np.array([0.018 * np.sin(7.5 * ts),
                              0.015 * np.sin(9.1 * ts + 1.0),
                              0.012 * np.sin(8.3 * ts + 2.1)])
        return np.array([0.02 * tt * np.cos(ph * 0.15) + wob[0],
                         0.01 * np.sin(ph * 0.9) + wob[1],
                         0.003 * tt * 0.2 + wob[2],
                         0.002 * np.sin(ph * 0.6), 0.0003 * tt,
                         0.001 * tt], np.float32)

    poses, frames, imu_meas = make_sequence(twist, n_frames,
                                            degrade_seed=7)
    imu = ImuHandler(ImuParams())
    handler = DevicePipelineVIO(cfg, cam, imu_handler=imu,
                                imu_params=ImuParams(),
                                trace_capacity=n_frames + 1)
    fd = Feeder(handler, imu, frames, imu_meas)

    # warmup: compile + initialize; everything stays on device
    fd.feed(0, warmup)
    handler.block()

    # Timed run in 3 chunks: the axon tunnel occasionally stalls for
    # tens of ms; the best chunk is the sustained steady-state
    # throughput, the overall number includes the hiccups.
    n_timed = n_frames - warmup
    chunk_edges = [warmup + (n_timed * i) // 3 for i in range(4)]
    chunk_fps = []
    t0 = time.perf_counter()
    for ci in range(3):
        tc = time.perf_counter()
        fd.feed(chunk_edges[ci], chunk_edges[ci + 1])
        handler.block()
        dc = time.perf_counter() - tc
        chunk_fps.append((chunk_edges[ci + 1] - chunk_edges[ci]) / dc)
    dt = time.perf_counter() - t0

    # post-timing validity check: the run must actually be TRACKING
    mats, meta = handler.drain()
    stages = meta[warmup:, 0].astype(int)
    n_tracking = int((stages == Stage.TRACKING.value).sum())
    # headline = OVERALL throughput including tunnel hiccups (ADVICE r3:
    # max(chunk) over-reported vs prior rounds); best chunk is the
    # steady-state figure
    fps_overall = n_timed / dt if n_tracking >= 0.9 * n_timed else 0.0
    fps_steady = max(chunk_fps) if n_tracking >= 0.9 * n_timed else 0.0
    baseline_fps = 20.0                  # EuRoC camera rate (real-time)

    out = {
        "metric": "frontend_fps",
        "value": round(fps_overall, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_overall / baseline_fps, 3),
        "config": "mono_vio_degraded_imagery",
        "feed_batch": BATCH,
        "fps_steady_state": round(fps_steady, 2),
        "fps_chunks": [round(f, 1) for f in chunk_fps],
        "backend_keyframes": int(np.asarray(handler.world.backend_k)),
        "n_tracking": n_tracking,
        # scale diagnosis: depth_state starts at the 4.0 m prior; the
        # ratio to its final value is the net applied scale correction
        "depth_med_final": round(float(
            np.asarray(handler.world.depth_state[0])), 3),
    }

    # ---- trajectory accuracy from the SAME run (VERDICT r2 item 7) ----
    try:
        from svo_pro_universal_tpu.evaluation import ate_rmse
        first_track = int(np.argmax(
            meta[:, 0].astype(int) == Stage.TRACKING.value))
        gt = np.stack([np.asarray(p.inverse().t)
                       for p in poses[first_track:]])
        ep = mats[first_track:, :3, 3]
        rmse_sim3, a3 = ate_rmse(ep, gt, align="sim3")
        rmse_se3, _ = ate_rmse(ep, gt, align="se3")
        traj_len = float(np.linalg.norm(np.diff(gt, axis=0),
                                        axis=-1).sum())
        out["ate_m"] = round(float(rmse_sim3), 4)
        out["ate_se3_m"] = round(float(rmse_se3), 4)
        out["scale_error"] = round(abs(float(a3.s) - 1.0), 4)
        out["traj_len_m"] = round(traj_len, 2)
    except Exception as e:
        out["ate_error"] = str(e)[:200]

    # ====================================================================
    # Section 2: FULL-SLAM configuration on a closed-loop trajectory
    # (VIO + loop closing + PGO + global map in ONE device step —
    # VERDICT r3 item 1). Metric: fps + verified loops + post-loop ATE.
    # ====================================================================
    if os.environ.get("SVO_BENCH_SLAM", "1") != "0":
        try:
            from svo_pro_universal_tpu.frontend.pipeline_slam import (
                DevicePipelineSLAM, SlamOptions)

            P_LOOP = 64                  # frames per lap (3.2 s)
            r_loop = 0.35

            def loop_twist(t):
                a = 2.0 * np.pi * t / P_LOOP
                return np.array([
                    r_loop * np.sin(a), 0.05 * np.sin(2 * a),
                    0.5 * r_loop * (1.0 - np.cos(a)),
                    0.02 * np.sin(a), 0.03 * np.sin(a), 0.0], np.float32)

            n_slam = 160                 # ~2.5 laps
            warm_slam = 16
            poses2, frames2, imu2 = make_sequence(loop_twist, n_slam,
                                                  degrade_seed=11)
            imu_s = ImuHandler(ImuParams())
            so = SlamOptions(max_db_keyframes=128, max_nodes=128,
                             gm_landmarks=384, min_temporal_gap=6,
                             min_similarity=0.75, min_inliers=15)
            slam = DevicePipelineSLAM(cfg, cam, imu_handler=imu_s,
                                      imu_params=ImuParams(),
                                      trace_capacity=n_slam + 1,
                                      slam_opts=so)
            fd2 = Feeder(slam, imu_s, frames2, imu2)
            fd2.feed(0, warm_slam)
            slam.block()
            ts0 = time.perf_counter()
            fd2.feed(warm_slam, n_slam)
            slam.block()
            dslam = time.perf_counter() - ts0
            mats2, meta2 = slam.drain()
            st2 = meta2[:, 0].astype(int)
            n_track2 = int((st2[warm_slam:] == Stage.TRACKING.value).sum())
            stats = slam.slam_stats()
            slam_out = {
                "fps": round((n_slam - warm_slam) / dslam, 2),
                "n_tracking": n_track2,
                **stats,
            }
            try:
                from svo_pro_universal_tpu.evaluation import ate_rmse
                ft2 = int(np.argmax(st2 == Stage.TRACKING.value))
                gt2 = np.stack([np.asarray(p.inverse().t)
                                for p in poses2[ft2:]])
                ep2 = mats2[ft2:, :3, 3]
                rmse2, _ = ate_rmse(ep2, gt2, align="sim3")
                slam_out["ate_m"] = round(float(rmse2), 4)
                slam_out["traj_len_m"] = round(float(np.linalg.norm(
                    np.diff(gt2, axis=0), axis=-1).sum()), 2)
            except Exception as e:
                slam_out["ate_error"] = str(e)[:120]
            out["slam"] = slam_out
        except Exception as e:
            out["slam_error"] = str(e)[:200]

    # ---- per-stage device throughput + roofline (VERDICT r2 item 1) ----
    if os.environ.get("SVO_BENCH_STAGES", "1") != "0":
        try:
            from svo_pro_universal_tpu.ops.pallas_tiles import \
                pallas_supported
            from svo_pro_universal_tpu.utils import stage_profile as sp
            w = handler.world
            prof = None
            for attempt in range(3):     # the remote-compile tunnel can
                try:                     # drop a response transiently
                    prof = sp.profile_frontend(
                        handler, w.ring, w.pool, w.last_frame,
                        w.depth_state, reps=32)
                    break
                except Exception:
                    if attempt == 2:
                        raise
                    time.sleep(5.0)
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

    # ---- sliding-window BA throughput (VERDICT r2 item 2) --------------
    if os.environ.get("SVO_BENCH_BA", "1") != "0":
        try:
            from svo_pro_universal_tpu.backend import window_ba as wba
            from svo_pro_universal_tpu.testing.synthetic import \
                synthetic_ba_window
            from svo_pro_universal_tpu.utils.stage_profile import \
                _time_marginal
            from svo_pro_universal_tpu.utils.transform import SE3
            wball = synthetic_ba_window(S=8, n_landmarks=200, L=256,
                                        No=1024, obs_per_state=120)
            ba_opts = wba.BAOptions(max_iter=3)
            Tcb = SE3.identity()
            focal = jnp.asarray(460.0)

            def body_ba(w):
                w2, chi = wba.optimize(w, Tcb, focal, ba_opts)
                # re-anchor at the synthetic problem, keep a data dep
                return jax.tree.map(
                    lambda a, b: a + 0.0 * jnp.mean(chi)
                    if a.dtype in (jnp.float32, jnp.float64) else a,
                    wball, w2)

            t = _time_marginal(body_ba, wball, reps=24)
            out["ba_solve_ms"] = round(t * 1e3, 3)
            out["ba_iters_per_s"] = round(ba_opts.max_iter / t, 1)
            # DCN traffic accounting for the distributed solve at the
            # global-map shape (weak-scaling evidence in lieu of multi-
            # host hardware; see parallel/sharded_ba.py)
            from svo_pro_universal_tpu.parallel.sharded_ba import \
                comms_volume_per_solve
            out["dcn_comms"] = comms_volume_per_solve(S=32, n_iter=4)
        except Exception as e:
            out["ba_error"] = str(e)[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
