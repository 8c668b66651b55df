#!/usr/bin/env python3
"""EuRoC mono VO runner (counterpart of the reference's euroc_mono.cpp).

Usage:
  python examples/run_euroc_mono.py <dataset_root> \
      [--calib examples/param/euroc_mono.yaml] \
      [--config examples/param/pinhole.yaml] \
      [--out /tmp/svo_tpu_traj.txt] [--max-frames N] [--eval]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--calib", default=os.path.join(
        os.path.dirname(__file__), "param", "euroc_mono.yaml"))
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default="/tmp/svo_tpu_traj.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--trace-dir", default=None,
                    help="write a per-frame tracefile CSV compatible "
                         "with the reference's timing analyzers")
    args = ap.parse_args()

    from svo_pro_universal_tpu.cameras.rig import load_rig_yaml
    from svo_pro_universal_tpu.config import load_config
    from svo_pro_universal_tpu.datasets.euroc import EurocDataset
    from svo_pro_universal_tpu.evaluation import (
        associate, ate_rmse, save_trajectory_tum)
    from svo_pro_universal_tpu.frontend.frame_handler import (
        FrameHandlerMono, Stage)

    rig = load_rig_yaml(args.calib)
    cfg = load_config(args.config)
    handler = FrameHandlerMono(cfg, rig.cameras[0],
                               T_cam_body=rig.T_cam_body(0))

    # per-frame tracefile (reference: vk::PerformanceMonitor tracefile,
    # frame_handler_base.cpp:89-120; parsed by the reference's
    # analyze_vio_timing.py unchanged)
    pm = None
    if args.trace_dir:
        from svo_pro_universal_tpu.utils.perf import make_frontend_monitor
        pm = make_frontend_monitor(args.trace_dir)

    ds = EurocDataset(args.dataset)
    stamps, poses = [], []
    n = 0
    t_start = time.perf_counter()
    for ev in ds.synced_stream():
        if ev[0] != "image":
            continue
        sample = ev[1]
        if pm:
            pm.start_timer("frontend_time")
        res = handler.add_image(sample.load(), sample.timestamp)
        if pm:
            pm.stop_timer("frontend_time")
            pm.log("timestamp", sample.timestamp)
            pm.log("img_align_n_tracked",
                   handler.stats.get("align_fts", 0))
            pm.log("repr_n_matches",
                   handler.stats.get("reproj_matches", 0))
            pm.log("sfba_error_before",
                   handler.stats.get("pose_err_before", 0.0))
            pm.log("sfba_error_after",
                   handler.stats.get("pose_err_after", 0.0))
            pm.log("sfba_n_edges_final",
                   handler.stats.get("n_inliers", 0))
            pm.write_to_file()
        stamps.append(sample.timestamp)
        poses.append(res.T_world_cam)
        n += 1
        if n % 50 == 0:
            el = time.perf_counter() - t_start
            print(f"frame {n} stage={res.stage.name} "
                  f"tracked={res.n_tracked} fps={n / el:.1f}")
        if args.max_frames and n >= args.max_frames:
            break

    save_trajectory_tum(args.out, stamps, poses)
    print(f"saved {len(poses)} poses to {args.out}")

    if args.eval:
        gt = ds.ground_truth()
        ts_gt = np.asarray([g.timestamp for g in gt])
        p_gt = np.stack([g.p for g in gt])
        ie, ig = associate(np.asarray(stamps), ts_gt)
        est_pos = np.stack([poses[i][:3, 3] for i in ie])
        rmse, a = ate_rmse(est_pos, p_gt[ig], align="sim3")
        print(f"ATE RMSE (sim3-aligned): {rmse:.4f} m  scale={a.s:.3f}")


if __name__ == "__main__":
    main()
