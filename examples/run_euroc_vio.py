#!/usr/bin/env python3
"""EuRoC mono VIO runner: IMU priors + sliding-window backend
(counterpart of the reference's euroc_mono_imu.cpp with the ceres backend).

Usage:
  python examples/run_euroc_vio.py <dataset_root> [--eval] ...
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
    ap.add_argument("--out", default="/tmp/svo_tpu_traj_vio.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--results-dir", default=None,
                    help="write the rpg_trajectory_evaluation results "
                         "layout (stamped_traj_estimate.txt, "
                         "stamped_groundtruth.txt, eval_cfg.yaml, "
                         "ate_summary.yaml) to this directory — the "
                         "push-button equivalent of the reference's "
                         "benchmark harness "
                         "(extra/svo_benchmarking/scripts/benchmark.py)")
    ap.add_argument("--device-pipeline", action="store_true",
                    help="zero-readback on-device VIO pipeline "
                         "(DevicePipelineVIO): maximum throughput, "
                         "trajectory drained once at the end")
    args = ap.parse_args()

    from svo_pro_universal_tpu.cameras.rig import load_rig_yaml
    from svo_pro_universal_tpu.config import load_config
    from svo_pro_universal_tpu.datasets.euroc import EurocDataset
    from svo_pro_universal_tpu.evaluation import (
        associate, ate_rmse, save_trajectory_tum)
    from svo_pro_universal_tpu.frontend.frame_handler import FrameHandlerVIO
    from svo_pro_universal_tpu.frontend.imu_handler import ImuHandler

    rig = load_rig_yaml(args.calib)
    cfg = load_config(args.config)
    imu = ImuHandler(rig.imu_params, rig.imu_init)
    if args.device_pipeline:
        from svo_pro_universal_tpu.frontend.pipeline_vio import \
            DevicePipelineVIO
        handler = DevicePipelineVIO(
            cfg, rig.cameras[0], T_cam_body=rig.T_cam_body(0),
            imu_handler=imu, imu_params=rig.imu_params)
    else:
        handler = FrameHandlerVIO(
            cfg, rig.cameras[0], T_cam_body=rig.T_cam_body(0),
            imu_handler=imu, imu_params=rig.imu_params)

    ds = EurocDataset(args.dataset)
    stamps, poses = [], []
    n = 0
    t_start = time.perf_counter()
    for ev in ds.synced_stream():
        if ev[0] == "imu":
            m = ev[1]
            handler.add_imu_measurement(m.timestamp, m.gyro, m.acc)
            continue
        sample = ev[1]
        res = handler.add_image(sample.load(), sample.timestamp)
        stamps.append(sample.timestamp)
        if res is not None:
            poses.append(res.T_world_cam)
        n += 1
        if n % 50 == 0 and res is not None:
            el = time.perf_counter() - t_start
            print(f"frame {n} stage={res.stage.name} "
                  f"tracked={res.n_tracked} fps={n / el:.1f}")
        if args.max_frames and n >= args.max_frames:
            break

    if args.device_pipeline:
        handler.block()
        el = time.perf_counter() - t_start
        mats, meta = handler.drain()
        poses = [mats[i] for i in range(mats.shape[0])]
        print(f"{n} frames at {n / el:.1f} fps (device pipeline)")

    save_trajectory_tum(args.out, stamps, poses)
    print(f"saved {len(poses)} poses to {args.out}")

    if args.results_dir:
        from svo_pro_universal_tpu.evaluation import write_rpg_results
        summary = write_rpg_results(
            args.results_dir, stamps, poses, ds.ground_truth(),
            align_type="sim3",
            extra_files={"experiment.yaml": args.config,
                         "calib.yaml": args.calib})
        print(f"results written to {args.results_dir}")
        for k, v in summary.items():
            print(f"  {k}: {v}")
    elif args.eval:
        gt = ds.ground_truth()
        ts_gt = np.asarray([g.timestamp for g in gt])
        p_gt = np.stack([g.p for g in gt])
        ie, ig = associate(np.asarray(stamps), ts_gt)
        est_pos = np.stack([poses[i][:3, 3] for i in ie])
        rmse, a = ate_rmse(est_pos, p_gt[ig], align="sim3")
        print(f"ATE RMSE (sim3-aligned): {rmse:.4f} m  scale={a.s:.3f}")


if __name__ == "__main__":
    main()
