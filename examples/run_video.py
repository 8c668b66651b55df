#!/usr/bin/env python3
"""Mono VO over a video file or webcam (counterpart of the reference's
video_mono.cpp / webcam.cpp, via OpenCV capture).

Usage:
  python examples/run_video.py <video-file | camera-index> --calib rig.yaml
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="video path or integer webcam index")
    ap.add_argument("--calib", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default="/tmp/svo_tpu_traj.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    import cv2
    import numpy as np
    from svo_pro_universal_tpu.cameras.rig import load_rig_yaml
    from svo_pro_universal_tpu.config import load_config
    from svo_pro_universal_tpu.evaluation import save_trajectory_tum
    from svo_pro_universal_tpu.frontend.frame_handler import FrameHandlerMono

    rig = load_rig_yaml(args.calib)
    cfg = load_config(args.config)
    handler = FrameHandlerMono(cfg, rig.cameras[0],
                               T_cam_body=rig.T_cam_body(0))

    src = int(args.source) if args.source.isdigit() else args.source
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        sys.exit(f"cannot open {args.source}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0

    stamps, poses = [], []
    k = 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and k >= args.max_frames):
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32)
        ts = k / fps
        res = handler.add_image(gray, ts)
        stamps.append(ts)
        poses.append(res.T_world_cam)
        if k % 30 == 0:
            print(f"frame {k} stage={res.stage.name} "
                  f"tracked={res.n_tracked}")
        k += 1
    cap.release()
    save_trajectory_tum(args.out, stamps, poses)
    print(f"saved {len(poses)} poses to {args.out}")


if __name__ == "__main__":
    main()
