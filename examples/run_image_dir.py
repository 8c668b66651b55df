#!/usr/bin/env python3
"""Mono VO over a directory of images (counterpart of the reference's
image_mono.cpp + dataset/image.hpp).

Usage:
  python examples/run_image_dir.py <dir> --calib <rig.yaml> \
      [--config <params.yaml>] [--fps 20] [--out traj.txt]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("directory")
    ap.add_argument("--calib", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--fps", type=float, default=20.0)
    ap.add_argument("--out", default="/tmp/svo_tpu_traj.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    from svo_pro_universal_tpu.cameras.rig import load_rig_yaml
    from svo_pro_universal_tpu.config import load_config
    from svo_pro_universal_tpu.evaluation import save_trajectory_tum
    from svo_pro_universal_tpu.frontend.frame_handler import FrameHandlerMono
    from svo_pro_universal_tpu import native_loader as nl

    rig = load_rig_yaml(args.calib)
    cfg = load_config(args.config)
    handler = FrameHandlerMono(cfg, rig.cameras[0],
                               T_cam_body=rig.T_cam_body(0))

    exts = ("*.png", "*.jpg", "*.jpeg", "*.pgm")
    paths = sorted(p for e in exts
                   for p in glob.glob(os.path.join(args.directory, e)))
    if args.max_frames:
        paths = paths[: args.max_frames]
    print(f"{len(paths)} images")

    def load(path):
        if path.endswith(".png") and nl.native_available():
            out = nl.decode_png_gray8(open(path, "rb").read())
            if out is not None:
                return out.astype(np.float32)
        from PIL import Image
        arr = np.asarray(Image.open(path))
        return (arr.mean(-1) if arr.ndim == 3 else arr).astype(np.float32)

    stamps, poses = [], []
    for k, path in enumerate(paths):
        ts = k / args.fps
        res = handler.add_image(load(path), ts)
        stamps.append(ts)
        poses.append(res.T_world_cam)
        if k % 50 == 0:
            print(f"frame {k} stage={res.stage.name} "
                  f"tracked={res.n_tracked}")
    save_trajectory_tum(args.out, stamps, poses)
    print(f"saved {len(poses)} poses to {args.out}")


if __name__ == "__main__":
    main()
