"""EuRoC acceptance path end-to-end (VERDICT r2 item 7): a camera-
realistic (noise + exposure drift + vignette + motion blur) synthetic
sequence is written out in the EuRoC MAV folder format (PNG images +
nanosecond CSVs), then consumed through the SAME code path the runner
uses — EurocDataset.synced_stream → FrameHandlerMono.add_image — and
evaluated with ATE + per-segment-aligned relative error."""

import os
import struct
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.datasets.euroc import EurocDataset
from svo_pro_universal_tpu.evaluation import (
    associate, ate_rmse, relative_errors)
from svo_pro_universal_tpu.frontend.frame_handler import (
    FrameHandlerMono, Stage)
from svo_pro_universal_tpu.testing.synthetic import degrade_sequence
from svo_pro_universal_tpu.utils.transform import SE3

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config, trajectory


def write_png_gray8(path: str, img: np.ndarray) -> None:
    """Minimal 8-bit grayscale PNG writer (zlib from the stdlib)."""
    h, w = img.shape
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(tag, data):
        c = tag + data
        return (struct.pack(">I", len(data)) + c
                + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def _write_euroc(root, frames, poses, ts):
    cam_dir = os.path.join(root, "mav0", "cam0", "data")
    gt_dir = os.path.join(root, "mav0", "state_groundtruth_estimate0")
    imu_dir = os.path.join(root, "mav0", "imu0")
    os.makedirs(cam_dir)
    os.makedirs(gt_dir)
    os.makedirs(imu_dir)
    with open(os.path.join(root, "mav0", "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for t, img in zip(ts, frames):
            ns = int(t * 1e9)
            name = f"{ns}.png"
            write_png_gray8(os.path.join(cam_dir, name), img)
            f.write(f"{ns},{name}\n")
    with open(os.path.join(gt_dir, "data.csv"), "w") as f:
        f.write("#timestamp, p_RS_R_x ...\n")
        for t, T in zip(ts, poses):
            Ti = T.inverse()      # T_world_cam → body==cam
            p = np.asarray(Ti.t)
            q = np.asarray(Ti.q)
            f.write(f"{int(t * 1e9)},{p[0]},{p[1]},{p[2]},"
                    f"{q[0]},{q[1]},{q[2]},{q[3]}\n")
    with open(os.path.join(imu_dir, "data.csv"), "w") as f:
        f.write("#timestamp,wx,wy,wz,ax,ay,az\n")   # empty stream is ok


@pytest.mark.slow
def test_euroc_format_roundtrip_and_tracking(tmp_path):
    n_frames = 22
    gt = trajectory(n_frames)
    clean = [np.asarray(render_sphere_view(T)).astype(np.uint8)
             for T in gt]
    frames = degrade_sequence(clean, seed=5, noise_sigma=2.0,
                              blur_px=1.0)
    ts = [t * 0.05 for t in range(n_frames)]
    _write_euroc(str(tmp_path), frames, gt, ts)

    ds = EurocDataset(str(tmp_path))
    imgs = ds.images(0)
    assert len(imgs) == n_frames
    # PNG round-trip exactness (exercises the native decoder when built)
    np.testing.assert_array_equal(imgs[0].load().astype(np.uint8),
                                  frames[0])

    cfg = make_config()
    # the incremental init tracker (r4) reaches the disparity gate with
    # an honest (lower) median than the old from-scratch search's
    # survivor-biased one; on DEGRADED imagery the young map then dips
    # to ~10 landmarks before the first seed-conversion wave lands — the
    # quality gate must ride that trough instead of cutting to RELOC
    cfg.base.quality_min_fts = 8
    handler = FrameHandlerMono(cfg, CAM)
    stamps, poses_est = [], []
    for ev in ds.synced_stream():
        if ev[0] != "image":
            continue
        s = ev[1]
        res = handler.add_image(s.load(), s.timestamp)
        stamps.append(s.timestamp)
        poses_est.append(res.T_world_cam)
    assert handler.stage == Stage.TRACKING

    gts = ds.ground_truth()
    ia, ib = associate(np.asarray(stamps),
                       np.asarray([g.timestamp for g in gts]))
    est_pos = np.stack([poses_est[i][:3, 3] for i in ia])
    gt_pos = np.stack([gts[i].p for i in ib])
    # skip pre-initialization identity poses
    start = int(np.argmax(np.linalg.norm(est_pos, axis=-1) > 1e-8))
    rmse, a = ate_rmse(est_pos[start:], gt_pos[start:], align="sim3")
    traj_len = np.linalg.norm(np.diff(gt_pos[start:], axis=0),
                              axis=-1).sum()
    assert rmse < 0.1 * max(traj_len, 0.1), (rmse, traj_len)

    rel = relative_errors(est_pos[start:] * a.s, gt_pos[start:], delta=8)
    assert len(rel) > 0 and np.median(rel) < 0.1 * max(traj_len, 0.1)


@pytest.mark.slow
def test_euroc_pushbutton_results_layout(tmp_path):
    """ONE command produces the full rpg_trajectory_evaluation results
    directory (VERDICT r3 item 8): run_euroc_vio.py --results-dir emits
    stamped_traj_estimate.txt + stamped_groundtruth.txt + eval_cfg.yaml
    + ate_summary.yaml, end-to-end from an EuRoC-layout folder."""
    import subprocess
    import sys

    n_frames = 16
    gt = trajectory(n_frames)
    clean = [np.asarray(render_sphere_view(T)).astype(np.uint8)
             for T in gt]
    frames = degrade_sequence(clean, seed=5, noise_sigma=2.0, blur_px=1.0)
    ts = [t * 0.05 for t in range(n_frames)]
    data_root = str(tmp_path / "seq")
    os.makedirs(data_root)
    _write_euroc(data_root, frames, gt, ts)

    results = str(tmp_path / "results")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               SVO_JAX_CACHE=os.environ.get(
                   "SVO_JAX_CACHE",
                   os.path.expanduser("~/.cache/svo_jax_cache")))
    # calib matching the synthetic CAM (written on the fly)
    calib = str(tmp_path / "calib.yaml")
    from synthetic_utils import H, W
    fx = float(np.asarray(CAM.intrinsics)[0])
    with open(calib, "w") as f:
        f.write(f"""cameras:
- camera:
    label: cam0
    image_width: {W}
    image_height: {H}
    type: pinhole
    intrinsics:
      cols: 1
      rows: 4
      data: [{fx}, {fx}, {W / 2}, {H / 2}]
    distortion:
      type: none
      parameters: {{cols: 1, rows: 1, data: [0.0]}}
  T_B_C:
    cols: 4
    rows: 4
    data: [1, 0, 0, 0,  0, 1, 0, 0,  0, 0, 1, 0,  0, 0, 0, 1]
""")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "run_euroc_vio.py"),
         data_root, "--calib", calib, "--results-dir", results,
         "--max-frames", str(n_frames)],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    for name in ("stamped_traj_estimate.txt", "stamped_groundtruth.txt",
                 "eval_cfg.yaml", "ate_summary.yaml"):
        assert os.path.isfile(os.path.join(results, name)), (
            name, os.listdir(results) if os.path.isdir(results) else "none")
    est = np.loadtxt(os.path.join(results, "stamped_traj_estimate.txt"))
    assert est.shape == (n_frames, 8)
    summary = open(os.path.join(results, "ate_summary.yaml")).read()
    assert "ate_rmse_sim3_m" in summary or "eval_error" in summary
