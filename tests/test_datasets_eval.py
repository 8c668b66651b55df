"""EuRoC loader (on a generated mock dataset) + trajectory evaluation."""

import os

import numpy as np
import pytest

from svo_pro_universal_tpu.datasets.euroc import EurocDataset
from svo_pro_universal_tpu import evaluation as ev


@pytest.fixture
def mock_euroc(tmp_path):
    from PIL import Image
    root = tmp_path / "seq"
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data").mkdir(parents=True)
    (root / "mav0" / "imu0").mkdir(parents=True)
    (root / "mav0" / "state_groundtruth_estimate0").mkdir(parents=True)

    rng = np.random.default_rng(0)
    t0 = 1403636579763555584
    cam_rows = []
    for k in range(5):
        ts = t0 + k * 50_000_000
        name = f"{ts}.png"
        for cam in ("cam0", "cam1"):
            img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
            Image.fromarray(img).save(root / "mav0" / cam / "data" / name)
        cam_rows.append(f"{ts},{name}")
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data.csv").write_text(
            "#timestamp [ns],filename\n" + "\n".join(cam_rows) + "\n")

    imu_rows = ["#ts,wx,wy,wz,ax,ay,az"]
    for k in range(50):
        ts = t0 - 10_000_000 + k * 5_000_000
        imu_rows.append(f"{ts},0.01,0.02,-0.01,0.1,-0.2,9.8")
    (root / "mav0" / "imu0" / "data.csv").write_text(
        "\n".join(imu_rows) + "\n")

    gt_rows = ["#ts,px,py,pz,qw,qx,qy,qz,..."]
    for k in range(5):
        ts = t0 + k * 50_000_000
        gt_rows.append(f"{ts},{0.1 * k},{0.05 * k},0.0,1,0,0,0,0,0,0")
    (root / "mav0" / "state_groundtruth_estimate0" / "data.csv").write_text(
        "\n".join(gt_rows) + "\n")
    return str(root)


def test_euroc_loader(mock_euroc):
    ds = EurocDataset(mock_euroc)
    imgs = ds.images(0)
    assert len(imgs) == 5
    arr = imgs[0].load()
    assert arr.shape == (48, 64) and arr.dtype == np.float32
    imu = ds.imu()
    assert len(imu) == 50
    assert imu[0].acc[2] == pytest.approx(9.8)
    gt = ds.ground_truth()
    assert len(gt) == 5 and gt[2].p[0] == pytest.approx(0.2)


def test_euroc_synced_stream(mock_euroc):
    ds = EurocDataset(mock_euroc)
    events = list(ds.synced_stream(use_cam1=True))
    kinds = [e[0] for e in events]
    assert kinds.count("image") == 5
    assert kinds.count("imu") > 30
    # imu events precede the image they lead up to
    last_t = -np.inf
    for e in events:
        t = e[1].timestamp
        assert t >= last_t - 1e-9
        last_t = t


def test_umeyama_alignment_recovers_sim3(rng):
    gt = rng.uniform(-2, 2, (40, 3))
    R, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    s, t = 1.7, np.array([0.3, -1.0, 2.0])
    est = ((gt - t) @ R) / s       # inverse similarity transform
    rmse, a = ev.ate_rmse(est, gt, align="sim3")
    assert rmse < 1e-6
    assert a.s == pytest.approx(s, rel=1e-5)


def test_ate_without_alignment_sees_offset(rng):
    gt = rng.uniform(-1, 1, (20, 3))
    est = gt + np.array([0.5, 0.0, 0.0])
    rmse, _ = ev.ate_rmse(est, gt, align="none")
    assert rmse == pytest.approx(0.5, abs=1e-6)
    rmse2, _ = ev.ate_rmse(est, gt, align="se3")
    assert rmse2 < 1e-6


def test_tum_roundtrip(tmp_path):
    path = str(tmp_path / "traj.txt")
    poses = [np.eye(4) for _ in range(3)]
    for k, p in enumerate(poses):
        p[0, 3] = 0.1 * k
    ev.save_trajectory_tum(path, [0.0, 0.1, 0.2], poses)
    ts, pos = ev.load_trajectory_tum(path)
    assert len(ts) == 3
    np.testing.assert_allclose(pos[:, 0], [0.0, 0.1, 0.2], atol=1e-6)


def test_associate():
    ts_est = np.array([0.0, 0.1, 0.2, 0.35])
    ts_gt = np.array([0.01, 0.09, 0.21, 0.5])
    ie, ig = ev.associate(ts_est, ts_gt, max_dt=0.02)
    assert list(ie) == [0, 1, 2]
    assert list(ig) == [0, 1, 2]
