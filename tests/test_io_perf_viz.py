"""Checkpoint/restore, performance monitor tracefile, visualization."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu import io as sio
from svo_pro_universal_tpu import viz
from svo_pro_universal_tpu.utils.perf import (
    PerformanceMonitor, make_frontend_monitor)


def _tracked_handler():
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic_utils import CAM, render_sphere_view
    from test_pipeline_mono import make_config, trajectory
    from svo_pro_universal_tpu.frontend.frame_handler import (
        FrameHandlerMono, Stage)
    gt = trajectory(10)
    h = FrameHandlerMono(make_config(), CAM)
    for t in range(10):
        h.add_image(render_sphere_view(gt[t]), t * 0.1)
    assert h.stage == Stage.TRACKING
    return h, gt


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic_utils import CAM, render_sphere_view
    from test_pipeline_mono import make_config, trajectory
    from svo_pro_universal_tpu.frontend.frame_handler import FrameHandlerMono

    h, gt = _tracked_handler()
    path = str(tmp_path / "state.npz")
    sio.save_state(path, h)

    h2 = FrameHandlerMono(make_config(), CAM)
    sio.load_state(path, h2)
    assert h2.stage == h.stage
    np.testing.assert_allclose(np.asarray(h2.last_frame.T_cam_world.t),
                               np.asarray(h.last_frame.T_cam_world.t))
    # restored handler keeps tracking
    res = h2.add_image(render_sphere_view(trajectory(12)[10]), 1.0)
    assert res.n_tracked > 10

    # YAML map export
    ypath = str(tmp_path / "map.yaml")
    sio.export_map_yaml(ypath, h)
    import yaml
    doc = yaml.safe_load(open(ypath))
    assert len(doc["keyframes"]) >= 2
    assert len(doc["points"]) > 10


def test_perf_monitor_tracefile(tmp_path):
    pm = make_frontend_monitor(str(tmp_path))
    for frame in range(3):
        with pm.timer("frontend_time"):
            with pm.timer("sparse_img_align"):
                pass
        pm.log("timestamp", frame * 0.05)
        pm.log("repr_n_matches", 42 + frame)
        pm.write_to_file()
    pm.close()
    lines = open(tmp_path / "trace.csv").read().strip().split("\n")
    assert len(lines) == 4                      # header + 3 frames
    header = lines[0].split(",")
    assert "timer_sparse_img_align" in header
    assert "repr_n_matches" in header
    row = dict(zip(header, lines[2].split(",")))
    assert float(row["repr_n_matches"]) == 43.0


def test_viz_exports(tmp_path):
    pts = np.random.default_rng(0).uniform(-1, 1, (50, 3))
    ply = str(tmp_path / "cloud.ply")
    viz.export_ply(ply, pts)
    content = open(ply).read()
    assert content.startswith("ply")
    assert "element vertex 50" in content

    traj = np.cumsum(np.random.default_rng(1).normal(0, 0.1, (30, 3)), 0)
    png = str(tmp_path / "traj.png")
    viz.plot_trajectory(png, traj, gt_positions=traj + 0.05, landmarks=pts)
    assert os.path.getsize(png) > 5000
