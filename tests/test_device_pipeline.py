"""On-device state machine (frontend.pipeline) vs the host state machine.

Both drive the same jitted stage programs; the device pipeline must
initialize, track and produce a comparable trajectory — with zero per-frame
readbacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.frontend.frame_handler import (
    FrameHandlerMono, Stage)
from svo_pro_universal_tpu.frontend.pipeline import DevicePipelineMono

from synthetic_utils import CAM, render_sphere_view
from test_pipeline_mono import make_config, trajectory


def _ate(gt_pos, est_pos):
    gt_rel = gt_pos - gt_pos[0]
    est_rel = est_pos - est_pos[0]
    s = np.sum(gt_rel * est_rel) / max(np.sum(est_rel * est_rel), 1e-12)
    return np.sqrt(np.mean(np.sum((gt_rel - s * est_rel) ** 2, axis=-1))), s


@pytest.mark.slow
def test_device_pipeline_tracks_sequence():
    n_frames = 25
    gt = trajectory(n_frames)
    h = DevicePipelineMono(make_config(), CAM, trace_capacity=64)

    for t in range(n_frames):
        out = h.add_image(render_sphere_view(gt[t]), t * 0.05)
        assert out is None          # async mode: nothing comes back

    mats, meta = h.drain()
    assert mats.shape[0] == n_frames
    stages = meta[:, 0].astype(int)
    # must reach TRACKING and stay there
    first_track = int(np.argmax(stages == Stage.TRACKING.value))
    assert stages[first_track] == Stage.TRACKING.value
    assert first_track < 12
    assert (stages[first_track:] == Stage.TRACKING.value).all()
    # keyframes were selected
    assert meta[first_track:, 2].sum() >= 2

    gt_pos = np.stack([np.asarray(p.inverse().t) for p in gt[first_track:]])
    est_pos = mats[first_track:, :3, 3]
    ate, s = _ate(gt_pos, est_pos)
    traj_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=-1).sum()
    assert ate < 0.12 * max(traj_len, 0.1), (ate, traj_len, s)
    assert 0.5 < s < 2.0, s


@pytest.mark.slow
def test_device_pipeline_close_to_host_pipeline():
    """Same math, same sequence → similar trajectories."""
    n_frames = 18
    gt = trajectory(n_frames)

    host = FrameHandlerMono(make_config(), CAM)
    est_h, from_h = [], None
    for t in range(n_frames):
        res = host.add_image(render_sphere_view(gt[t]), t * 0.05)
        est_h.append(res.T_world_cam[:3, 3])
        if host.stage == Stage.TRACKING and from_h is None:
            from_h = t

    dev = DevicePipelineMono(make_config(), CAM, trace_capacity=32)
    for t in range(n_frames):
        dev.add_image(render_sphere_view(gt[t]), t * 0.05)
    mats, meta = dev.drain()
    stages = meta[:, 0].astype(int)
    from_d = int(np.argmax(stages == Stage.TRACKING.value))

    assert from_d == from_h
    d = np.linalg.norm(
        np.stack(est_h[from_h:]) - mats[from_h:, :3, 3], axis=-1)
    # same stage programs; trajectories differ only through the order of
    # PRNG splits during initialization (different RANSAC draws)
    assert np.median(d) < 0.05 and np.max(d) < 0.12, d
