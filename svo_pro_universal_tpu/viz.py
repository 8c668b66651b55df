"""Visualization: trajectory/map plotting and point-cloud export.

Headless counterpart of the reference's Pangolin viewer
(reference: src/visualize/include/svo/viewer/viewer.h:15-40 — trajectory,
local/global landmarks, camera frustum, drawn from a polling thread). This
environment has no display; the same content renders to PNG via matplotlib
(Agg) and to PLY point clouds for external viewers.
"""

from __future__ import annotations

import numpy as np


def export_ply(path: str, points: np.ndarray,
               colors: np.ndarray | None = None) -> None:
    """Write an ASCII PLY point cloud."""
    points = np.asarray(points)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]:.5f} {points[i, 1]:.5f} {points[i, 2]:.5f}"
            if colors is not None:
                c = colors[i].astype(int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")


def plot_trajectory(path: str, est_positions, gt_positions=None,
                    landmarks=None, title: str = "trajectory") -> None:
    """Top-down (x-z) + side (x-y) trajectory plot to PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    est = np.asarray(est_positions)
    fig, axes = plt.subplots(1, 2, figsize=(11, 5))
    for ax, (i, j), name in zip(axes, [(0, 2), (0, 1)],
                                ["top-down (x-z)", "side (x-y)"]):
        if landmarks is not None and len(landmarks):
            lm = np.asarray(landmarks)
            ax.scatter(lm[:, i], lm[:, j], s=1, c="gray", alpha=0.4,
                       label="landmarks")
        ax.plot(est[:, i], est[:, j], "b-", lw=1.5, label="estimate")
        if gt_positions is not None:
            gt = np.asarray(gt_positions)
            ax.plot(gt[:, i], gt[:, j], "g--", lw=1.0, label="ground truth")
        ax.set_title(name)
        ax.axis("equal")
        ax.legend(fontsize=8)
    fig.suptitle(title)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def dump_map(handler, out_prefix: str) -> None:
    """Export the current map: landmarks PLY + keyframe trajectory PNG."""
    pool = handler.pool
    pv = np.asarray(pool.valid)
    pts = np.asarray(pool.pos)[pv]
    export_ply(out_prefix + "_landmarks.ply", pts)
    ring = handler.ring
    rv = np.asarray(ring.valid)
    kf_pos = np.asarray(ring.frames.T_cam_world.inverse().t)[rv]
    if len(kf_pos):
        plot_trajectory(out_prefix + "_trajectory.png", kf_pos,
                        landmarks=pts, title="keyframes + landmarks")
