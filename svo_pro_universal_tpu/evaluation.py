"""Trajectory evaluation: SE3/Sim3 alignment, ATE/RPE, TUM-format IO.

Python equivalent of the external rpg_trajectory_evaluation toolbox the
reference's benchmarking harness relies on (reference:
extra/svo_benchmarking/README.md "Analyze the Results",
scripts/benchmark.py result layout; alignment math mirrors
src/vikit/vikit_py/src/vikit_py/align_trajectory.py — Umeyama).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class AlignmentResult(NamedTuple):
    s: float
    R: np.ndarray     # [3,3]
    t: np.ndarray     # [3]


def umeyama_alignment(est: np.ndarray, gt: np.ndarray,
                      with_scale: bool = True) -> AlignmentResult:
    """Least-squares similarity aligning est → gt. est, gt: [N,3]."""
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    e = est - mu_e
    g = gt - mu_g
    C = g.T @ e / est.shape[0]
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_e = (e ** 2).sum() / est.shape[0]
    s = float(np.trace(np.diag(D) @ S) / max(var_e, 1e-12)) \
        if with_scale else 1.0
    t = mu_g - s * R @ mu_e
    return AlignmentResult(s, R, t)


def ate_rmse(est_pos: np.ndarray, gt_pos: np.ndarray,
             align: str = "sim3") -> tuple[float, AlignmentResult]:
    """Absolute trajectory error after alignment.

    align: 'sim3' (mono — scale free), 'se3' (stereo/VIO), 'none'.
    """
    if align == "none":
        a = AlignmentResult(1.0, np.eye(3), np.zeros(3))
    else:
        a = umeyama_alignment(est_pos, gt_pos, with_scale=(align == "sim3"))
    est_aligned = (a.s * (a.R @ est_pos.T)).T + a.t
    err = np.linalg.norm(est_aligned - gt_pos, axis=-1)
    return float(np.sqrt((err ** 2).mean())), a


def relative_errors(est_pos: np.ndarray, gt_pos: np.ndarray,
                    delta: int = 10, align: str = "se3") -> np.ndarray:
    """Relative translation error over `delta`-frame sub-trajectories,
    rpg-toolbox style: EACH sub-trajectory is first aligned to the
    ground truth over its own span (se3 by default, sim3 for mono), and
    the end-point error is reported. The round-2 version compared raw
    displacement vectors without per-segment alignment — fine as a
    smoke metric, not comparable with published relative errors
    (reference: rpg_trajectory_evaluation compute_trajectory_errors)."""
    n = len(est_pos) - delta
    if n <= 0:
        return np.zeros((0,))
    errs = np.empty((n,))
    with_scale = align == "sim3"
    for i in range(n):
        e = est_pos[i:i + delta + 1]
        g = gt_pos[i:i + delta + 1]
        a = umeyama_alignment(e, g, with_scale=with_scale)
        e_end = a.s * (a.R @ e[-1]) + a.t
        errs[i] = np.linalg.norm(e_end - g[-1])
    return errs


def associate(ts_est: np.ndarray, ts_gt: np.ndarray,
              max_dt: float = 0.02) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-timestamp association. Returns index arrays (est, gt)."""
    idx_gt = np.searchsorted(ts_gt, ts_est)
    idx_gt = np.clip(idx_gt, 1, len(ts_gt) - 1)
    left = ts_gt[idx_gt - 1]
    right = ts_gt[idx_gt]
    pick = np.where(np.abs(ts_est - left) < np.abs(ts_est - right),
                    idx_gt - 1, idx_gt)
    ok = np.abs(ts_gt[pick] - ts_est) <= max_dt
    return np.nonzero(ok)[0], pick[ok]


def save_trajectory_tum(path: str, timestamps, poses) -> None:
    """poses: list of 4×4 T_world_cam. TUM format: t x y z qx qy qz qw."""
    from svo_pro_universal_tpu.utils.transform import matrix_to_quat
    import jax.numpy as jnp
    with open(path, "w") as f:
        for ts, T in zip(timestamps, poses):
            T = np.asarray(T)
            q = np.asarray(matrix_to_quat(jnp.asarray(T[:3, :3])))
            p = T[:3, 3]
            f.write(f"{ts:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")


def load_trajectory_tum(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Returns (timestamps [N], positions [N,3])."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    return data[:, 0], data[:, 1:4]
