"""Two-view bootstrap: KLT tracking + batched RANSAC relative pose.

TPU-native replacement for the reference's initializers
(reference: src/svo/src/initialization.cpp — FivePointInit::addFrameBundle
:292-347, TwoPointInit :248-290, trackFeaturesAndCheckDisparity :86-120,
triangulateAndInitializePoints :~350-430; options initialization.h:37-95).
OpenGV's sequential RANSAC is replaced by a fully batched hypothesize-and-
verify: K hypotheses × 8-point essential estimation (SVD) scored against all
correspondences at once. The TwoPoint variant closes over an IMU rotation
prior and needs only a batched cross-product nullspace.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.ops.matcher import depth_from_triangulation
from svo_pro_universal_tpu.utils.transform import SE3, matrix_to_quat


class InitResult(NamedTuple):
    T_cur_ref: SE3            # relative pose, ‖t‖ = 1 (scale-free)
    inliers: jax.Array        # [N] bool
    depth_ref: jax.Array      # [N] triangulated depth along ref bearing
    n_inliers: jax.Array
    success: jax.Array        # bool scalar


def _essential_from_8pt(fr: jax.Array, fc: jax.Array) -> jax.Array:
    """8-point essential matrix per hypothesis.

    fr, fc: [H, 8, 3] unit bearings (ref, cur). Returns E [H, 3, 3] with the
    epipolar convention fcᵀ E fr = 0.
    """
    A = jnp.concatenate([
        fc[..., 0:1] * fr, fc[..., 1:2] * fr, fc[..., 2:3] * fr], axis=-1)
    # nullspace via eigendecomposition of AᵀA (batched, 9×9 symmetric)
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    e = vecs[..., :, 0]                      # smallest eigenvalue
    E = e.reshape(e.shape[:-1] + (3, 3))
    # project onto the essential manifold: singular values (1, 1, 0)
    U, _, Vt = jnp.linalg.svd(E)
    S = jnp.zeros_like(E).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    return U @ S @ Vt


def _decompose_essential(E: jax.Array) -> tuple[jax.Array, jax.Array]:
    """E [H,3,3] → (R [H,4,3,3], t [H,4,3]): the four (R, t) candidates."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    detU = jnp.linalg.det(U)[..., None, None]
    detV = jnp.linalg.det(Vt)[..., None, None]
    U = U * jnp.where(detU < 0, -1.0, 1.0)
    Vt = Vt * jnp.where(detV < 0, -1.0, 1.0)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    R = jnp.stack([R1, R1, R2, R2], axis=-3)
    tt = jnp.stack([t, -t, t, -t], axis=-2)
    return R, tt


def _sampson_sq(E: jax.Array, fr: jax.Array, fc: jax.Array) -> jax.Array:
    """Squared Sampson distance on the unit plane. E [...,3,3],
    fr/fc [..., N, 3] (z-normalized inside)."""
    xr = fr / jnp.where(jnp.abs(fr[..., 2:3]) > 1e-8, fr[..., 2:3], 1e-8)
    xc = fc / jnp.where(jnp.abs(fc[..., 2:3]) > 1e-8, fc[..., 2:3], 1e-8)
    Ex = jnp.einsum("...ij,...nj->...ni", E, xr)
    Etxc = jnp.einsum("...ji,...nj->...ni", E, xc)
    num = jnp.square(jnp.sum(xc * Ex, axis=-1))
    den = (jnp.square(Ex[..., 0]) + jnp.square(Ex[..., 1])
           + jnp.square(Etxc[..., 0]) + jnp.square(Etxc[..., 1]))
    return num / jnp.maximum(den, 1e-12)


def _score_pose(R: jax.Array, t: jax.Array, f_ref: jax.Array,
                f_cur: jax.Array, valid: jax.Array, thresh_sq: jax.Array
                ) -> tuple[jax.Array, jax.Array]:
    """Inlier count for candidate poses [...,3,3]/[...,3] against all
    correspondences: cheirality (positive depths) + Sampson gate."""
    T = SE3(matrix_to_quat(R), t)
    Rf = jnp.einsum("...ij,nj->...ni", R, f_ref)
    a01 = jnp.sum(Rf * f_cur, -1)
    a00 = jnp.sum(Rf * Rf, -1)
    a11 = jnp.sum(f_cur * f_cur, -1)
    det = a00 * a11 - a01 * a01
    b0 = jnp.sum(Rf * t[..., None, :], -1)
    b1 = jnp.sum(f_cur * t[..., None, :], -1)
    safe = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
    d_ref = -(a11 * b0 - a01 * b1) / safe
    d_cur = -(a01 * b0 - a00 * b1) / safe
    tx = jnp.zeros(R.shape[:-2] + (3, 3))
    tx = tx.at[..., 0, 1].set(-t[..., 2]).at[..., 0, 2].set(t[..., 1])
    tx = tx.at[..., 1, 0].set(t[..., 2]).at[..., 1, 2].set(-t[..., 0])
    tx = tx.at[..., 2, 0].set(-t[..., 1]).at[..., 2, 1].set(t[..., 0])
    E = tx @ R
    err = _sampson_sq(E, f_ref, f_cur)
    inl = valid & (d_ref > 0) & (d_cur > 0) & (err < thresh_sq)
    return jnp.sum(inl.astype(jnp.int32), axis=-1), inl


def ransac_relative_pose(
    f_ref: jax.Array,        # [N, 3] unit bearings in ref
    f_cur: jax.Array,        # [N, 3] unit bearings in cur
    valid: jax.Array,        # [N]
    key: jax.Array,
    focal_length: jax.Array,
    reproj_thresh_px: float = 2.0,
    n_hypotheses: int = 128,
) -> InitResult:
    """Batched 8-point RANSAC (replaces OpenGV CentralRelativePose 5pt
    RANSAC, initialization.cpp:292-347)."""
    n = f_ref.shape[0]
    thresh_sq = jnp.square(reproj_thresh_px / focal_length)

    # hypothesis banks sampled WITHOUT replacement (a repeated row makes
    # the minimal problem rank-deficient); mixed sample sizes — minimal 8s
    # survive outliers, 16s average noise (small-baseline E is noise-limited)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    keys = jax.random.split(key, n_hypotheses)
    all_idx = jnp.arange(n, dtype=jnp.int32)

    def draw(k, size):
        return jax.random.choice(k, all_idx, (size,), replace=False, p=p)

    h8 = n_hypotheses // 2
    idx8 = jax.vmap(lambda k: draw(k, 8))(keys[:h8])
    idx16 = jax.vmap(lambda k: draw(k, 16))(keys[h8:])

    def best_of(idx_bank):
        E = _essential_from_8pt(f_ref[idx_bank], f_cur[idx_bank])
        R, t = _decompose_essential(E)           # [H,4,3,3], [H,4,3]
        counts, _ = _score_pose(R, t, f_ref, f_cur, valid, thresh_sq)
        flat = jnp.argmax(counts.reshape(-1))
        h, c = flat // 4, flat % 4
        return R[h, c], t[h, c], counts[h, c]

    R8, t8, c8 = best_of(idx8)
    R16, t16, c16 = best_of(idx16)
    take16 = c16 >= c8
    R_best = jnp.where(take16, R16, R8)
    t_best = jnp.where(take16, t16, t8)
    n_inl, inl = _score_pose(R_best, t_best, f_ref, f_cur, valid, thresh_sq)

    # LO-RANSAC polish with threshold annealing: re-estimate E on the
    # consensus set (zeroed non-inlier rows drop out of the 9×9 normal
    # matrix) while shrinking the inlier gate toward the target threshold
    for anneal in (4.0, 2.0, 1.0, 1.0):
        gate = thresh_sq * anneal
        _, inl_gate = _score_pose(R_best, t_best, f_ref, f_cur, valid, gate)
        frz = jnp.where(inl_gate[:, None], f_ref, 0.0)[None]
        fcz = jnp.where(inl_gate[:, None], f_cur, 0.0)[None]
        E_ref = _essential_from_8pt(frz, fcz)
        R4, t4 = _decompose_essential(E_ref)
        counts4, _ = _score_pose(R4[0], t4[0], f_ref, f_cur, valid,
                                 thresh_sq)
        c4 = jnp.argmax(counts4)
        better = counts4[c4] >= n_inl
        R_best = jnp.where(better, R4[0, c4], R_best)
        t_best = jnp.where(better, t4[0, c4], t_best)
        n_inl, inl = _score_pose(R_best, t_best, f_ref, f_cur, valid,
                                 thresh_sq)

    T_cur_ref = SE3(matrix_to_quat(R_best), t_best)
    depth, tri_ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    return InitResult(T_cur_ref, inl & tri_ok, depth, n_inl,
                      n_inl > 0)


def _homography_dlt(ur: jax.Array, uc: jax.Array) -> jax.Array:
    """DLT homography per hypothesis: ur, uc [H, K, 2] unit-plane points →
    H_cur_ref [H, 3, 3] with uc ≃ H·ur (reference: vikit homography.cpp)."""
    x, y = ur[..., 0], ur[..., 1]
    xp, yp = uc[..., 0], uc[..., 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero,
                    x * xp, y * xp, xp], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one,
                    x * yp, y * yp, yp], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)            # [H, 2K, 9]
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]
    return h.reshape(h.shape[:-1] + (3, 3))


def _decompose_homography(H: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Calibrated homography H = R + t·nᵀ/d → 4 (R, t) candidates
    (Faugeras/Ma decomposition; reference: vikit homography.cpp
    computeSE3fromMatches). H [...,3,3] → (R [...,4,3,3], t [...,4,3])."""
    _, s, _ = jnp.linalg.svd(H)
    Hn = H / jnp.maximum(s[..., 1:2, None], 1e-9)     # middle sv → 1
    M = jnp.swapaxes(Hn, -1, -2) @ Hn
    w, V = jnp.linalg.eigh(M)                          # ascending
    s3, s2, s1 = w[..., 0], w[..., 1], w[..., 2]
    v1 = V[..., :, 2]
    v2 = V[..., :, 1]
    v3 = V[..., :, 0]
    a = jnp.sqrt(jnp.maximum(1.0 - s3, 0.0))
    b = jnp.sqrt(jnp.maximum(s1 - 1.0, 0.0))
    denom = jnp.sqrt(jnp.maximum(s1 - s3, 1e-12))[..., None]
    u1 = (a[..., None] * v1 + b[..., None] * v3) / denom
    u2 = (a[..., None] * v1 - b[..., None] * v3) / denom

    def rt_from(u):
        n = jnp.cross(v2, u)
        U1 = jnp.stack([v2, u, n], axis=-1)
        Hv2 = jnp.einsum("...ij,...j->...i", Hn, v2)
        Hu = jnp.einsum("...ij,...j->...i", Hn, u)
        W1 = jnp.stack([Hv2, Hu, jnp.cross(Hv2, Hu)], axis=-1)
        R = W1 @ jnp.swapaxes(U1, -1, -2)
        t = jnp.einsum("...ij,...j->...i", Hn - R, n)
        return R, t

    Ra, ta = rt_from(u1)
    Rb, tb = rt_from(u2)
    R = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    t = jnp.stack([ta, -ta, tb, -tb], axis=-2)
    return R, t


def homography_relative_pose(
    f_ref: jax.Array,
    f_cur: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    focal_length: jax.Array,
    reproj_thresh_px: float = 2.0,
    n_hypotheses: int = 64,
) -> InitResult:
    """Batched homography RANSAC init for (near-)planar scenes, where the
    essential matrix is degenerate (reference: HomographyInit
    initialization.cpp + vikit homography.cpp)."""
    n = f_ref.shape[0]
    thresh_sq = jnp.square(reproj_thresh_px / focal_length)
    ur_all = f_ref[:, 0:2] / jnp.where(
        jnp.abs(f_ref[:, 2:3]) > 1e-8, f_ref[:, 2:3], 1e-8)
    uc_all = f_cur[:, 0:2] / jnp.where(
        jnp.abs(f_cur[:, 2:3]) > 1e-8, f_cur[:, 2:3], 1e-8)

    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    keys = jax.random.split(key, n_hypotheses)
    all_idx = jnp.arange(n, dtype=jnp.int32)
    idx = jax.vmap(lambda k: jax.random.choice(
        k, all_idx, (4,), replace=False, p=p))(keys)
    Hm = _homography_dlt(ur_all[idx], uc_all[idx])     # [H,3,3]

    # score by symmetric-ish transfer error on the unit plane
    num = jnp.einsum("hij,nj->hni", Hm[:, :, :2], ur_all) + Hm[:, None, :, 2]
    uc_pred = num[..., 0:2] / jnp.where(
        jnp.abs(num[..., 2:3]) > 1e-8, num[..., 2:3], 1e-8)
    terr = jnp.sum(jnp.square(uc_pred - uc_all[None]), axis=-1)
    inl_h = valid[None] & (terr < thresh_sq)
    counts = jnp.sum(inl_h.astype(jnp.int32), axis=-1)
    hbest = jnp.argmax(counts)

    # refit on consensus, decompose, pick candidate by cheirality+Sampson
    inl0 = inl_h[hbest]
    urz = jnp.where(inl0[:, None], ur_all, 0.0)[None]
    ucz = jnp.where(inl0[:, None], uc_all, 0.0)[None]
    H_ref = _homography_dlt(urz, ucz)[0]
    R4, t4 = _decompose_homography(H_ref)
    # normalize translation (scale-free, matches essential convention)
    t4 = t4 / jnp.maximum(jnp.linalg.norm(t4, axis=-1, keepdims=True), 1e-9)
    c4, _ = _score_pose(R4, t4, f_ref, f_cur, valid, thresh_sq)
    cb = jnp.argmax(c4)
    R_best, t_best = R4[cb], t4[cb]
    n_inl, inl = _score_pose(R_best, t_best, f_ref, f_cur, valid, thresh_sq)
    T_cur_ref = SE3(matrix_to_quat(R_best), t_best)
    depth, tri_ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    return InitResult(T_cur_ref, inl & tri_ok, depth, n_inl, n_inl > 0)


def two_point_relative_pose(
    f_ref: jax.Array,
    f_cur: jax.Array,
    valid: jax.Array,
    R_cur_ref_prior: jax.Array,    # [3, 3] rotation prior (IMU gyro)
    key: jax.Array,
    focal_length: jax.Array,
    reproj_thresh_px: float = 2.0,
    n_hypotheses: int = 64,
) -> InitResult:
    """TwoPoint RANSAC with known rotation (reference TwoPointInit
    initialization.cpp:248-290): each correspondence constrains
    t ⊥ (f_cur × R·f_ref); two give t up to sign."""
    n = f_ref.shape[0]
    thresh_sq = jnp.square(reproj_thresh_px / focal_length)
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(p, 1e-12))[None, :].repeat(
            n_hypotheses * 2, 0)).reshape(n_hypotheses, 2)
    Rf = jnp.einsum("ij,nj->ni", R_cur_ref_prior, f_ref)
    c = jnp.cross(f_cur, Rf)                     # [N, 3] constraint normals
    t_hyp = jnp.cross(c[idx[:, 0]], c[idx[:, 1]])
    t_norm = jnp.linalg.norm(t_hyp, axis=-1, keepdims=True)
    t_hyp = t_hyp / jnp.maximum(t_norm, 1e-12)
    R_hyp = jnp.broadcast_to(R_cur_ref_prior, (n_hypotheses, 3, 3))
    # both signs
    R2 = jnp.stack([R_hyp, R_hyp], axis=1)
    t2 = jnp.stack([t_hyp, -t_hyp], axis=1)
    counts, _ = _score_pose(R2, t2, f_ref, f_cur, valid, thresh_sq)
    flat = jnp.argmax(counts.reshape(-1))
    h, s = flat // 2, flat % 2
    R_best, t_best = R2[h, s], t2[h, s]
    n_inl, inl = _score_pose(R_best, t_best, f_ref, f_cur, valid, thresh_sq)
    T_cur_ref = SE3(matrix_to_quat(R_best), t_best)
    depth, tri_ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    return InitResult(T_cur_ref, inl & tri_ok, depth, n_inl, n_inl > 0)


def disparity(px_ref: jax.Array, px_cur: jax.Array, valid: jax.Array
              ) -> jax.Array:
    """Median feature displacement in pixels (reference
    trackFeaturesAndCheckDisparity initialization.cpp:86-120)."""
    from svo_pro_universal_tpu.utils.robust import masked_median
    d = jnp.linalg.norm(px_cur - px_ref, axis=-1)
    return masked_median(d, valid)


def rescale_to_mean_depth(T_cur_ref: SE3, depth_ref: jax.Array,
                          inliers: jax.Array, target_depth: float
                          ) -> tuple[SE3, jax.Array, jax.Array]:
    """Fix the monocular scale so the median inlier depth equals
    `target_depth` (reference: triangulateAndInitializePoints rescaling via
    init_map_scale). Returns (T_cur_ref scaled, depths scaled, scale)."""
    from svo_pro_universal_tpu.utils.robust import masked_median
    med = masked_median(depth_ref, inliers)
    scale = target_depth / jnp.maximum(med, 1e-9)
    return (SE3(T_cur_ref.q, T_cur_ref.t * scale), depth_ref * scale, scale)
