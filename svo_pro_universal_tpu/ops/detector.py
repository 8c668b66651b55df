"""Feature detection: FAST-10 score, Shi-Tomasi, gradient/edgelet, grid NMS.

TPU-native replacement for the reference's detector stack
(reference: src/fast_neon/ — SSE2/NEON decision-tree FAST detect + score +
nonmax_3x3; src/svo_direct/src/feature_detection_utils.cpp:145-196
fastDetector, :199-268 shiTomasiDetector, :271-330 edgeletDetector_V1,
:72-142 fillFeatures; src/svo_direct/src/feature_detection.cpp FastDetector/
GradientDetector/FastGradDetector/ShiTomasiDetector).

Design (not a port): instead of the 11k-LoC generated decision trees, the
exact FAST-10 corner score is computed arithmetically for *every* pixel at
once: with d_i = I(ring_i) - I(center) over the 16-pixel Bresenham circle,

    score = max( max_j min_{i in arc10(j)}  d_i ,
                 max_j min_{i in arc10(j)} -d_i )

i.e. the largest threshold t for which a contiguous arc of 10 ring pixels is
all brighter (or all darker) than center by t — exactly the value the
reference's ``fast_corner_score_10`` binary-searches per candidate. The
circular rolling-min runs in log-steps on the VPU; grid bucketing is a
segment-max. Everything is batched full-image; no per-corner control flow.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.common.types import FeatureType

# 16-pixel Bresenham circle of radius 3, in ring order (dx, dy).
FAST_RING = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
FAST_ARC = 10  # FAST-10 (reference uses fast_corner_detect_10 on x86)


def _shift2d(img: jax.Array, dx: int, dy: int) -> jax.Array:
    """Shifted image: out[y, x] = img[y + dy, x + dx], zero-padded."""
    h, w = img.shape
    out = img
    if dy:
        out = jnp.roll(out, -dy, axis=0)
    if dx:
        out = jnp.roll(out, -dx, axis=1)
    return out


def fast_score_map(img: jax.Array) -> jax.Array:
    """Exact FAST-10 corner score for every pixel. [H, W] float32.

    Border pixels (3px) score 0.
    """
    ring = jnp.stack([_shift2d(img, dx, dy) for dx, dy in FAST_RING])
    d = ring - img[None]                      # [16, H, W]

    def circ_min10(x):
        # circular rolling min over window of 10 along axis 0 (length 16)
        m2 = jnp.minimum(x, jnp.roll(x, -1, axis=0))          # len-2 windows
        m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))        # len-4
        m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))        # len-8
        return jnp.minimum(m8, jnp.roll(m2, -8, axis=0))      # len-10

    bright = jnp.max(circ_min10(d), axis=0)
    dark = jnp.max(circ_min10(-d), axis=0)
    score = jnp.maximum(jnp.maximum(bright, dark), 0.0)

    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inner = (xx >= 3) & (xx < w - 3) & (yy >= 3) & (yy < h - 3)
    return jnp.where(inner, score, 0.0)


def shitomasi_score_map(img: jax.Array, halfbox: int = 4) -> jax.Array:
    """Shi-Tomasi (min eigenvalue of the structure tensor) per pixel.

    Mirrors vk::shiTomasiScore's central differences + (2*halfbox)² box sum
    (reference: src/vikit/vikit_common/include/vikit/vision.h shiTomasiScore).
    """
    dx = 0.5 * (_shift2d(img, 1, 0) - _shift2d(img, -1, 0))
    dy = 0.5 * (_shift2d(img, 0, 1) - _shift2d(img, 0, -1))
    box = 2 * halfbox

    def boxsum(x):
        # separable box filter via cumsum differences
        c = jnp.cumsum(x, axis=0)
        c = jnp.concatenate([c[box - 1:box], c[box:] - c[:-box]], axis=0)
        pad_r = jnp.zeros((x.shape[0] - c.shape[0], x.shape[1]), x.dtype)
        c = jnp.concatenate([c, pad_r], axis=0)
        c2 = jnp.cumsum(c, axis=1)
        c2 = jnp.concatenate([c2[:, box - 1:box], c2[:, box:] - c2[:, :-box]],
                             axis=1)
        pad_c = jnp.zeros((x.shape[0], x.shape[1] - c2.shape[1]), x.dtype)
        return jnp.concatenate([c2, pad_c], axis=1)

    dxx = boxsum(dx * dx)
    dyy = boxsum(dy * dy)
    dxy = boxsum(dx * dy)
    tr = dxx + dyy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * (dxx * dyy - dxy * dxy), 0.0))
    score = 0.5 * (tr - disc) / (2.0 * box * box)

    # score at (y, x) covers box [y-halfbox.., x-halfbox..]; center it and
    # kill the border where the box leaves the image
    score = jnp.roll(score, (halfbox, halfbox), axis=(0, 1))
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inner = ((xx >= halfbox + 1) & (xx < w - halfbox - 1)
             & (yy >= halfbox + 1) & (yy < h - halfbox - 1))
    return jnp.where(inner, score, 0.0)


def scharr_gradient(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scharr 3×3 derivative pair (dx, dy), matching cv::Scharr with scale 1
    (reference: feature_detection_utils.cpp:283-284)."""
    def s(dxo, dyo):
        return _shift2d(img, dxo, dyo)
    # Scharr x kernel: [[-3,0,3],[-10,0,10],[-3,0,3]] (correlation)
    dx = (3.0 * (s(1, -1) - s(-1, -1)) + 10.0 * (s(1, 0) - s(-1, 0))
          + 3.0 * (s(1, 1) - s(-1, 1)))
    dy = (3.0 * (s(-1, 1) - s(-1, -1)) + 10.0 * (s(0, 1) - s(0, -1))
          + 3.0 * (s(1, 1) - s(1, -1)))
    return dx, dy


def sobel_gradient(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sobel 3×3 derivative pair (reference: SobelDetector
    feature_detection.cpp — cv::Sobel path)."""
    def s(dxo, dyo):
        return _shift2d(img, dxo, dyo)
    dx = (s(1, -1) - s(-1, -1)) + 2.0 * (s(1, 0) - s(-1, 0)) \
        + (s(1, 1) - s(-1, 1))
    dy = (s(-1, 1) - s(-1, -1)) + 2.0 * (s(0, 1) - s(0, -1)) \
        + (s(1, 1) - s(1, -1))
    return dx, dy


def canny_score_map(img: jax.Array, sigma_lo: float = 50.0,
                    sigma_hi: float = 150.0) -> jax.Array:
    """Canny-style edge score: gradient magnitude with non-max suppression
    along the gradient direction + double threshold soft gate (reference:
    CannyDetector feature_detection.cpp — cv::Canny path, re-expressed as
    an arithmetic per-pixel score for the VPU)."""
    dx, dy = sobel_gradient(img)
    mag = jnp.sqrt(dx * dx + dy * dy)
    # quantize direction to 4 bins and compare against the two neighbors
    ang = jnp.arctan2(dy, dx)
    b = jnp.round(ang / (jnp.pi / 4.0)).astype(jnp.int32) % 4
    n0 = jnp.stack([_shift2d(mag, 1, 0), _shift2d(mag, 1, 1),
                    _shift2d(mag, 0, 1), _shift2d(mag, -1, 1)])
    n1 = jnp.stack([_shift2d(mag, -1, 0), _shift2d(mag, -1, -1),
                    _shift2d(mag, 0, -1), _shift2d(mag, 1, -1)])
    sel = jax.nn.one_hot(b, 4, axis=0, dtype=mag.dtype)
    m0 = jnp.sum(n0 * sel, axis=0)
    m1 = jnp.sum(n1 * sel, axis=0)
    is_max = (mag >= m0) & (mag >= m1)
    gate = jnp.clip((mag - sigma_lo) / jnp.maximum(sigma_hi - sigma_lo,
                                                   1e-6), 0.0, 1.0)
    return jnp.where(is_max, mag * gate, 0.0)


def grad_huang_mumford_score_map(img: jax.Array,
                                 alpha: float = 10.0) -> jax.Array:
    """|∇I|-driven score with the Huang-Mumford log-prior weighting
    (reference: GradientHuangMumfordDetector feature_detection.cpp —
    score ∝ -log exp(-α|∇I|), monotone in |∇I| with soft saturation)."""
    dx = 0.5 * (_shift2d(img, 1, 0) - _shift2d(img, -1, 0)) / 255.0
    dy = 0.5 * (_shift2d(img, 0, 1) - _shift2d(img, 0, -1)) / 255.0
    mag = jnp.sqrt(dx * dx + dy * dy)
    return 255.0 * (1.0 - jnp.exp(-alpha * mag))


def nms_3x3(score: jax.Array) -> jax.Array:
    """3×3 non-max suppression mask (reference: fast_nonmax_3x3)."""
    neigh = [_shift2d(score, dx, dy)
             for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    m = score
    for n in neigh:
        m = jnp.maximum(m, n)
    return (score >= m) & (score > 0.0)


# ---------------------------------------------------------------------------
# Grid bucketing: best candidate per occupancy cell (segment-max)
# ---------------------------------------------------------------------------

class CellCandidates(NamedTuple):
    """Per-cell winning candidate. All arrays [n_cells]."""
    px: jax.Array       # [n_cells, 2] level-0 pixel coords (cell winner)
    score: jax.Array    # [n_cells]
    level: jax.Array    # [n_cells] i32
    grad: jax.Array     # [n_cells, 2] unit gradient direction (edgelets)
    angle: jax.Array    # [n_cells] gradient angle (0 for corners)


def _per_cell_best(score_map: jax.Array, cand_mask: jax.Array, scale: int,
                   cell_size: int, n_cols: int, n_cells: int
                   ) -> tuple[jax.Array, jax.Array]:
    """Best (score, flat pixel index) per level-0 grid cell.

    Returns (cell_score [n_cells], cell_flat_idx [n_cells] with -1 = none).

    TPU note: the obvious formulation — ``segment_max`` keyed by cell id —
    lowers to a serialized scatter (~16 ms/frame measured on v5e for the
    full detector). Because cells are spatially regular, the reduction is
    instead done densely: nearest-upsample the level-l score map onto the
    level-0 grid (each level-l pixel occupies a scale×scale block, so the
    argmax position maps back exactly to x_l·scale), pad to the cell grid,
    and block-reduce via reshape — pure VPU work, no scatter.
    """
    h, w = score_map.shape
    n_rows = n_cells // n_cols
    s = jnp.where(cand_mask, score_map, 0.0)
    if scale > 1:
        # zero-fill upsample: the candidate occupies ONLY its representative
        # level-0 position (y_l·scale, x_l·scale). A nearest upsample would
        # let one candidate's scale×scale block straddle a cell boundary and
        # win TWO cells — duplicate features at identical px.
        s = jnp.repeat(jnp.repeat(s, scale, 0), scale, 1)
        ry = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % scale
        rx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % scale
        s = jnp.where((ry == 0) & (rx == 0), s, 0.0)
    hp, wp = n_rows * cell_size, n_cols * cell_size
    s = s[:hp, :wp]
    s = jnp.pad(s, ((0, hp - s.shape[0]), (0, wp - s.shape[1])))
    blocks = (s.reshape(n_rows, cell_size, n_cols, cell_size)
              .transpose(0, 2, 1, 3).reshape(n_cells, cell_size * cell_size))
    seg = jnp.max(blocks, axis=1)
    arg = jnp.argmax(blocks, axis=1).astype(jnp.int32)
    row = jnp.arange(n_cells, dtype=jnp.int32) // n_cols
    col = jnp.arange(n_cells, dtype=jnp.int32) % n_cols
    cy0 = row * cell_size + arg // cell_size          # level-0 coords
    cx0 = col * cell_size + arg % cell_size
    yl = cy0 // scale                                  # back to level-l
    xl = cx0 // scale
    idx = jnp.where(seg > 0.0, yl * w + xl, -1)
    return jnp.maximum(seg, 0.0), idx


def detect_cell_candidates(
    pyramid: Sequence[jax.Array],
    cell_size: int,
    n_cols: int,
    n_rows: int,
    min_level: int = 0,
    max_level: int = 2,
    border: int = 8,
    detector: str = "fast",
    sec_min_level: int | None = None,
) -> CellCandidates:
    """One detection pass → best candidate per grid cell across levels.

    detector: 'fast' | 'shitomasi' | 'grad'. For 'grad', levels start at
    min_level+1 and report level-1 like the reference's edgeletDetector_V1
    (feature_detection_utils.cpp:271-330).
    """
    n_cells = n_rows * n_cols
    best_score = jnp.zeros((n_cells,), jnp.float32)
    best_px = jnp.zeros((n_cells, 2), jnp.float32)
    best_level = jnp.zeros((n_cells,), jnp.int32)
    best_angle = jnp.zeros((n_cells,), jnp.float32)

    is_grad = detector == "grad"
    lo = (min_level + 1) if is_grad else min_level
    if sec_min_level is not None:
        lo = sec_min_level
    padded = not isinstance(pyramid, (list, tuple))
    for level in range(lo, max_level + 1):
        if padded:  # padded [L, H, W] array — slice the level's valid extent
            from svo_pro_universal_tpu.ops.pyramid import level_view
            img = level_view(pyramid, level)
        else:
            img = pyramid[level]
        h, w = img.shape
        scale = 1 << level
        if is_grad:
            dx, dy = scharr_gradient(img)
            score_map = jnp.sqrt(dx * dx + dy * dy)
            angle_map = jnp.arctan2(dy, dx)
            nms = score_map > 0.0
        elif detector == "shitomasi":
            score_map = shitomasi_score_map(img)
            angle_map = jnp.zeros_like(score_map)
            nms = nms_3x3(score_map)
        elif detector == "sobel":
            dx, dy = sobel_gradient(img)
            score_map = jnp.sqrt(dx * dx + dy * dy)
            angle_map = jnp.arctan2(dy, dx)
            nms = nms_3x3(score_map)
        elif detector == "canny":
            score_map = canny_score_map(img)
            dx, dy = sobel_gradient(img)
            angle_map = jnp.arctan2(dy, dx)
            nms = score_map > 0.0
        elif detector == "gradhm":
            score_map = grad_huang_mumford_score_map(img)
            dx, dy = sobel_gradient(img)
            angle_map = jnp.arctan2(dy, dx)
            nms = nms_3x3(score_map)
        elif detector == "allpixels":
            score_map = jnp.ones_like(img)
            angle_map = jnp.zeros_like(img)
            nms = jnp.ones_like(img, bool)
        else:
            score_map = fast_score_map(img)
            angle_map = jnp.zeros_like(score_map)
            nms = nms_3x3(score_map)

        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        inb = ((xx >= border) & (xx < w - border)
               & (yy >= border) & (yy < h - border))
        cand = nms & inb

        seg_score, seg_idx = _per_cell_best(
            score_map, cand, scale, cell_size, n_cols, n_cells)
        win_x = (seg_idx % w).astype(jnp.float32) * scale
        win_y = (seg_idx // w).astype(jnp.float32) * scale
        win_angle = angle_map.ravel()[jnp.clip(seg_idx, 0, h * w - 1)]
        take = (seg_score > best_score) & (seg_idx >= 0)
        best_px = jnp.where(take[:, None],
                            jnp.stack([win_x, win_y], axis=-1), best_px)
        rep_level = level - 1 if is_grad else level
        best_level = jnp.where(take, rep_level, best_level)
        best_angle = jnp.where(take, win_angle, best_angle)
        best_score = jnp.where(take, seg_score, best_score)

    grad_dir = jnp.stack([jnp.cos(best_angle), jnp.sin(best_angle)], axis=-1)
    return CellCandidates(best_px, best_score, best_level, grad_dir, best_angle)


class Detections(NamedTuple):
    """Fixed-capacity detection result ([K] slots, masked)."""
    px: jax.Array      # [K, 2]
    score: jax.Array   # [K]
    level: jax.Array   # [K] i32
    grad: jax.Array    # [K, 2]
    ftype: jax.Array   # [K] i32 FeatureType (INVALID for empty slots)
    valid: jax.Array   # [K] bool


def detect_features(
    pyramid: Sequence[jax.Array],
    occupied: jax.Array,          # [n_cells] bool — cells to skip
    cell_size: int,
    n_cols: int,
    n_rows: int,
    max_features: int,
    threshold_primary: float = 10.0,
    threshold_secondary: float = 100.0,
    threshold_shitomasi: float = 50.0,
    min_level: int = 0,
    max_level: int = 2,
    border: int = 8,
    detector_type: str = "fast_grad",
) -> Detections:
    """Full detector: primary corners + secondary edgelets per free cell, then
    global top-`max_features` by score (reference: FastGradDetector::detect
    feature_detection.cpp:94-132 + fillFeatures sort/truncate
    feature_detection_utils.cpp:118-142).

    Corners win their cell outright; a cell falls back to its best edgelet
    only when no corner passed threshold there. Scores of the two families
    are never compared against each other (matching the reference, which runs
    the secondary detector on the grid pre-occupied by corners).
    """
    use_corners = detector_type in ("fast", "fast_grad", "shitomasi",
                                    "shitomasi_grad", "sobel", "canny",
                                    "gradhm", "allpixels")
    use_grad = detector_type in ("grad", "fast_grad", "shitomasi_grad",
                                 "grid_grad")
    if "shitomasi" in detector_type:
        corner_kind = "shitomasi"
    elif detector_type in ("sobel", "canny", "gradhm", "allpixels"):
        corner_kind = detector_type
    else:
        corner_kind = "fast"
    if corner_kind == "shitomasi":
        corner_thresh = threshold_shitomasi
    elif corner_kind == "allpixels":
        corner_thresh = 0.0
    else:
        corner_thresh = threshold_primary

    n_cells = n_rows * n_cols
    zero2 = jnp.zeros((n_cells, 2), jnp.float32)
    corner = CellCandidates(zero2, jnp.zeros((n_cells,)),
                            jnp.zeros((n_cells,), jnp.int32), zero2,
                            jnp.zeros((n_cells,)))
    edge = corner
    if use_corners:
        corner = detect_cell_candidates(
            pyramid, cell_size, n_cols, n_rows, min_level, max_level, border,
            detector=corner_kind)
    if use_grad:
        edge = detect_cell_candidates(
            pyramid, cell_size, n_cols, n_rows, min_level, max_level, border,
            detector="grad")

    corner_ok = corner.score > corner_thresh
    edge_ok = edge.score > threshold_secondary
    pick_edge = (~corner_ok) & edge_ok & jnp.asarray(use_grad)
    pick_corner = corner_ok & jnp.asarray(use_corners)
    free = ~occupied
    valid = (pick_corner | pick_edge) & free

    px = jnp.where(pick_edge[:, None], edge.px, corner.px)
    level = jnp.where(pick_edge, edge.level, corner.level)
    grad = jnp.where(pick_edge[:, None], edge.grad, corner.grad)
    # rank corners above edgelets, then by score (reference sorts per-family
    # and fills corners first)
    raw_score = jnp.where(pick_edge, edge.score, corner.score)
    rank_score = jnp.where(valid,
                           jnp.where(pick_corner, raw_score + 1e6, raw_score),
                           -jnp.inf)
    ftype = jnp.where(
        pick_edge, jnp.int32(FeatureType.EDGELET_SEED),
        jnp.int32(FeatureType.CORNER_SEED))
    ftype = jnp.where(valid, ftype, jnp.int32(FeatureType.INVALID))

    k = min(max_features, n_cells)
    top_score, top_idx = jax.lax.top_k(rank_score, k)
    sel_valid = jnp.isfinite(top_score)
    out_px = px[top_idx]
    out_level = level[top_idx]
    out_grad = grad[top_idx]
    out_ftype = jnp.where(sel_valid, ftype[top_idx],
                          jnp.int32(FeatureType.INVALID))
    out_raw = jnp.where(sel_valid, raw_score[top_idx], 0.0)
    if k < max_features:
        pad = max_features - k
        out_px = jnp.concatenate([out_px, jnp.zeros((pad, 2))], 0)
        out_raw = jnp.concatenate([out_raw, jnp.zeros((pad,))], 0)
        out_level = jnp.concatenate([out_level, jnp.zeros((pad,), jnp.int32)], 0)
        out_grad = jnp.concatenate([out_grad, jnp.zeros((pad, 2))], 0)
        out_ftype = jnp.concatenate(
            [out_ftype, jnp.full((pad,), int(FeatureType.INVALID), jnp.int32)], 0)
        sel_valid = jnp.concatenate([sel_valid, jnp.zeros((pad,), bool)], 0)
    return Detections(out_px, out_raw, out_level, out_grad, out_ftype, sel_valid)
