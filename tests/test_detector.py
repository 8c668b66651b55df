"""Detector tests: FAST-10 score vs naive oracle, NMS, grid bucketing."""

import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.ops import detector as det
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.common.types import FeatureType


def naive_fast10_score(img: np.ndarray, y: int, x: int) -> float:
    """Oracle: largest t such that a contiguous arc of 10 ring pixels is all
    >t brighter or all >t darker than center."""
    c = img[y, x]
    d = np.array([img[y + dy, x + dx] - c for dx, dy in det.FAST_RING])
    best = 0.0
    for sign in (1.0, -1.0):
        s = sign * d
        for j in range(16):
            arc = [s[(j + i) % 16] for i in range(det.FAST_ARC)]
            best = max(best, min(arc))
    return max(best, 0.0)


def test_fast_score_matches_oracle(rng):
    img = rng.uniform(0, 255, size=(24, 32)).astype(np.float32)
    score = np.asarray(det.fast_score_map(jnp.asarray(img)))
    for y in range(4, 20, 3):
        for x in range(4, 28, 5):
            assert score[y, x] == pytest.approx(
                naive_fast10_score(img, y, x), abs=1e-3)


def test_fast_score_fires_on_square_corner():
    img = np.zeros((48, 48), np.float32)
    img[16:32, 16:32] = 200.0
    score = np.asarray(det.fast_score_map(jnp.asarray(img)))
    # corners of the square score high, flat regions zero, straight edges low
    assert score[16, 16] > 100.0
    assert score[8, 8] == 0.0
    assert score[16, 24] < score[16, 16]  # edge midpoint beats no arc of 10


def test_nms_keeps_single_peak():
    s = np.zeros((16, 16), np.float32)
    s[5, 5] = 10.0
    s[5, 6] = 8.0  # suppressed neighbor
    m = np.asarray(det.nms_3x3(jnp.asarray(s)))
    assert m[5, 5] and not m[5, 6]


def test_shitomasi_corner_beats_edge_and_flat():
    img = np.zeros((64, 64), np.float32)
    img[24:, 24:] = 180.0
    s = np.asarray(det.shitomasi_score_map(jnp.asarray(img)))
    corner = s[20:28, 20:28].max()
    edge = s[40:48, 22:26].max()      # vertical edge away from corner
    flat = s[8:16, 8:16].max()
    assert corner > 10 * max(edge, 1e-6)
    assert flat == pytest.approx(0.0, abs=1e-3)


def test_detect_features_on_checker_corners():
    # plus-shaped blobs create strong FAST corners at known cells
    img = np.zeros((96, 128), np.float32)
    centers = [(20, 24), (20, 88), (68, 40), (68, 100)]
    for (y, x) in centers:
        img[y - 4:y + 4, x - 4:x + 4] = 220.0
    pyr = build_pyramid(jnp.asarray(img), 3)
    cs = 32
    n_cols, n_rows = 128 // cs, 96 // cs
    occupied = jnp.zeros((n_rows * n_cols,), bool)
    out = det.detect_features(
        pyr, occupied, cs, n_cols, n_rows, max_features=16,
        threshold_primary=10.0, detector_type="fast")
    got = np.asarray(out.px)[np.asarray(out.valid)]
    assert len(got) >= 4
    for (y, x) in centers:
        d = np.abs(got - np.array([x, y])).sum(axis=1).min()
        assert d <= 8.0, (x, y, got)


def test_detect_features_respects_occupancy_and_capacity():
    img = np.zeros((96, 128), np.float32)
    for (y, x) in [(20, 24), (20, 88), (68, 40), (68, 100)]:
        img[y - 4:y + 4, x - 4:x + 4] = 220.0
    pyr = build_pyramid(jnp.asarray(img), 3)
    cs = 32
    n_cols, n_rows = 4, 3
    occupied = jnp.ones((12,), bool)  # everything occupied → nothing detected
    out = det.detect_features(pyr, occupied, cs, n_cols, n_rows, 16,
                              detector_type="fast")
    assert not np.asarray(out.valid).any()
    assert (np.asarray(out.ftype) == int(FeatureType.INVALID)).all()

    out2 = det.detect_features(pyr, jnp.zeros((12,), bool), cs, n_cols,
                               n_rows, 2, detector_type="fast")
    assert np.asarray(out2.valid).sum() == 2  # capacity-limited top-k


def test_edgelets_fill_cells_without_corners():
    # a long straight intensity edge: no FAST corners, strong gradient
    img = np.zeros((96, 128), np.float32)
    img[:, 64:] = 150.0
    pyr = build_pyramid(jnp.asarray(img), 3)
    cs = 32
    out = det.detect_features(pyr, jnp.zeros((12,), bool), cs, 4, 3, 16,
                              threshold_secondary=100.0,
                              detector_type="fast_grad")
    v = np.asarray(out.valid)
    assert v.any()
    types = np.asarray(out.ftype)[v]
    assert (types == int(FeatureType.EDGELET_SEED)).all()
    # gradient direction is horizontal (edge is vertical)
    grads = np.asarray(out.grad)[v]
    assert np.all(np.abs(grads[:, 0]) > 0.9)
