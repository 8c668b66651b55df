"""ops.tiles vs the gather-based oracle (ops.interp) and numpy."""

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.ops import tiles as tl
from svo_pro_universal_tpu.ops.interp import bilinear
from svo_pro_universal_tpu.ops.pyramid import build_pyramid, level_view


def _pyr(rng, h=64, w=96, n_levels=3):
    img = jnp.asarray(rng.random((h, w)) * 255, jnp.float32)
    return build_pyramid(img, n_levels)


def test_build_pyramid_padded_layout(rng):
    pyr = _pyr(rng)
    assert pyr.shape == (3, 64, 96)
    l1 = level_view(pyr, 1)
    assert l1.shape == (32, 48)
    # half-sample mean check
    l0 = level_view(pyr, 0)
    np.testing.assert_allclose(
        np.asarray(l1[0, 0]), np.asarray(jnp.mean(l0[:2, :2])), rtol=1e-6)
    # padding is zero
    assert float(jnp.abs(pyr[1, 40:, :]).max()) == 0.0


def test_extract_tiles_matches_slices(rng):
    pyr = _pyr(rng)
    centers = jnp.asarray([[10.0, 20.0], [5.0, 40.0], [30.0, 8.0]])
    level = jnp.asarray([0, 1, 1], jnp.int32)
    tb = tl.extract_tiles(pyr, level, centers, 8, 8)
    for i in range(3):
        l, y0, x0 = int(level[i]), int(tb.y0[i]), int(tb.x0[i])
        exp = np.asarray(pyr[l, y0:y0 + 8, x0:x0 + 8])
        np.testing.assert_array_equal(np.asarray(tb.tiles[i]), exp)


def test_tile_bilinear_matches_oracle(rng):
    pyr = _pyr(rng)
    n, s = 16, 9
    cy = jnp.asarray(rng.uniform(8, 50, n), jnp.float32)
    cx = jnp.asarray(rng.uniform(8, 80, n), jnp.float32)
    level = jnp.zeros((n,), jnp.int32)
    tb = tl.extract_tiles(pyr, level, jnp.stack([cy, cx], -1), 12, 12)
    offs = jnp.asarray(rng.uniform(-3, 3, (n, s, 2)), jnp.float32)
    ys = cy[:, None] + offs[..., 0]
    xs = cx[:, None] + offs[..., 1]
    vals, inb = tl.tile_bilinear(tb, ys, xs)
    img0 = level_view(pyr, 0)
    ref, ref_inb = bilinear(img0, jnp.stack([xs, ys], -1))
    assert bool(jnp.all(inb))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_tile_bilinear_out_of_bounds_masked(rng):
    pyr = _pyr(rng)
    centers = jnp.asarray([[2.0, 2.0]])           # near the corner
    tb = tl.extract_tiles(pyr, jnp.zeros((1,), jnp.int32), centers, 8, 8)
    ys = jnp.asarray([[-1.0, 1.0]])
    xs = jnp.asarray([[1.0, -0.5]])
    _, inb = tl.tile_bilinear(tb, ys, xs)
    assert not bool(inb[0, 0]) and not bool(inb[0, 1])


def test_tile_bilinear_respects_level_extent(rng):
    pyr = _pyr(rng)                                # level 1 extent 32x48
    centers = jnp.asarray([[30.0, 46.0]])          # near level-1 border
    tb = tl.extract_tiles(pyr, jnp.ones((1,), jnp.int32), centers, 8, 8)
    ys = jnp.asarray([[30.0, 31.5]])
    xs = jnp.asarray([[46.0, 47.5]])
    _, inb = tl.tile_bilinear(tb, ys, xs)
    assert bool(inb[0, 0])
    assert not bool(inb[0, 1])                     # beyond level extent


def test_tile_bilinear_grad_exact_on_ramp(rng):
    # on a linear ramp I(y, x) = 3x + 2y the bilinear-surface gradient is
    # exact: dx = 3, dy = 2 everywhere
    h, w = 64, 96
    yy, xx = jnp.mgrid[0:h, 0:w]
    img = (3.0 * xx + 2.0 * yy).astype(jnp.float32)
    pyr = jnp.zeros((2, h, w), jnp.float32).at[0].set(img)
    n = 8
    cy = jnp.asarray(rng.uniform(10, 50, n), jnp.float32)
    cx = jnp.asarray(rng.uniform(10, 80, n), jnp.float32)
    tb = tl.extract_tiles(pyr, jnp.zeros((n,), jnp.int32),
                          jnp.stack([cy, cx], -1), 12, 12)
    val, dx, dy, inb = tl.tile_bilinear_grad(tb, cy[:, None], cx[:, None])
    assert bool(jnp.all(inb))
    np.testing.assert_allclose(np.asarray(val[:, 0]),
                               np.asarray(3 * cx + 2 * cy), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), 3.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dy), 2.0, rtol=1e-4)


def test_extract_tiles_ring(rng):
    pyrs = jnp.stack([_pyr(rng), _pyr(rng), _pyr(rng)])   # [K=3, L, H, W]
    kf = jnp.asarray([2, 0], jnp.int32)
    level = jnp.asarray([0, 1], jnp.int32)
    centers = jnp.asarray([[20.0, 30.0], [10.0, 12.0]])
    tb = tl.extract_tiles_ring(pyrs, kf, level, centers, 8, 8)
    for i in range(2):
        k, l = int(kf[i]), int(level[i])
        y0, x0 = int(tb.y0[i]), int(tb.x0[i])
        exp = np.asarray(pyrs[k, l, y0:y0 + 8, x0:x0 + 8])
        np.testing.assert_array_equal(np.asarray(tb.tiles[i]), exp)


def test_zmssd_score_map_matches_naive(rng):
    pyr = _pyr(rng)
    n, p = 4, 4
    centers = jnp.asarray(rng.uniform(16, 40, (n, 2)), jnp.float32)
    tb = tl.extract_tiles(pyr, jnp.zeros((n,), jnp.int32), centers, 12, 12)
    ref = jnp.asarray(rng.random((n, p * p)) * 255, jnp.float32)
    score, ok = tl.zmssd_score_map(tb, ref, p)
    assert score.shape == (n, 9, 9)
    tiles = np.asarray(tb.tiles)
    refn = np.asarray(ref).reshape(n, p, p)
    for i in range(n):
        b = refn[i] - refn[i].mean()
        for v in range(9):
            for u in range(9):
                a = tiles[i, v:v + p, u:u + p]
                exp = np.sum(((a - a.mean()) - b) ** 2)
                np.testing.assert_allclose(score[i, v, u], exp,
                                           rtol=1e-3, atol=0.5)


def test_solve_psd_small(rng):
    for d in (3, 4):
        A = jnp.asarray(rng.random((32, d, d)), jnp.float32)
        H = jnp.einsum("nij,nkj->nik", A, A) + 0.1 * jnp.eye(d)
        g = jnp.asarray(rng.random((32, d)), jnp.float32)
        x = tl.solve_psd_small(H, g)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("nij,nj->ni", H, x)), np.asarray(g),
            rtol=1e-3, atol=1e-3)
