"""Pallas tile-gather kernel vs direct-slice oracle (interpret mode on
CPU; the same kernel runs compiled on TPU — see bench.py stage profile)."""

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.ops import pallas_tiles as ptl
from svo_pro_universal_tpu.ops import tiles as tl
from svo_pro_universal_tpu.ops.pyramid import build_pyramid


def _pyr(rng, H=160, W=256, L=3):
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    return build_pyramid(jnp.asarray(img), L)


def test_round_helpers():
    assert ptl.round_rows(24) == 32
    assert ptl.round_rows(12) == 24
    assert ptl.round_rows(40) == 48
    assert ptl.round_cols(24) == 256
    assert ptl.round_cols(1) == 128


def test_gather_tiles_matches_slices(rng):
    pyr = _pyr(rng)
    L, H, W = pyr.shape
    N = 13                                  # exercises the _BLOCK padding
    lvl = jnp.asarray(rng.integers(0, L, N), jnp.int32)
    RA, TA = 32, 128
    y0 = jnp.asarray((rng.integers(0, (H - RA) // 8 + 1, N)) * 8, jnp.int32)
    x0 = jnp.asarray((rng.integers(0, (W - TA) // 128 + 1, N)) * 128,
                     jnp.int32)
    out = ptl.gather_tiles(pyr, lvl, y0, x0, RA, TA, interpret=True)
    assert out.shape == (N, RA, TA)
    for n in range(N):
        ref = np.asarray(pyr[int(lvl[n]), int(y0[n]):int(y0[n]) + RA,
                             int(x0[n]):int(x0[n]) + TA])
        np.testing.assert_array_equal(np.asarray(out[n]), ref)


def test_gather_tiles_ring_matches_slices(rng):
    K = 4
    pyrs = [_pyr(rng) for _ in range(K)]
    ring4 = jnp.stack(pyrs)
    _, L, H, W = ring4.shape
    N = 8
    kf = jnp.asarray(rng.integers(0, K, N), jnp.int32)
    lvl = jnp.asarray(rng.integers(0, L, N), jnp.int32)
    RA, TA = 24, 128
    y0 = jnp.asarray((rng.integers(0, (H - RA) // 8 + 1, N)) * 8, jnp.int32)
    x0 = jnp.asarray((rng.integers(0, (W - TA) // 128 + 1, N)) * 128,
                     jnp.int32)
    out = ptl.gather_tiles_ring(ring4, kf, lvl, y0, x0, RA, TA,
                                interpret=True)
    for n in range(N):
        ref = np.asarray(ring4[int(kf[n]), int(lvl[n]),
                               int(y0[n]):int(y0[n]) + RA,
                               int(x0[n]):int(x0[n]) + TA])
        np.testing.assert_array_equal(np.asarray(out[n]), ref)


def test_aligned_origins_cover_requested_window(rng):
    """The superset [ya, ya+RA) × [xa, xa+TA) must always contain the
    requested [y0, y0+R) × [x0, x0+T) window, including at the clips."""
    H, W = 480, 752
    Hp, Wp = -(-H // 8) * 8, -(-W // 128) * 128
    for R, T in [(24, 24), (12, 12), (40, 40)]:
        RA, TA = ptl.round_rows(R), ptl.round_cols(T)
        y0 = jnp.asarray(rng.integers(0, H - R + 1, 500), jnp.int32)
        x0 = jnp.asarray(rng.integers(0, W - T + 1, 500), jnp.int32)
        ya, xa = tl._aligned_origins(y0, x0, RA, TA, Hp, Wp)
        assert bool(jnp.all(ya % 8 == 0)) and bool(jnp.all(xa % 128 == 0))
        assert bool(jnp.all((ya >= 0) & (ya + RA <= Hp)))
        assert bool(jnp.all((xa >= 0) & (xa + TA <= Wp)))
        assert bool(jnp.all((y0 >= ya) & (y0 + R <= ya + RA)))
        assert bool(jnp.all((x0 >= xa) & (x0 + T <= xa + TA)))


def test_sampler_agnostic_to_superset_tiles(rng):
    """tile_bilinear on a Pallas-style superset tile returns the same
    values as on the exact XLA tile, for samples inside the window."""
    pyr = _pyr(rng)
    L, H, W = pyr.shape
    N, R, T = 16, 24, 24
    cy = jnp.asarray(rng.uniform(30, H - 30, N).astype(np.float32))
    cx = jnp.asarray(rng.uniform(30, W - 30, N).astype(np.float32))
    cyx = jnp.stack([cy, cx], -1)
    lvl = jnp.zeros((N,), jnp.int32)
    tb_exact = tl.extract_tiles(pyr, lvl, cyx, R, T)
    # superset TileBatch built through the same aligned-origin math
    RA, TA = ptl.round_rows(R), ptl.round_cols(T)
    if H >= RA and W >= TA:
        ya, xa = tl._aligned_origins(tb_exact.y0, tb_exact.x0, RA, TA, H, W)
        tiles = ptl.gather_tiles(pyr, lvl, ya, xa, RA, TA, interpret=True)
        tb_sup = tl.TileBatch(tiles, ya, xa, tb_exact.lh, tb_exact.lw)
        ys = cy[:, None] + jnp.asarray(
            rng.uniform(-8, 8, (N, 9)).astype(np.float32))
        xs = cx[:, None] + jnp.asarray(
            rng.uniform(-8, 8, (N, 9)).astype(np.float32))
        v1, in1 = tl.tile_bilinear(tb_exact, ys, xs)
        v2, in2 = tl.tile_bilinear(tb_sup, ys, xs)
        both = np.asarray(in1 & in2)
        np.testing.assert_allclose(np.asarray(v1)[both],
                                   np.asarray(v2)[both], rtol=1e-6)
        # superset coverage is a superset of the exact tile's coverage
        assert bool(jnp.all(~in1 | in2))
