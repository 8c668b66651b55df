"""Fused Pallas align-evaluate kernel (ops/pallas_align.py) vs the XLA
reference semantics — interpret mode on CPU (the real-TPU speed numbers
come from bench.py's stage profile)."""

import numpy as np

import jax.numpy as jnp

from svo_pro_universal_tpu.ops import pallas_align


def _xla_reference(tiles, ty, tx, w, ref, jac, alpha, beta, P):
    """Same math, op-by-op: bilinear sample of the P×P integer grid at
    per-feature fractional origin, residual, weighted normal system."""
    n, R, T = tiles.shape
    ri = np.arange(R, dtype=np.float32)
    ci = np.arange(T, dtype=np.float32)
    H = np.zeros((8, 8), np.float32)
    g = np.zeros((8,), np.float32)
    chi2 = 0.0
    for b in range(n):
        ys = ty[b] + np.arange(P)
        xs = tx[b] + np.arange(P)
        Ry = np.maximum(0.0, 1.0 - np.abs(ys[:, None] - ri[None]))
        Cx = np.maximum(0.0, 1.0 - np.abs(xs[:, None] - ci[None]))
        patch = Ry @ tiles[b] @ Cx.T                     # [P, P]
        cur = patch.reshape(-1)
        res = cur * (1.0 + alpha) + beta - ref[b]
        H += w[b] * jac[b].T @ jac[b]
        g += -w[b] * jac[b].T @ res
        chi2 += w[b] * float(res @ res)
    return H, g, chi2, float(w.sum())


def test_fused_evaluate_matches_reference(rng):
    n, R, T, P = 13, 16, 128, 4          # odd n exercises padding
    tiles = rng.uniform(0, 255, (n, R, T)).astype(np.float32)
    ty = rng.uniform(0.0, R - P - 1.0, n).astype(np.float32)
    tx = rng.uniform(0.0, T - P - 1.0, n).astype(np.float32)
    w = (rng.uniform(size=n) > 0.3).astype(np.float32)
    ref = rng.uniform(0, 255, (n, P * P)).astype(np.float32)
    jac = rng.normal(0, 1, (n, P * P, 8)).astype(np.float32)
    alpha, beta = 0.03, -1.5

    H, g, chi2, nm = pallas_align.fused_evaluate(
        jnp.asarray(tiles), jnp.asarray(ty), jnp.asarray(tx),
        jnp.asarray(w), jnp.asarray(ref), jnp.asarray(jac),
        alpha, beta, P, interpret=True)
    H0, g0, chi20, nm0 = _xla_reference(tiles, ty, tx, w, ref, jac,
                                        alpha, beta, P)
    np.testing.assert_allclose(np.asarray(H), H0, rtol=2e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(g), g0, rtol=2e-4, atol=0.5)
    assert abs(float(chi2) - chi20) < max(2e-4 * abs(chi20), 1.0)
    assert float(nm) == nm0


def test_fused_evaluate_integer_positions(rng):
    """Exact-integer origins: the second bilinear tap has zero weight and
    must not read out of bounds (it selects row/col by equality)."""
    n, R, T, P = 8, 16, 128, 4
    tiles = rng.uniform(0, 255, (n, R, T)).astype(np.float32)
    ty = np.full((n,), float(R - P), np.float32)     # last valid origin
    tx = np.full((n,), float(T - P), np.float32)
    w = np.ones((n,), np.float32)
    ref = np.zeros((n, P * P), np.float32)
    jac = np.zeros((n, P * P, 8), np.float32)
    H, g, chi2, nm = pallas_align.fused_evaluate(
        jnp.asarray(tiles), jnp.asarray(ty), jnp.asarray(tx),
        jnp.asarray(w), jnp.asarray(ref), jnp.asarray(jac),
        0.0, 0.0, P, interpret=True)
    # residual = the raw patch values; chi2 = sum of their squares
    want = sum(float((tiles[b, R - P:, T - P:] ** 2).sum())
               for b in range(n))
    assert abs(float(chi2) - want) < 2e-3 * want
    assert float(nm) == n
