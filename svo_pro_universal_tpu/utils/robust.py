"""Robust cost weight functions and scale estimators, batched.

Mirror of the reference's vikit robust-cost toolbox (reference:
src/vikit/vikit_solver/include/vikit/solver/robust_cost.h:11-85 — Tukey/Huber
weight functions, MAD and normal-distribution scale estimators) as pure
elementwise ops over residual arrays with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TUKEY_B = 4.6851
HUBER_K = 1.345


def tukey_weight(x_norm: jax.Array, b: float = TUKEY_B) -> jax.Array:
    """Tukey biweight ω(x) = (1-(x/b)²)² for |x|<b else 0."""
    r = x_norm / b
    w = jnp.square(1.0 - jnp.square(r))
    return jnp.where(jnp.abs(r) < 1.0, w, 0.0)


def tukey_rho(x_norm: jax.Array, b: float = TUKEY_B) -> jax.Array:
    """Tukey loss ρ(x) = b²/6·(1−(1−(x/b)²)³) for |x|<b, else b²/6.

    Saturates for outliers — the correct objective for step acceptance
    (a weighted-LS sum would go to zero when every residual is rejected).
    """
    r2 = jnp.square(x_norm / b)
    inner = 1.0 - jnp.power(1.0 - r2, 3)
    return (b * b / 6.0) * jnp.where(r2 < 1.0, inner, 1.0)


def huber_weight(x_norm: jax.Array, k: float = HUBER_K) -> jax.Array:
    ax = jnp.abs(x_norm)
    return jnp.where(ax <= k, 1.0, k / jnp.maximum(ax, 1e-12))


def masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Median of x[mask] over a padded array (static shape)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.clip((n - 1) // 2, 0, x.shape[0] - 1)
    return xs[idx]


def mad_scale(errors: jax.Array, mask: jax.Array) -> jax.Array:
    """Median absolute deviation scale estimate: 1.48 * median(|e|)."""
    return 1.48 * masked_median(jnp.abs(errors), mask)


def unit_scale(errors: jax.Array, mask: jax.Array) -> jax.Array:
    del errors, mask
    return jnp.asarray(1.0)
