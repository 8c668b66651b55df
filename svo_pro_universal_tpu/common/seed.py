"""Depth-filter seed state: inverse-depth parametrization, batched.

Seed state per feature is ``[inv_mu, sigma2, a, b]`` — a Gaussian on inverse
depth mixed with a Beta inlier model (Vogiatzis). Mirrors the reference's
accessors (reference: src/svo_common/include/svo/common/seed.h:107-170,
inverse-depth branch) as elementwise array ops over ``[..., 4]`` arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MU, SIGMA2, A, B = 0, 1, 2, 3


def make(depth_mean: jax.Array, depth_min: jax.Array) -> jax.Array:
    """Initialize seed states from a mean scene depth and min depth.

    mu = 1/depth_mean, mu_range = 1/depth_min, sigma2 = mu_range²/36.
    (reference: depth_filter.cpp initializeSeeds + seed.h:130-144)
    """
    mu = 1.0 / depth_mean
    mu_range = 1.0 / depth_min
    sigma2 = mu_range * mu_range / 36.0
    ones = jnp.ones_like(mu)
    return jnp.stack([mu, sigma2, 10.0 * ones, 10.0 * ones], axis=-1)


def depth(state: jax.Array) -> jax.Array:
    return 1.0 / jnp.maximum(state[..., MU], 1e-12)


def inv_depth(state: jax.Array) -> jax.Array:
    return state[..., MU]


def inv_min_depth(state: jax.Array) -> jax.Array:
    return state[..., MU] + jnp.sqrt(jnp.maximum(state[..., SIGMA2], 0.0))


def inv_max_depth(state: jax.Array) -> jax.Array:
    return jnp.maximum(
        state[..., MU] - jnp.sqrt(jnp.maximum(state[..., SIGMA2], 0.0)), 1e-8)


def is_converged(state: jax.Array, mu_range: jax.Array,
                 sigma2_convergence_threshold: float) -> jax.Array:
    thresh = mu_range / sigma2_convergence_threshold
    return state[..., SIGMA2] < thresh * thresh


def increase_outlier_probability(state: jax.Array) -> jax.Array:
    return state.at[..., B].add(1.0)


def sigma2_from_depth_sigma(depth: jax.Array, depth_sigma: jax.Array) -> jax.Array:
    sigma = 0.5 * (1.0 / jnp.maximum(depth - depth_sigma, 1e-12)
                   - 1.0 / (depth + depth_sigma))
    return sigma * sigma
