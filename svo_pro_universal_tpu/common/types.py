"""Feature taxonomy and shared predicates as int-code arrays.

TPU-native mirror of the reference's FeatureType enum + predicates
(reference: src/svo_common/include/svo/common/types.h:60-140). Types live in
int32 arrays so predicates are elementwise masks, not per-feature branches.
An extra INVALID code marks empty slots in the fixed-capacity feature store.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class FeatureType(enum.IntEnum):
    EDGELET_SEED = 0
    CORNER_SEED = 1
    MAP_POINT_SEED = 2
    EDGELET_SEED_CONVERGED = 3
    CORNER_SEED_CONVERGED = 4
    MAP_POINT_SEED_CONVERGED = 5
    EDGELET = 6
    CORNER = 7
    MAP_POINT = 8
    FIXED_LANDMARK = 9
    OUTLIER = 10
    INVALID = 11  # TPU addition: empty slot in padded arrays


F = FeatureType


def is_valid(t: jax.Array) -> jax.Array:
    return (t >= 0) & (t < F.INVALID) & (t != F.OUTLIER)


def is_seed(t: jax.Array) -> jax.Array:
    return (t >= 0) & (t < 6)


def is_corner_edgelet_seed(t: jax.Array) -> jax.Array:
    return ((t == F.EDGELET_SEED) | (t == F.CORNER_SEED)
            | (t == F.EDGELET_SEED_CONVERGED) | (t == F.CORNER_SEED_CONVERGED))


def is_converged_seed(t: jax.Array) -> jax.Array:
    return ((t == F.EDGELET_SEED_CONVERGED) | (t == F.CORNER_SEED_CONVERGED)
            | (t == F.MAP_POINT_SEED_CONVERGED))


def is_unconverged_seed(t: jax.Array) -> jax.Array:
    return ((t == F.EDGELET_SEED) | (t == F.CORNER_SEED)
            | (t == F.MAP_POINT_SEED))


def is_edgelet(t: jax.Array) -> jax.Array:
    return ((t == F.EDGELET) | (t == F.EDGELET_SEED)
            | (t == F.EDGELET_SEED_CONVERGED))


def is_corner(t: jax.Array) -> jax.Array:
    return ((t == F.CORNER) | (t == F.CORNER_SEED)
            | (t == F.CORNER_SEED_CONVERGED))


def is_map_point(t: jax.Array) -> jax.Array:
    return ((t == F.MAP_POINT) | (t == F.MAP_POINT_SEED)
            | (t == F.MAP_POINT_SEED_CONVERGED))


def is_landmark(t: jax.Array) -> jax.Array:
    """Feature backed by a triangulated 3D point (not a live seed)."""
    return (t == F.EDGELET) | (t == F.CORNER) | (t == F.MAP_POINT) | \
        (t == F.FIXED_LANDMARK)


def seed_to_converged(t: jax.Array) -> jax.Array:
    """Seed type code → its converged variant (identity for non-seeds)."""
    return jnp.where(is_unconverged_seed(t), t + 3, t)


def seed_to_landmark_type(t: jax.Array) -> jax.Array:
    """(converged) seed code → the corresponding landmark code."""
    base = jnp.where(t >= 3, t - 3, t)  # unconverged code 0..2
    mapped = jnp.where(base == 0, F.EDGELET,
                       jnp.where(base == 1, F.CORNER, F.MAP_POINT))
    return jnp.where(is_seed(t), mapped, t)
