"""Device-mesh helpers for the distributed paths.

The reference is single-process multi-threaded (SURVEY.md §2.3); the TPU
build replaces its worker threads with sharded batched programs over a
`jax.sharding.Mesh`: features/seeds shard over the `f` axis (the depth
filter is embarrassingly parallel; sparse alignment and BA reduce their
normal systems with `psum` over ICI).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FEATURE_AXIS = "f"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(jax.numpy.array(devs).reshape(-1), (FEATURE_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def feature_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(FEATURE_AXIS))
