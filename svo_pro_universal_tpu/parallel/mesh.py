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
HOST_AXIS = "h"       # DCN axis: inter-host partitioning (global map BA)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(jax.numpy.array(devs).reshape(-1), (FEATURE_AXIS,))


def make_mesh_2d(n_hosts: int, per_host: int | None = None) -> Mesh:
    """[host (DCN) × chip (ICI)] mesh. In a real multi-host launch the
    leading axis spans hosts (`jax.devices()` is globally ordered
    host-major under `jax.distributed`); single-host it folds the local
    chips into a virtual host axis with identical program semantics."""
    import numpy as np
    devs = jax.devices()
    if per_host is None:
        per_host = len(devs) // n_hosts
    if per_host < 1 or n_hosts * per_host > len(devs):
        raise ValueError(
            f"make_mesh_2d({n_hosts}, {per_host}): needs "
            f"{n_hosts * max(per_host, 1)} devices, have {len(devs)}")
    devs = np.array(devs[: n_hosts * per_host]).reshape(n_hosts, per_host)
    return Mesh(devs, (HOST_AXIS, FEATURE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def feature_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(FEATURE_AXIS))
