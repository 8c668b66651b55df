"""Stereo triangulation: detect in cam0, epipolar-match into cam1,
triangulate with the calibrated baseline.

TPU-native replacement for the reference's StereoTriangulation
(reference: src/svo/src/stereo_triangulation.cpp:23-141 — detect on the
left frame, Matcher::findEpipolarMatchDirect against the right frame over
the configured inverse-depth range, landmark creation; options
stereo_triangulation.h:12-20). One batched epipolar-match call replaces the
per-feature loop; the known extrinsic T_c1_c0 makes every depth metric.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.common import types as ft
from svo_pro_universal_tpu.ops import matcher as matcher_mod
from svo_pro_universal_tpu.utils.transform import SE3


class StereoTriangulationOptions(NamedTuple):
    mean_depth_inv: float = 1.0 / 3.0
    min_depth_inv: float = 1.0 / 0.25
    max_depth_inv: float = 1.0 / 50.0
    max_search_level: int = 2


class StereoMatches(NamedTuple):
    depth0: jax.Array     # [N] metric depth along cam0 bearings
    px1: jax.Array        # [N, 2] match position in cam1
    success: jax.Array    # [N]


def triangulate_pair(
    pyr0: jax.Array,         # padded [L, H, W]
    pyr1: jax.Array,
    cam0: proj.Camera,
    cam1: proj.Camera,
    T_c1_c0: SE3,
    px0: jax.Array,          # [N, 2] features detected in cam0
    f0: jax.Array,           # [N, 3]
    grad0: jax.Array,        # [N, 2]
    level0: jax.Array,       # [N]
    ftype0: jax.Array,       # [N]
    valid: jax.Array,        # [N]
    opts: StereoTriangulationOptions = StereoTriangulationOptions(),
) -> StereoMatches:
    """Batched left→right epipolar matching + metric triangulation
    (reference: stereo_triangulation.cpp:64-130)."""
    n = px0.shape[0]
    match = matcher_mod.find_epipolar_matches(
        pyr0, pyr1,
        cam0, cam1, T_c1_c0, px0, f0, grad0,
        ft.is_edgelet(ftype0), level0,
        d_estimate_inv=jnp.full((n,), opts.mean_depth_inv),
        d_min_inv=jnp.full((n,), opts.min_depth_inv),
        d_max_inv=jnp.full((n,), opts.max_depth_inv),
        valid=valid, max_search_level=opts.max_search_level)
    ok = match.success & (match.depth > 1.0 / opts.min_depth_inv * 0.5) \
        & (match.depth < 1.0 / opts.max_depth_inv * 2.0)
    return StereoMatches(match.depth, match.px_cur, ok)
