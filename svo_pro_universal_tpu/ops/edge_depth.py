"""Edge-based depth utilities: multi-scale reliable-edge detection and
photometric 1-dof depth refinement.

TPU-native re-design of the reference's two edge-depth modules:

- ``detect_edges``: Elder-Zucker local-scale-control edge detection
  (reference: src/svo_direct/src/elder_zucker.cpp — detectEdges:12-150,
  per-level Scharr gradient + directional magnitude thresholded by the
  sensor-noise critical value c1, steered second derivative thresholded by
  c2, per-pixel finest-reliable-level selection). The reference's per-pixel
  scalar loops over every pyramid level become whole-image convolution
  programs per level plus one vectorized finest-level argmax; thresholds
  use the same alpha_p = 2e-7 statistics (erfinv instead of a Boost call).

- ``refine_depth_photometric``: the reference's 1-dof GN ``DepthEstimator``
  (reference: src/svo_direct/include/svo/direct/depth_estimation.h:20-70,
  src/svo_direct/src/depth_estimation.cpp — minimize the photometric error
  of an 8x8 patch as a function of the depth of a reference feature).
  One scalar solve per feature in the reference; here ALL features refine
  simultaneously: the depth→pixel chain rule runs through `jax.jvp` of the
  camera projection (model-generic), and patch sampling uses the tile
  engine's batched bilinear-form einsums.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erfinv

from svo_pro_universal_tpu.cameras import projections as proj
from svo_pro_universal_tpu.ops import pyramid as pyr_mod
from svo_pro_universal_tpu.ops import tiles as tl
from svo_pro_universal_tpu.utils.transform import SE3

_PI = 3.14159265358979323846264


def _gauss3(img: jax.Array) -> jax.Array:
    """Separable 3x3 binomial blur (edge-replicated)."""
    k = jnp.array([0.25, 0.5, 0.25], img.dtype)
    p = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    v = p[:-2] * k[0] + p[1:-1] * k[1] + p[2:] * k[2]
    p = jnp.pad(v, ((0, 0), (1, 1)), mode="edge")
    return p[:, :-2] * k[0] + p[:, 1:-1] * k[1] + p[:, 2:] * k[2]


def _scharr(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scharr x/y derivatives with OpenCV weights (3, 10, 3)."""
    p = jnp.pad(img, 1, mode="edge")
    vsm = 3.0 * p[:-2, :] + 10.0 * p[1:-1, :] + 3.0 * p[2:, :]   # [H, W+2]
    dx = vsm[:, 2:] - vsm[:, :-2]
    hsm = 3.0 * p[:, :-2] + 10.0 * p[:, 1:-1] + 3.0 * p[:, 2:]   # [H+2, W]
    dy = hsm[2:, :] - hsm[:-2, :]
    return dx, dy


class EdgeMap(NamedTuple):
    edge: jax.Array    # [H, W] f32 steered 2nd-derivative response (0 = none)
    level: jax.Array   # [H, W] i32 finest reliable pyramid level
    angle: jax.Array   # [H, W] f32 gradient direction at the chosen scale


def detect_edges(pyr3: jax.Array, sigma: float = 5.0,
                 alpha_p: float = 2e-7) -> EdgeMap:
    """Reliable multi-scale edges with per-pixel finest-scale selection.

    ``pyr3`` is a padded [L, H, W] pyramid (ops.pyramid.build_pyramid);
    levels 0..L-2 participate, matching the reference's ``n_levels =
    img_pyr.size()-1`` (elder_zucker.cpp:21). ``sigma`` is the sensor noise
    level s_n; alpha_p the false-positive rate that sets both critical
    thresholds (elder_zucker.cpp:20-42, 97-100).

    NOTE on response semantics (deliberate divergence): the reference's
    edge_map steers products of first-derivative Scharr responses
    (getCovarEntries: dx*dx, dy*dy, dx*dy — a squared, nonnegative
    quantity) with a single cross-scale angle map; this implementation
    returns the SIGNED cascaded second derivative steered with per-level
    angles. Edge magnitudes and signs are therefore not comparable with
    reference edge_map values — consumers porting reference thresholds or
    zero-crossing logic keyed to edge_map must re-tune them.
    """
    levels = pyr_mod.pyramid_levels(pyr3)
    n_use = max(1, len(levels) - 1)
    H0, W0 = levels[0].shape

    angle_stack, log_stack = [], []
    for L in range(n_use):
        img = _gauss3(levels[L])
        dx, dy = _scharr(img)
        scale = float(L + 1)
        # critical threshold on the directional gradient magnitude
        s1 = sigma / (2.0 * jnp.sqrt(2.0 * _PI) * scale * scale)
        c1 = s1 * jnp.sqrt(-2.0 * jnp.log(alpha_p))
        ang = jnp.arctan2(dy, dx)
        mag = jnp.cos(ang) * dx + jnp.sin(ang) * dy
        # explicit reliability mask — fixes the reference's 0.0-angle
        # sentinel collision for pure-horizontal gradients
        # (elder_zucker.cpp:75 'TODO: what if angle is actually 0.0?')
        rel = jnp.abs(mag) >= c1

        # steered second derivative in the (reliable) gradient direction
        dxdx, dxy_a = _scharr(dx)
        dyx_b, dydy = _scharr(dy)
        dxdy = 0.5 * (dxy_a + dyx_b)
        dxdx = _gauss3(dxdx)
        dydy = _gauss3(dydy)
        dxdy = _gauss3(dxdy)
        s2 = sigma / (4.0 * jnp.sqrt(_PI / 3.0) * scale ** 3)
        c2 = jnp.sqrt(2.0) * s2 * erfinv(1.0 - alpha_p)
        ca = jnp.cos(ang)
        sa = jnp.sin(ang)
        log = ca * ca * dxdx + sa * sa * dydy - 2.0 * ca * sa * dxdy
        log = jnp.where((jnp.abs(log) < c2) | ~rel, 0.0, log)
        ang = jnp.where(rel, ang, 0.0)

        rep = 1 << L   # nearest-neighbor upsample back to level-0 grid
        ang0 = jnp.repeat(jnp.repeat(ang, rep, 0), rep, 1)[:H0, :W0]
        log0 = jnp.repeat(jnp.repeat(log, rep, 0), rep, 1)[:H0, :W0]
        pad = ((0, H0 - ang0.shape[0]), (0, W0 - ang0.shape[1]))
        angle_stack.append(jnp.pad(ang0, pad))
        log_stack.append(jnp.pad(log0, pad))

    angs = jnp.stack(angle_stack)            # [Lu, H, W]
    logs = jnp.stack(log_stack)
    # finest level whose response survived its threshold
    hit = logs != 0.0
    lev = jnp.argmax(hit, axis=0).astype(jnp.int32)
    any_hit = jnp.any(hit, axis=0)
    take = jnp.take_along_axis(logs, lev[None], axis=0)[0]
    take_a = jnp.take_along_axis(angs, lev[None], axis=0)[0]
    return EdgeMap(edge=jnp.where(any_hit, take, 0.0),
                   level=jnp.where(any_hit, lev, 0),
                   angle=jnp.where(any_hit, take_a, 0.0))


# ---------------------------------------------------------------------------
# photometric depth refinement (reference DepthEstimator)
# ---------------------------------------------------------------------------

HALF_PATCH = 4
PATCH = 2 * HALF_PATCH            # reference kPatchSize depth_estimation.h:28
TILE = 24


class DepthRefineResult(NamedTuple):
    depth: jax.Array      # [N] refined depth along the ref bearing
    cost: jax.Array       # [N] final mean photometric error (abs)
    converged: jax.Array  # [N] bool


def refine_depth_photometric(
    pyr_cur: jax.Array,        # [L, H, W] current pyramid
    cam: proj.Camera,
    T_cur_ref: SE3,
    f_ref: jax.Array,          # [N, 3] unit bearings in ref frame
    ref_patch: jax.Array,      # [N, PATCH²] reference patches (at `level`)
    depth_init: jax.Array,     # [N]
    level: jax.Array,          # [N] i32 sampling level in cur
    valid: jax.Array,          # [N] bool
    n_iter: int = 10,
    max_cost: float = 20.0,
) -> DepthRefineResult:
    """Batched 1-dof GN on patch photometric error vs depth.

    The reference solves one scalar GN per feature on demand
    (depth_estimation.h:20, run/evaluateError/update); here a fixed
    ``n_iter`` Gauss-Newton loop refines every feature at once. The
    Jacobian d(pixel)/d(depth) is one `jax.jvp` through projection —
    exact for every camera model in the zoo.
    """
    n = f_ref.shape[0]
    scale = (1 << level).astype(jnp.float32)
    r = jnp.arange(PATCH, dtype=jnp.float32) - (HALF_PATCH - 0.5)
    ou, ov = jnp.meshgrid(r, r, indexing="xy")
    poffs = jnp.stack([ou.ravel(), ov.ravel()], -1)       # [P², 2] px offsets

    def uv_of_depth(d):
        p_cur = T_cur_ref.apply(f_ref * d[:, None])
        uv, ok = proj.project(cam, p_cur)
        return uv, ok & (p_cur[:, 2] > 1e-6)

    def body(_, carry):
        d, best_d, best_cost = carry
        uv, ok = uv_of_depth(d)
        duv = jax.jvp(lambda dd: uv_of_depth(dd)[0], (d,),
                      (jnp.ones_like(d),))[1]             # [N,2] duv/dd (px)
        uv_l = uv / scale[:, None]
        duv_l = duv / scale[:, None]
        cyx = jnp.stack([uv_l[:, 1], uv_l[:, 0]], -1)
        tb = tl.extract_tiles(pyr_cur, level, cyx, TILE, TILE)
        pts = uv_l[:, None, :] + poffs[None]              # [N, P², 2]
        vals, gx, gy, inb = tl.tile_bilinear_grad(
            tb, pts[..., 1], pts[..., 0])
        res = vals - ref_patch                            # [N, P²]
        J = gx * duv_l[:, 0:1] + gy * duv_l[:, 1:2]       # dI/dd per pixel
        m = (inb & ok[:, None] & valid[:, None]).astype(jnp.float32)
        Hd = jnp.sum(J * J * m, -1)
        g = jnp.sum(J * res * m, -1)
        # A patch that projects (mostly) off-image must never be reported as
        # photometrically confirmed: with zero valid pixels the mean error
        # would be 0/1 = 0 < max_cost. Require at least half the patch in
        # view, else cost = +inf (reference evaluateError bails out without
        # claiming success, depth_estimation.cpp).
        npx_raw = jnp.sum(m, -1)
        npx = jnp.maximum(npx_raw, 1.0)
        cost = jnp.where(npx_raw >= PATCH * PATCH / 2,
                         jnp.sum(jnp.abs(res) * m, -1) / npx, jnp.inf)
        improved = cost < best_cost
        best_d = jnp.where(improved, d, best_d)
        best_cost = jnp.where(improved, cost, best_cost)
        step = -g / jnp.maximum(Hd, 1e-8)
        step = jnp.clip(step, -0.2 * jnp.abs(d), 0.2 * jnp.abs(d))
        d_new = jnp.where(ok & (Hd > 1e-8), d + step, d)
        return d_new, best_d, best_cost

    init = (depth_init, depth_init, jnp.full((n,), jnp.inf))
    _, best_d, best_cost = jax.lax.fori_loop(0, n_iter, body, init)
    conv = valid & jnp.isfinite(best_cost) & (best_cost < max_cost)
    return DepthRefineResult(depth=best_d, cost=best_cost, converged=conv)
