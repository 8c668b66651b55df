"""Bilinear interpolation and batched patch extraction (gather-based).

Replaces the reference's per-pixel bilinear loops
(reference: src/vikit/vikit_common/include/vikit/vision.h interpolateMat_8u
and the patch loops in feature_alignment.cpp / sparse_img_align.cpp).
On TPU these run as XLA gathers over the image held in HBM; callers batch
all features at once so the gather is one big op per stage.

Coordinates are (u, v) = (x-col, y-row), matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear(img: jax.Array, uv: jax.Array,
             valid_pad: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """Sample img at float coords uv [..., 2]. Returns (value, in_bounds)."""
    h, w = img.shape
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    x0 = u0.astype(jnp.int32)
    y0 = v0.astype(jnp.int32)
    inb = (u >= 0) & (v >= 0) & (u <= w - 1 - 1e-6) & (v <= h - 1 - 1e-6)

    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)
    i00 = img[y0c, x0c]
    i01 = img[y0c, x0c + 1]
    i10 = img[y0c + 1, x0c]
    i11 = img[y0c + 1, x0c + 1]
    w00 = (1 - fu) * (1 - fv)
    w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv
    w11 = fu * fv
    val = w00 * i00 + w01 * i01 + w10 * i10 + w11 * i11
    return jnp.where(inb, val, valid_pad), inb


def bilinear_with_gradient(
    img: jax.Array, uv: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample value and image gradient (du, dv) at uv via the same 4 taps.

    d(val)/du = (1-fv)(i01-i00) + fv(i11-i10); analogous for dv — this is the
    derivative of the bilinear surface itself, which is what inverse-
    compositional LK needs (reference: feature_alignment.cpp align2D's
    dx/dy from patch-with-border differences use central differences; the
    bilinear-surface gradient is the TPU-friendly equivalent computed from
    the very same gathered taps).
    """
    h, w = img.shape
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    x0 = u0.astype(jnp.int32)
    y0 = v0.astype(jnp.int32)
    inb = (u >= 1) & (v >= 1) & (u <= w - 2) & (v <= h - 2)

    x0c = jnp.clip(x0, 1, w - 3)
    y0c = jnp.clip(y0, 1, h - 3)

    def tap(dy, dx):
        return img[y0c + dy, x0c + dx]

    i00, i01, i10, i11 = tap(0, 0), tap(0, 1), tap(1, 0), tap(1, 1)
    val = ((1 - fu) * (1 - fv) * i00 + fu * (1 - fv) * i01
           + (1 - fu) * fv * i10 + fu * fv * i11)
    # central differences of the bilinear surface (half-pixel apart taps)
    im0 = tap(0, -1)
    im1 = tap(1, -1)
    ip0 = tap(0, 2)
    ip1 = tap(1, 2)
    du = 0.5 * ((1 - fv) * ((1 - fu) * (i01 - im0) + fu * (ip0 - i00))
                + fv * ((1 - fu) * (i11 - im1) + fu * (ip1 - i10)))
    i_0m = tap(-1, 0)
    i_1m = tap(-1, 1)
    i_0p = tap(2, 0)
    i_1p = tap(2, 1)
    dv = 0.5 * ((1 - fu) * ((1 - fv) * (i10 - i_0m) + fv * (i_0p - i00))
                + fu * ((1 - fv) * (i11 - i_1m) + fv * (i_1p - i01)))
    z = jnp.zeros_like(val)
    return (jnp.where(inb, val, z), jnp.where(inb, du, z),
            jnp.where(inb, dv, z))


class FlatPyramid:
    """Image pyramid flattened into one 1-D buffer for per-feature-level
    gathers (each feature samples the level it was detected/searched at,
    all in one gather op — the TPU answer to the reference's per-feature
    `img_pyr_[level]` pointer chasing)."""

    def __init__(self, pyramid):
        self.flat = jnp.concatenate([lvl.ravel() for lvl in pyramid])
        offs, o = [], 0
        self.widths = jnp.array([lvl.shape[1] for lvl in pyramid], jnp.int32)
        self.heights = jnp.array([lvl.shape[0] for lvl in pyramid], jnp.int32)
        for lvl in pyramid:
            offs.append(o)
            o += lvl.shape[0] * lvl.shape[1]
        self.offsets = jnp.array(offs, jnp.int32)

    def tree_flatten(self):
        return (self.flat, self.widths, self.heights, self.offsets), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.flat, obj.widths, obj.heights, obj.offsets = children
        return obj


jax.tree_util.register_pytree_node(
    FlatPyramid, FlatPyramid.tree_flatten, FlatPyramid.tree_unflatten)


def pyr_bilinear(pyr: FlatPyramid, level: jax.Array, uv: jax.Array,
                 ) -> tuple[jax.Array, jax.Array]:
    """Bilinear sample at per-element pyramid `level` (level-local coords).

    level: [...] i32 broadcastable against uv[..., 0]. Returns (val, inb).
    """
    w = pyr.widths[level]
    h = pyr.heights[level]
    off = pyr.offsets[level]
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    x0 = jnp.clip(u0.astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(v0.astype(jnp.int32), 0, h - 2)
    inb = (u >= 0) & (v >= 0) & (u <= (w - 1).astype(u.dtype) - 1e-6) \
        & (v <= (h - 1).astype(v.dtype) - 1e-6)
    base = off + y0 * w + x0
    i00 = pyr.flat[base]
    i01 = pyr.flat[base + 1]
    i10 = pyr.flat[base + w]
    i11 = pyr.flat[base + w + 1]
    val = ((1 - fu) * (1 - fv) * i00 + fu * (1 - fv) * i01
           + (1 - fu) * fv * i10 + fu * fv * i11)
    return jnp.where(inb, val, 0.0), inb


def pyr_nearest(pyr: FlatPyramid, level: jax.Array, xi: jax.Array,
                yi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Integer-coordinate sample at per-element pyramid level."""
    w = pyr.widths[level]
    h = pyr.heights[level]
    off = pyr.offsets[level]
    inb = (xi >= 0) & (yi >= 0) & (xi < w) & (yi < h)
    idx = off + jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
    return jnp.where(inb, pyr.flat[idx], 0.0), inb


def patch_offsets(patch_size: int, dtype=jnp.float32) -> jax.Array:
    """[P², 2] (du, dv) offsets centered on the patch:
    du, dv ∈ [-P/2, P/2) matching the reference's top-left = px - P/2."""
    half = patch_size / 2.0
    r = jnp.arange(patch_size, dtype=dtype) - half
    du, dv = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([du.ravel(), dv.ravel()], axis=-1)


def extract_patches(img: jax.Array, centers: jax.Array,
                    patch_size: int) -> tuple[jax.Array, jax.Array]:
    """Batched axis-aligned patch extraction with bilinear sampling.

    centers: [N, 2] float coords. Returns (patches [N, P²], all_in_bounds [N]).
    """
    offs = patch_offsets(patch_size, centers.dtype)       # [P², 2]
    uv = centers[:, None, :] + offs[None, :, :]           # [N, P², 2]
    vals, inb = bilinear(img, uv)
    return vals, jnp.all(inb, axis=-1)
