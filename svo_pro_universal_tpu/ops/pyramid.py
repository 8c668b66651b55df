"""Image pyramid construction (padded stack layout).

Replaces the reference's SIMD half-sampling pyramid
(reference: src/vikit/vikit_common/src/vision.cpp:19-93 halfSample SSE2/NEON,
src/svo_common/src/frame.cpp:372 createImgPyramid). Half-sampling is a 2×2
block mean — on TPU this is a reshape+mean the XLA compiler lowers to a
single fused VPU pass.

Layout: the whole pyramid is ONE padded [L, H, W] float32 array; level l
occupies the top-left (H>>l, W>>l) corner, zeros elsewhere. This uniform
shape is what makes per-feature dynamic-level tile extraction
(ops.tiles.extract_tiles) a single fast sliced gather instead of the
per-level pointer chasing of the reference's ``img_pyr_[level]``.

Images are float32 [H, W] with intensity in [0, 255] (matching the
reference's uint8 scale so thresholds transfer 1:1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def half_sample(img: jax.Array) -> jax.Array:
    """2×2 block mean; odd trailing row/col dropped (reference semantics)."""
    h, w = img.shape[-2], img.shape[-1]
    h2, w2 = h // 2, w // 2
    x = img[..., : h2 * 2, : w2 * 2]
    x = x.reshape(*img.shape[:-2], h2, 2, w2, 2)
    return x.mean(axis=(-3, -1))


def build_pyramid(img: jax.Array, n_levels: int) -> jax.Array:
    """Padded [L, H, W] pyramid; level 0 is the input image."""
    h, w = img.shape
    out = jnp.zeros((n_levels, h, w), jnp.float32)
    lvl = img.astype(jnp.float32)
    for l in range(n_levels):
        out = out.at[l, : lvl.shape[0], : lvl.shape[1]].set(lvl)
        if l + 1 < n_levels:
            lvl = half_sample(lvl)
    return out


def level_view(pyr3: jax.Array, level: int) -> jax.Array:
    """Static view of one level's valid extent (for dense per-level ops)."""
    _, h, w = pyr3.shape
    return pyr3[level, : h >> level, : w >> level]


def pyramid_levels(pyr3: jax.Array) -> tuple[jax.Array, ...]:
    """Tuple of per-level views (compatibility helper for dense ops)."""
    return tuple(level_view(pyr3, l) for l in range(pyr3.shape[0]))


def image_to_float(img) -> jax.Array:
    """uint8/float input → float32 [0, 255]."""
    arr = jnp.asarray(img)
    return arr.astype(jnp.float32)
