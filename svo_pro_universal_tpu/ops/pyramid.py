"""Image pyramid construction.

Replaces the reference's SIMD half-sampling pyramid
(reference: src/vikit/vikit_common/src/vision.cpp:19-93 halfSample SSE2/NEON,
src/svo_common/src/frame.cpp:372 createImgPyramid). Half-sampling is a 2×2
block mean — on TPU this is a reshape+mean the XLA compiler lowers to a
single fused VPU pass, so no hand-written kernel is needed; the Pallas
budget goes to the gather-heavy stages instead.

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


def build_pyramid(img: jax.Array, n_levels: int) -> tuple[jax.Array, ...]:
    """Level 0 is the input image; level l is half the size of l-1."""
    levels = [img]
    for _ in range(n_levels - 1):
        levels.append(half_sample(levels[-1]))
    return tuple(levels)


def image_to_float(img) -> jax.Array:
    """uint8/float input → float32 [0, 255]."""
    arr = jnp.asarray(img)
    if arr.dtype == jnp.uint8:
        return arr.astype(jnp.float32)
    return arr.astype(jnp.float32)
