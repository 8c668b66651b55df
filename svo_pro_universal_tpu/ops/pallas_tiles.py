"""Pallas TPU kernel: batched tile gather from a padded pyramid.

THE measured hot spot of the frontend (see bench.py stage profile): every
patch operation — sparse image alignment, reprojection matching, epipolar
depth-filter scans — starts by cutting one axis-aligned tile per feature
out of a pyramid at a dynamic, per-feature origin. XLA lowers the vmapped
``dynamic_slice`` formulation (ops/tiles.py) to a serialized gather:
360 tiles × 24×24 f32 cost ~0.58 ms on v5e — ~1.6 µs per 2.3 KB transfer,
~40× off HBM speed-of-light. This stage is the direct analogue of the
texture-cache patch loads in the reference's dormant CUDA module
(reference: src/svo_img_align/src/sparse_img_align_device_utils.cu:1-1407,
baseJacobian/residual device kernels).

Kernel design:

- The pyramid stays in HBM (``pltpu.ANY``); the grid walks feature blocks
  of B=8; each step issues B independent async DMAs — one per feature —
  and only then waits, so B transfers stay in flight and per-DMA
  descriptor latency overlaps.
- Per-feature origins arrive via ``PrefetchScalarGridSpec`` (they must be
  known before the step body runs to program the DMA engines).
- HBM arrays are (8, 128)-tiled, so a DMA window must start at a
  sublane-×8 / lane-×128 aligned origin (``pl.multiple_of`` makes the
  guarantee provable to Mosaic). Callers therefore request an ALIGNED
  SUPERSET tile — rows rounded to ≥ R+7 (mult. of 8), columns to ≥ T+127
  (mult. of 128) — and sample inside it; ``ops.tiles.TileBatch`` carries
  the aligned origin, so the in-tile bilinear-form samplers work
  unchanged (they were measured at < 0.05 ms even on 32×256 supersets).

Measured (v5e, 360 tiles, marginal fori-loop timing): 0.583 ms (XLA
gather, exact 24×24) → 0.008 ms (Pallas, aligned 32×128) / 0.050 ms
(32×256) — 12–70× on the gather itself.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 8      # features per grid step = DMAs in flight


def round_rows(r: int) -> int:
    """Aligned superset row count: covers r rows at any ×8 origin."""
    return -(-(r + 7) // 8) * 8


def round_cols(t: int) -> int:
    """Aligned superset column count: covers t cols at any ×128 origin."""
    return -(-(t + 127) // 128) * 128


def _kernel_pyr(lvl_ref, y0_ref, x0_ref, pyr_ref, out_ref, sems,
                *, R: int, T: int, B: int):
    i = pl.program_id(0)

    def dma(b):
        n = i * B + b
        y = pl.multiple_of(y0_ref[n], 8)
        x = pl.multiple_of(x0_ref[n], 128)
        return pltpu.make_async_copy(
            pyr_ref.at[lvl_ref[n], pl.ds(y, R), pl.ds(x, T)],
            out_ref.at[b],
            sems.at[b])

    for b in range(B):          # static unroll: B DMAs in flight
        dma(b).start()
    for b in range(B):
        dma(b).wait()


def _kernel_ring(kf_ref, lvl_ref, y0_ref, x0_ref, ring_ref, out_ref, sems,
                 *, R: int, T: int, B: int):
    i = pl.program_id(0)

    def dma(b):
        n = i * B + b
        y = pl.multiple_of(y0_ref[n], 8)
        x = pl.multiple_of(x0_ref[n], 128)
        return pltpu.make_async_copy(
            ring_ref.at[kf_ref[n], lvl_ref[n], pl.ds(y, R), pl.ds(x, T)],
            out_ref.at[b],
            sems.at[b])

    for b in range(B):
        dma(b).start()
    for b in range(B):
        dma(b).wait()


def _pad_n(arrs, n):
    """Pad leading dims to a multiple of _BLOCK (index 0 repeats)."""
    pad = (-n) % _BLOCK
    if pad == 0:
        return arrs, n
    return [jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)
            for a in arrs], n + pad


def gather_tiles(pyr3: jax.Array, level: jax.Array, y0: jax.Array,
                 x0: jax.Array, R: int, T: int,
                 interpret: bool = False) -> jax.Array:
    """[N, R, T] tiles from a padded [L, H, W] pyramid at per-feature
    (level, y0, x0) origins. y0 must be ×8-aligned and x0 ×128-aligned
    (use round_rows/round_cols supersets); origins pre-clipped in-bounds.
    """
    n = level.shape[0]
    (level, y0, x0), np_ = _pad_n([level, y0, x0], n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(np_ // _BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_BLOCK, R, T), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_BLOCK,))],
    )
    kern = functools.partial(_kernel_pyr, R=R, T=T, B=_BLOCK)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_, R, T), pyr3.dtype),
        interpret=interpret,
    )(level, y0, x0, pyr3)
    return out[:n]


def gather_tiles_ring(ring4: jax.Array, kf: jax.Array, level: jax.Array,
                      y0: jax.Array, x0: jax.Array, R: int, T: int,
                      interpret: bool = False) -> jax.Array:
    """Like :func:`gather_tiles` but from a stacked keyframe-ring pyramid
    [K, L, H, W] with an additional per-feature keyframe index."""
    n = level.shape[0]
    (kf, level, y0, x0), np_ = _pad_n([kf, level, y0, x0], n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(np_ // _BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_BLOCK, R, T), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_BLOCK,))],
    )
    kern = functools.partial(_kernel_ring, R=R, T=T, B=_BLOCK)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_, R, T), ring4.dtype),
        interpret=interpret,
    )(kf, level, y0, x0, ring4)
    return out[:n]


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """True when the default backend runs Mosaic TPU kernels."""
    if os.environ.get("SVO_NO_PALLAS", ""):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:       # pragma: no cover
        return False
