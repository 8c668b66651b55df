"""Edge-depth utilities: Elder-Zucker edge detection + photometric 1-dof
depth refinement (reference: elder_zucker.cpp, depth_estimation.h)."""

import jax
import jax.numpy as jnp
import numpy as np

from svo_pro_universal_tpu.ops import edge_depth as ed
from svo_pro_universal_tpu.ops import interp as ip
from svo_pro_universal_tpu.ops.pyramid import build_pyramid
from svo_pro_universal_tpu.testing import synthetic as syn
from svo_pro_universal_tpu.utils.transform import SE3, se3_exp


def _step_image(h=96, w=128, edge_col=64, lo=40.0, hi=200.0):
    img = np.full((h, w), lo, np.float32)
    img[:, edge_col:] = hi
    return jnp.asarray(img)


class TestDetectEdges:
    def test_step_edge_localized(self):
        img = _step_image()
        pyr = build_pyramid(img, 4)
        out = jax.jit(ed.detect_edges)(pyr)
        resp = np.abs(np.asarray(out.edge))
        # responses concentrate in a band around the step column
        band = resp[8:-8, 56:72]
        flat = np.concatenate([resp[8:-8, 8:48], resp[8:-8, 80:-8]], axis=1)
        assert band.max() > 0.0
        assert flat.max() == 0.0

    def test_flat_image_silent(self):
        img = jnp.full((96, 128), 127.0)
        pyr = build_pyramid(img, 4)
        out = ed.detect_edges(pyr)
        assert float(jnp.max(jnp.abs(out.edge))) == 0.0
        assert float(jnp.max(out.level)) == 0

    def test_level_map_within_range(self):
        img = syn.textured_image()
        pyr = build_pyramid(img, 4)
        out = ed.detect_edges(pyr)
        lev = np.asarray(out.level)
        assert lev.min() >= 0 and lev.max() <= 2   # n_levels-1 participate
        # gradient angle is consistent with a vertical step edge
        step = _step_image()
        out2 = ed.detect_edges(build_pyramid(step, 4))
        a = np.asarray(out2.angle)
        e = np.abs(np.asarray(out2.edge))
        strong = e > 0.5 * e.max()
        # vertical edge → gradient along +x → angle ≈ 0
        assert np.abs(np.cos(a[strong])).mean() > 0.9


class TestRefineDepthPhotometric:
    def _setup(self, n=60, depth_err=0.12, seed=1):
        rng = np.random.default_rng(seed)
        img_ref = syn.textured_image(seed=3)
        slope = (0.25, -0.15)
        tw = jnp.asarray([0.04, -0.02, 0.015, 0.004, -0.006, 0.003])
        T_cur_ref = se3_exp(tw)
        img_cur = syn.render_plane_view(img_ref, T_cur_ref, slope=slope)

        uv = jnp.asarray(
            np.stack([rng.uniform(20, syn.W - 20, n),
                      rng.uniform(20, syn.H - 20, n)], -1), jnp.float32)
        f_ref = syn.backproject(syn.CAM, uv)
        d_true = syn.plane_depth(f_ref, slope=slope)
        # reference patches from the ref image at level 0
        r = jnp.arange(ed.PATCH, dtype=jnp.float32) - (ed.HALF_PATCH - 0.5)
        ou, ov = jnp.meshgrid(r, r, indexing="xy")
        offs = jnp.stack([ou.ravel(), ov.ravel()], -1)
        pts = uv[:, None, :] + offs[None]
        ref_patch, _ = ip.bilinear(img_ref, pts.reshape(-1, 2))
        ref_patch = ref_patch.reshape(n, -1)

        d0 = d_true * (1.0 + depth_err * jnp.asarray(
            rng.uniform(-1, 1, n), jnp.float32))
        pyr_cur = build_pyramid(img_cur, 4)
        return pyr_cur, T_cur_ref, f_ref, ref_patch, d0, d_true

    def test_converges_to_true_depth(self):
        pyr_cur, T_cr, f_ref, patches, d0, d_true = self._setup()
        n = d0.shape[0]
        out = jax.jit(ed.refine_depth_photometric, static_argnames=())(
            pyr_cur, syn.CAM, T_cr, f_ref, patches, d0,
            jnp.zeros((n,), jnp.int32), jnp.ones((n,), bool))
        conv = np.asarray(out.converged)
        assert conv.mean() > 0.7
        err0 = np.abs(np.asarray(d0 - d_true))[conv]
        err1 = np.abs(np.asarray(out.depth - d_true))[conv]
        assert np.median(err1) < 0.25 * np.median(err0)
        assert np.median(err1) < 0.02

    def test_invalid_features_untouched(self):
        pyr_cur, T_cr, f_ref, patches, d0, _ = self._setup(n=8)
        n = d0.shape[0]
        out = ed.refine_depth_photometric(
            pyr_cur, syn.CAM, T_cr, f_ref, patches, d0,
            jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))
        assert not bool(np.any(np.asarray(out.converged)))
