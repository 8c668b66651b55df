"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    state, stats = jax.jit(fn)(*args)
    assert np.isfinite(float(stats.chi2))
    # the rolled image is a pure +2px x-shift → x-translation recovered
    assert abs(float(state.T_icur_iref.t[0])) > 1e-3


@pytest.mark.slow  # compile-bound: full training-step jit on a virtual mesh
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


@pytest.mark.slow  # compile-bound on the virtual 8-device mesh
def test_distributed_align_matches_single_device():
    import __graft_entry__ as ge
    from jax.sharding import Mesh
    from svo_pro_universal_tpu.ops import sparse_img_align as sia
    from svo_pro_universal_tpu.parallel.mesh import FEATURE_AXIS
    from svo_pro_universal_tpu.parallel.sharded_ops import distributed_align

    inp, _ = ge._synthetic_inputs(h=48, w=64, n_feat=32)
    opts = sia.SparseImgAlignOptions(max_level=1, min_level=0, max_iter=5)
    single, _ = sia.run([inp], sia.make_state(), opts)

    mesh = Mesh(np.array(jax.devices()[:8]), (FEATURE_AXIS,))
    multi, _ = distributed_align(inp, sia.make_state(), opts, mesh)
    np.testing.assert_allclose(np.asarray(single.T_icur_iref.t),
                               np.asarray(multi.T_icur_iref.t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(single.T_icur_iref.q),
                               np.asarray(multi.T_icur_iref.q), atol=1e-5)
