"""Native (C++) PNG decoder + threaded prefetch loader vs PIL oracle."""

import numpy as np
import pytest

from svo_pro_universal_tpu import native_loader as nl


@pytest.fixture(scope="module")
def lib_ok():
    if not nl.native_available():
        pytest.skip("native library not buildable here")
    return True


def _write_pngs(tmp_path, n=6, shape=(48, 64), rng_seed=0):
    from PIL import Image
    rng = np.random.default_rng(rng_seed)
    paths, arrays = [], []
    for k in range(n):
        arr = rng.integers(0, 255, shape, dtype=np.uint8)
        p = str(tmp_path / f"img_{k}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_decode_matches_pil(lib_ok, tmp_path):
    paths, arrays = _write_pngs(tmp_path, n=3)
    for p, ref in zip(paths, arrays):
        out = nl.decode_png_gray8(open(p, "rb").read())
        assert out is not None
        np.testing.assert_array_equal(out, ref)


def test_decode_rgb_to_gray(lib_ok, tmp_path):
    from PIL import Image
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(arr).save(p)
    out = nl.decode_png_gray8(open(p, "rb").read())
    assert out is not None and out.shape == (32, 40)
    a = arr.astype(int)
    luma = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
    assert np.abs(out.astype(int) - luma).max() <= 1

def test_prefetch_loader_in_order(lib_ok, tmp_path):
    paths, arrays = _write_pngs(tmp_path, n=8)
    loader = nl.PrefetchLoader(paths, capacity=3, n_threads=3)
    got = list(loader)
    loader.close()
    assert len(got) == 8
    for g, ref in zip(got, arrays):
        np.testing.assert_array_equal(g, ref)
