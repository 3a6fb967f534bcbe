"""Native C++ runtime (csrc/native.cpp) vs NumPy oracle implementations."""
import numpy as np
import pytest

from alphasurf_tpu.utils import native


def _lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_marching_tetrahedra_matches_python():
    _lib()
    from alphasurf_tpu.geometry.extract import marching_tetrahedra

    rng = np.random.default_rng(0)
    field = rng.standard_normal((9, 10, 11)).astype(np.float32)
    # smooth it so the surface is non-trivial but not noise
    for ax in range(3):
        field = 0.5 * field + 0.25 * (
            np.roll(field, 1, axis=ax) + np.roll(field, -1, axis=ax)
        )
    v_py, f_py = marching_tetrahedra(field, level=0.05, use_native=False)
    out = native.marching_tetrahedra(field, level=0.05)
    assert out is not None
    v_nat, f_nat = out
    assert len(v_nat) == len(v_py)
    # same triangle soup up to ordering: compare sorted centroid sets
    c_py = np.sort(v_py.reshape(-1, 3, 3).mean(1), axis=0)
    c_nat = np.sort(v_nat.reshape(-1, 3, 3).mean(1), axis=0)
    np.testing.assert_allclose(c_nat, c_py, rtol=1e-5, atol=1e-6)


def test_voxel_downsample_matches_numpy():
    _lib()
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((5000, 3)).astype(np.float32)
    idx = native.voxel_downsample_indices(pts, 0.25)
    assert idx is not None
    keys = np.floor(pts / 0.25).astype(np.int64)
    _, ref_idx = np.unique(keys, axis=0, return_index=True)
    np.testing.assert_array_equal(np.sort(idx), np.sort(ref_idx))


def test_shuffle_gather_matches_numpy():
    _lib()
    rng = np.random.default_rng(2)
    src = rng.standard_normal((10000, 3)).astype(np.float32)
    perm = rng.permutation(10000)
    out = native.shuffle_gather(src, perm)
    assert out is not None
    np.testing.assert_array_equal(out, src[perm])
