"""Surface initializer variants (svox2.py:770-961): SDF outwards/plane_init/
single_sphere, UDF sphere/single_lv/single_lv_multi_sphere, PLANE
random/sphere, UDF_ALPHA per-level-set alpha."""
import numpy as np
import pytest

import alphasurf_tpu as at
from alphasurf_tpu import defs
from alphasurf_tpu.core.grid import create_grid


def test_sdf_outwards_sign_structure():
    g = create_grid(12, surface_type=defs.SURFACE_TYPE_SDF,
                    surface_init="outwards")
    s = np.asarray(g.surface_data)[:, 0]
    assert (s > 0).any() and (s < 0).any()
    assert np.abs(s).max() <= 1.0


def test_sdf_plane_init_alternates_along_x():
    g = create_grid(8, surface_type=defs.SURFACE_TYPE_SDF,
                    surface_init="plane_init")
    links = np.asarray(g.links)
    s = np.asarray(g.surface_data)[:, 0]
    # odd x slabs negative, even positive (svox2.py:843-846)
    assert (s[links[1].reshape(-1)] < 0).all()
    assert (s[links[2].reshape(-1)] > 0).all()


def test_sdf_single_sphere_scaled():
    g = create_grid(16, surface_type=defs.SURFACE_TYPE_SDF,
                    surface_init="single_sphere")
    s = np.asarray(g.surface_data)[:, 0]
    # rescaled to max |s| ~ 10 * (rs - r/2) / rs_max; center most negative
    links = np.asarray(g.links)
    assert s[links[8, 8, 8]] < 0
    assert s[links[0, 0, 0]] > 0


def test_udf_variants():
    g = create_grid(16, surface_type=defs.SURFACE_TYPE_UDF,
                    surface_init="sphere")
    assert np.asarray(g.level_set_data).shape[0] > 1  # multi level sets
    s = np.asarray(g.surface_data)[:, 0]
    assert (s >= 0).all()  # distances

    g2 = create_grid(16, surface_type=defs.SURFACE_TYPE_UDF,
                     surface_init="single_lv")
    np.testing.assert_allclose(np.asarray(g2.level_set_data), [64.0])

    g3 = create_grid(16, surface_type=defs.SURFACE_TYPE_UDF,
                     surface_init="single_lv_multi_sphere")
    np.testing.assert_allclose(np.asarray(g3.level_set_data), [64.0])
    s3 = np.asarray(g3.surface_data)[:, 0]
    # values oscillate around the level set
    assert (s3 > 64).any() and (s3 < 64).any()


def test_udf_alpha_per_levelset_density():
    g = create_grid(8, surface_type=defs.SURFACE_TYPE_UDF_ALPHA,
                    surface_init="sphere")
    assert g.density_data.shape[0] == g.level_set_data.shape[0]


def test_plane_type_inits():
    g = create_grid(8, surface_type=defs.SURFACE_TYPE_PLANE,
                    surface_init="random")
    d4 = np.asarray(g.surface_data)
    assert d4.shape[1] == 4
    np.testing.assert_allclose(
        np.linalg.norm(d4[:, :3], axis=-1), 1.0, rtol=1e-5
    )
    # plane passes through its vertex: a*x + b*y + c*z + d == 0
    links = np.asarray(g.links)
    coords = np.argwhere(links >= 0)
    rows = links[links >= 0]
    resid = np.sum(coords * d4[rows, :3], axis=-1) + d4[rows, 3]
    np.testing.assert_allclose(resid, 0.0, atol=1e-4)

    g2 = create_grid(8, surface_type=defs.SURFACE_TYPE_PLANE,
                     surface_init="sphere")
    d4b = np.asarray(g2.surface_data)
    # normals point radially outward from center
    c = np.asarray(g2.reso) / 2.0
    v = coords - c
    v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    dots = np.sum(v * d4b[rows, :3], axis=-1)
    assert (dots > 0.99).mean() > 0.9


def test_unknown_init_raises():
    with pytest.raises(NotImplementedError):
        create_grid(8, surface_type=defs.SURFACE_TYPE_SDF,
                    surface_init="bogus")
