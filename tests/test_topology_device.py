"""Device-side resample == host resample (core.topology_device vs
core.topology) on randomized sparse grids, including the alpha/sigma
threshold, max_elements top-k bound, dilation, and non_expanding paths."""
import numpy as np
import jax.numpy as jnp
import pytest

from alphasurf_tpu import defs
from alphasurf_tpu.core.grid import create_grid
from alphasurf_tpu.core import topology, topology_device


def _rand_grid(rng, reso=(9, 10, 11), surface=True, hole_frac=0.3):
    g = create_grid(
        reso=reso, basis_dim=4,
        surface_type=defs.SURFACE_TYPE_SDF if surface else defs.SURFACE_TYPE_NONE,
        surface_init="sphere" if surface else None,
    )
    links = np.asarray(g.links).copy().reshape(-1)
    drop = rng.random(links.size) < hole_frac
    keep = ~drop
    new_links = np.full(links.size, -1, np.int32)
    new_links[keep] = np.arange(keep.sum(), dtype=np.int32)
    cap = int(keep.sum())
    old_rows = links[keep]
    g = g.replace(
        links=jnp.asarray(new_links.reshape(reso)),
        density_data=jnp.asarray(
            rng.standard_normal((links.size, 1)).astype(np.float32)[old_rows] + 1.0
        ),
        sh_data=jnp.asarray(
            rng.standard_normal((links.size, 12)).astype(np.float32)[old_rows]
        ),
    )
    if surface:
        g = g.replace(
            surface_data=jnp.asarray(
                rng.standard_normal((links.size, 1)).astype(np.float32)[old_rows]
            )
        )
    return g


def _assert_grids_equal(a, b, atol=2e-5):
    np.testing.assert_array_equal(np.asarray(a.links), np.asarray(b.links))
    assert a.capacity == b.capacity
    np.testing.assert_allclose(
        np.asarray(a.density_data), np.asarray(b.density_data), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(a.sh_data), np.asarray(b.sh_data), atol=atol
    )
    if a.surface_data is not None:
        np.testing.assert_allclose(
            np.asarray(a.surface_data), np.asarray(b.surface_data), atol=atol
        )


@pytest.mark.parametrize("max_elements", [0, 300])
def test_resample_density_host_eq_device(max_elements):
    rng = np.random.default_rng(3)
    g = _rand_grid(rng, surface=False)
    kw = dict(sigma_thresh=1.0, dilate=1, max_elements=max_elements)
    h = topology.resample(g, (13, 12, 15), **kw)
    d = topology_device.resample_device(g, (13, 12, 15), **kw)
    assert h.capacity > 0
    _assert_grids_equal(h, d)


def test_resample_density_last_sample_opaque():
    rng = np.random.default_rng(4)
    g = _rand_grid(rng, surface=False)
    kw = dict(sigma_thresh=1e9, dilate=0, last_sample_opaque=True)
    h = topology.resample(g, (13, 12, 15), **kw)
    d = topology_device.resample_device(g, (13, 12, 15), **kw)
    assert h.capacity == 13 * 12  # only the z=-1 plane survives
    _assert_grids_equal(h, d)


@pytest.mark.parametrize("max_elements", [0, 500])
@pytest.mark.parametrize("dilate", [0, 2])
def test_resample_surface_host_eq_device(max_elements, dilate):
    rng = np.random.default_rng(5)
    g = _rand_grid(rng, surface=True)
    kw = dict(alpha_thresh=0.8, dilate=dilate, max_elements=max_elements)
    h = topology.resample_surface(g, (14, 13, 16), **kw)
    d = topology_device.resample_surface_device(g, (14, 13, 16), **kw)
    assert h.capacity > 0
    _assert_grids_equal(h, d)


def test_resample_surface_sigmoid_alpha():
    rng = np.random.default_rng(6)
    g = _rand_grid(rng, surface=True)
    kw = dict(alpha_thresh=0.4, dilate=1, sigmoid_alpha=True)
    h = topology.resample_surface(g, (12, 12, 12), **kw)
    d = topology_device.resample_surface_device(g, (12, 12, 12), **kw)
    assert h.capacity > 0
    _assert_grids_equal(h, d)


def test_resample_surface_non_expanding():
    rng = np.random.default_rng(7)
    g = _rand_grid(rng, surface=True, hole_frac=0.4)
    kw = dict(alpha_thresh=0.2, dilate=1, non_expanding=True)
    h = topology.resample_surface(g, (14, 15, 13), **kw)
    d = topology_device.resample_surface_device(g, (14, 15, 13), **kw)
    assert h.capacity > 0
    _assert_grids_equal(h, d)


@pytest.mark.parametrize("prune_surf", [False, True])
def test_prune_grid_host_eq_device(prune_surf):
    rng = np.random.default_rng(9)
    g = _rand_grid(rng, surface=True)
    h = topology.prune_grid(g, density_raw_thres=1.0, dilate=1,
                            prune_surf=prune_surf)
    d = topology_device.prune_grid_device(g, density_raw_thres=1.0, dilate=1,
                                          prune_surf=prune_surf)
    assert h.capacity > 0
    _assert_grids_equal(h, d)


def test_metric_rescale_host_eq_device():
    rng = np.random.default_rng(10)
    g = _rand_grid(rng, surface=True)
    g = g.replace(level_set_data=jnp.asarray([0.0, -4.0], jnp.float32))
    h = topology._metric_rescale(g)
    d = topology_device.metric_rescale_device(g)
    np.testing.assert_allclose(
        np.asarray(h.surface_data), np.asarray(d.surface_data), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(h.level_set_data), np.asarray(d.level_set_data), rtol=2e-5
    )


def test_resample_surface_keep_lv_band():
    rng = np.random.default_rng(11)
    g = _rand_grid(rng, surface=True, hole_frac=0.2)
    # make alpha support and the surface shell disjoint: alpha only where
    # surf is strongly positive — the plain alpha mask loses the crossings
    sd = np.asarray(g.surface_data)
    g = g.replace(density_data=jnp.asarray((sd > 1.0).astype(np.float32)))
    kw = dict(alpha_thresh=0.5, dilate=0, keep_lv_band=True)
    h = topology.resample_surface(g, (14, 15, 13), **kw)
    d = topology_device.resample_surface_device(g, (14, 15, 13), **kw)
    _assert_grids_equal(h, d)
    # without the band, the crossing shell is amputated
    h0 = topology.resample_surface(
        g, (14, 15, 13), alpha_thresh=0.5, dilate=0
    )
    assert h.capacity > h0.capacity
    # every straddling voxel's corners survive: recompute occupancy-style
    sd_h = np.asarray(h.surface_data)[:, 0]
    links = np.asarray(h.links)
    pres = links >= 0
    dense = np.zeros(links.shape, np.float32)
    dense[pres] = sd_h[links[pres]]
    lv = float(np.asarray(h.level_set_data)[0])
    n_cross = 0
    X, Y, Z = links.shape
    smin = np.full((X - 1, Y - 1, Z - 1), np.inf, np.float32)
    smax = np.full((X - 1, Y - 1, Z - 1), -np.inf, np.float32)
    allp = np.ones((X - 1, Y - 1, Z - 1), bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                s = dense[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
                np.minimum(smin, s, out=smin)
                np.maximum(smax, s, out=smax)
                allp &= pres[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
    n_cross = int((allp & (smin <= lv) & (lv <= smax)).sum())
    assert n_cross > 0


def test_resample_downscale():
    rng = np.random.default_rng(8)
    g = _rand_grid(rng, surface=True, hole_frac=0.1)
    kw = dict(alpha_thresh=0.5, dilate=1)
    h = topology.resample_surface(g, (6, 7, 5), **kw)
    d = topology_device.resample_surface_device(g, (6, 7, 5), **kw)
    _assert_grids_equal(h, d)
