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


def test_resample_downscale():
    rng = np.random.default_rng(8)
    g = _rand_grid(rng, surface=True, hole_frac=0.1)
    kw = dict(alpha_thresh=0.5, dilate=1)
    h = topology.resample_surface(g, (6, 7, 5), **kw)
    d = topology_device.resample_surface_device(g, (6, 7, 5), **kw)
    _assert_grids_equal(h, d)
