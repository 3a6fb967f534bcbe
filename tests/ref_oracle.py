"""Load the reference implementation (read-only, /root/reference) as a
differential-testing oracle.

We import the reference's pure-PyTorch renderer and call it on CPU — calling
upstream code in tests is the same differential-testing pattern the reference
itself uses (CUDA kernel vs pure-torch, test/test_render_gradcheck_surface.py)
with our JAX implementation in the "kernel" role.

Unavailable optional deps (mcubes, kaolin) are stubbed; the single hardcoded
``device='cuda'`` tensor in the oracle's l_entropy term (svox2.py:2482) is
redirected to CPU by patching ``torch.tensor``.
"""
import sys
import types

import numpy as np

_ref = None


def load_reference():
    global _ref
    if _ref is not None:
        return _ref
    sys.path.insert(0, "/root/reference")
    for name in ["mcubes"]:
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = types.ModuleType(name)
    import torch

    _orig_tensor = torch.tensor

    def _tensor(*a, **kw):
        if kw.get("device", None) == "cuda":
            kw["device"] = "cpu"
        return _orig_tensor(*a, **kw)

    torch.tensor = _tensor
    import svox2 as ref_svox2

    # In-memory fix of the oracle's use-before-assign bug (svox2.py:2550):
    # with surf_fake_sample OFF, the l_ss extra-loss block still indexes
    # ``fake_sample_ids``, which only exists when fake samples are on —
    # EVERY fake-off render crashes. Guard that single line so fake-off
    # parity comparisons are possible (the reference ON DISK is untouched).
    import inspect
    import textwrap

    src = inspect.getsource(ref_svox2.SparseGrid._surface_render_gradcheck_lerp)
    buggy = "real_sample_mask[fake_sample_ids, :] = False"
    patched = textwrap.dedent(src).replace(
        buggy,
        "if self.opt.surf_fake_sample:\n    "
        "            " + buggy,
        1,
    )
    ns = dict(ref_svox2.svox2.__dict__)
    exec(compile(patched, "<svox2-patched>", "exec"), ns)
    ref_svox2.SparseGrid._surface_render_gradcheck_lerp = ns[
        "_surface_render_gradcheck_lerp"
    ]

    _ref = ref_svox2
    return _ref


def make_ref_grid(
    reso=8,
    radius=1.0,
    center=(0.0, 0.0, 0.0),
    basis_dim=9,
    surface_type="sdf",
    seed=0,
    sigma_scale=0.5,
    surf_scale=1.0,
    sh_scale=0.5,
    prune_frac=0.0,
):
    """Random reference SparseGrid on CPU + numpy copies of its arrays."""
    ref = load_reference()
    import torch

    st = {
        "sdf": ref.SURFACE_TYPE_SDF,
        "udf": ref.SURFACE_TYPE_UDF,
        "none": ref.SURFACE_TYPE_NONE,
    }[surface_type]
    g = ref.SparseGrid(
        reso=reso,
        radius=radius,
        center=list(center),
        basis_dim=basis_dim,
        device="cpu",
        surface_type=st,
        surface_init="sphere" if st != ref.SURFACE_TYPE_NONE else None,
        use_octree=False,
        trainable_fake_sample_std=True,
    )
    gen = torch.Generator().manual_seed(seed)
    g.density_data.data = torch.randn(g.density_data.shape, generator=gen) * sigma_scale
    g.sh_data.data = torch.randn(g.sh_data.shape, generator=gen) * sh_scale
    if g.surface_data is not None:
        g.surface_data.data = (
            g.surface_data.data + torch.randn(g.surface_data.shape, generator=gen) * surf_scale
        )
    if prune_frac > 0:
        links = g.links.reshape(-1).clone()
        n = links.numel()
        drop = torch.rand(n, generator=gen) < prune_frac
        links[drop] = -1
        g.links = links.reshape(g.links.shape)
    return g


def grid_to_jax(g, dtype=None):
    """Copy a reference grid's arrays into an alphasurf_tpu SparseGrid."""
    import jax.numpy as jnp

    import alphasurf_tpu as at

    dtype = dtype or jnp.float32
    surface = None
    level_sets = None
    if g.surface_data is not None:
        surface = jnp.asarray(g.surface_data.data.numpy(), dtype)
        level_sets = jnp.asarray(g.level_set_data.numpy(), dtype)
    fss = None
    if g.fake_sample_std is not None:
        fss = jnp.asarray(g.fake_sample_std.data.numpy(), dtype)
    return at.SparseGrid(
        links=jnp.asarray(g.links.numpy()),
        density_data=jnp.asarray(g.density_data.data.numpy(), dtype),
        sh_data=jnp.asarray(g.sh_data.data.numpy(), dtype),
        surface_data=surface,
        level_set_data=level_sets,
        fake_sample_std=fss,
        truncated_vol_render_a=jnp.asarray(float(g.truncated_vol_render_a), dtype),
        radius=jnp.asarray(g.radius.numpy(), dtype),
        center=jnp.asarray(g.center.numpy(), dtype),
        basis_dim=g.basis_dim,
        surface_type=g.surface_type,
    )


def make_rays(n=32, seed=1, dist=2.5):
    """Random inward-looking rays from outside the [-1,1] cube."""
    rng = np.random.default_rng(seed)
    origins = rng.standard_normal((n, 3))
    origins = origins / np.linalg.norm(origins, axis=-1, keepdims=True) * dist
    targets = rng.uniform(-0.5, 0.5, (n, 3))
    dirs = targets - origins
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return origins.astype(np.float32), dirs.astype(np.float32)
