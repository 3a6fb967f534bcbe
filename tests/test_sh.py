"""SH basis vs reference implementation (differential test)."""
import numpy as np
import jax.numpy as jnp

from alphasurf_tpu.core.sh import eval_sh_bases
from ref_oracle import load_reference


def test_sh_matches_reference():
    import torch

    load_reference()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_utils", "/root/reference/svox2/utils.py"
    )
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)

    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    for bd in (1, 4, 9, 16, 25):
        ours = np.asarray(eval_sh_bases(bd, jnp.asarray(dirs)))
        theirs = ref_utils.eval_sh_bases(bd, torch.from_numpy(dirs)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
