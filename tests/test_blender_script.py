"""blender_gt.py is bpy-only (runs inside Blender): CI can only assert it
parses, exposes the three modes, and never leaks a bpy import into the
package."""
import ast
from os import path

SCRIPT = path.join(path.dirname(path.dirname(path.abspath(__file__))),
                   "alphasurf_tpu", "scripts", "blender_gt.py")


def test_parses_and_has_modes():
    tree = ast.parse(open(SCRIPT).read())
    fns = {n.name for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)}
    assert {"mode_train", "mode_replay", "mode_demo"} <= fns


def test_package_never_imports_bpy():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import alphasurf_tpu, sys; "
         "assert 'bpy' not in sys.modules; print('ok')"],
        capture_output=True, text=True, timeout=240)
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr
