"""Driver contract: entry() compiles, dryrun_multichip runs on a virtual mesh."""
import sys

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0], 3)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
