"""Driver contract tests: entry() compiles, dryrun_multichip(8) executes."""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_graft():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    import jax

    mod = load_graft()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    mod = load_graft()
    mod.dryrun_multichip(8)
