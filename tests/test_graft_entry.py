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


def test_dryrun_multichip_hermetic_subprocess():
    """Regression for round-1 driver failure (MULTICHIP_r01 rc=1).

    The driver calls dryrun_multichip in an environment with NO
    JAX_PLATFORMS / XLA_FLAGS presets and a possibly-broken default TPU
    plugin; the function must force the CPU platform and device count
    itself.  Run it in a subprocess with both vars stripped.
    """
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # Skip the TPU chip claim so the test does not serialize on the chip;
    # platform selection is still entirely up to dryrun_multichip.
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
            "import jax; assert jax.default_backend() == 'cpu'",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in proc.stdout
