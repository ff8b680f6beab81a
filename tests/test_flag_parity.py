"""CLI flag parity vs the reference (surface-compatibility guarantee).

A user of the reference must be able to reuse their command lines
unchanged: every ``--flag`` a reference script accepts
(`/root/reference/learn_nerf/scripts/*.py`) must exist on the
corresponding CLI here.  Ours may add flags (occupancy, schedules,
sharding, ...) — the assertion is one-directional.

The reference side is read from source (its parsers are built inline in
``main()``, so importing them would run the scripts); the regex matches
exactly the ``add_argument("--...")`` literals its argparse style uses.
Our side asks the live parsers via ``--help`` semantics where a factory
exists, falling back to the same source scan otherwise — keeping this
test green against refactors of how our parsers are assembled.
"""

import os
import re

import pytest

REFERENCE_SCRIPTS = "/root/reference/learn_nerf/scripts"

# reference script stem -> our module (all under learn_nerf_tpu.scripts)
PAIRS = {
    "train_nerf": "train_nerf",
    "render_nerf": "render_nerf",
    "render_nerf_spin": "render_nerf_spin",
    "render_nerf_pan": "render_nerf_pan",
    "render_new_dataset": "render_new_dataset",
    "marching_cubes": "marching_cubes",
    "cv_nerf": "cv_nerf",
    "check_bbox": "check_bbox",
    "plot_log": "plot_log",
}

_FLAG_RE = re.compile(r'add_argument\(\s*"(--[A-Za-z0-9_]+)"')


def _source_flags(path):
    with open(path) as f:
        return set(_FLAG_RE.findall(f.read()))


def _our_flags(module_name):
    """Flags of our script: live parser factory (when one exists) UNIONED
    with a source scan of the module and the shared scripts/common.py
    factories — some scripts (spin/pan) extend the shared parser inside
    ``main()``, which only the source scan sees."""
    import importlib

    mod = importlib.import_module(f"learn_nerf_tpu.scripts.{module_name}")
    flags = set()
    for factory in ("argparser", "base_argparser"):
        fn = getattr(mod, factory, None)
        if fn is not None:
            flags |= {
                opt
                for action in fn()._actions
                for opt in action.option_strings
                if opt.startswith("--")
            }
    from learn_nerf_tpu.scripts import common

    return (
        flags | _source_flags(mod.__file__) | _source_flags(common.__file__)
    )


@pytest.mark.parametrize("ref_stem", sorted(PAIRS))
def test_reference_flags_all_exist_here(ref_stem):
    ref_path = os.path.join(REFERENCE_SCRIPTS, f"{ref_stem}.py")
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not available")
    ref_flags = _source_flags(ref_path)
    # check_bbox takes only a positional data_dir; the empty-set guard
    # protects the regex against rot on every other script.
    if ref_stem != "check_bbox":
        assert ref_flags, f"regex found no flags in {ref_path} — update the test"
    ours = _our_flags(PAIRS[ref_stem])
    missing = ref_flags - ours
    assert not missing, (
        f"{ref_stem}: reference flags missing from our CLI: {sorted(missing)}"
    )
