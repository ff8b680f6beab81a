"""Orbax checkpoint backend (optional, for multi-host sharded state).

The pickle contract (:mod:`learn_nerf_tpu.checkpoint`) covers single-host
use and reference-surface compatibility; this module adds orbax-backed
checkpoints that write each process's shards in parallel and restore with
the correct shardings — the right tool once the mesh spans hosts
(SURVEY.md section 5: "orbax-style sharded checkpoint incl. optimizer
state + step").
"""

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_orbax(path: str, state: Any) -> None:
    """Save a pytree (e.g. a full TrainState) as an orbax checkpoint dir."""
    _checkpointer().save(os.path.abspath(path), state, force=True)


def load_orbax(path: str, template: Any) -> Any:
    """Restore into the structure/shardings of ``template``.

    Host-side template leaves (plain numpy, no ``.sharding``) get a bare
    ``RestoreArgs`` — mapping them to ``None`` would DELETE those leaves
    from the pytree (None is an empty subtree to JAX) and break the
    structural match orbax requires.
    """
    import orbax.checkpoint as ocp

    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(sharding=x.sharding)
        if hasattr(x, "sharding")
        else ocp.RestoreArgs(),
        template,
    )
    return _checkpointer().restore(
        os.path.abspath(path), item=template, restore_args=restore_args
    )
