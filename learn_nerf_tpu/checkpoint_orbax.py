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
    """Restore into the structure/shardings of ``template``."""
    import orbax.checkpoint as ocp

    shardings = jax.tree_util.tree_map(
        lambda x: x.sharding if hasattr(x, "sharding") else None, template
    )
    restore_args = jax.tree_util.tree_map(
        lambda s: ocp.ArrayRestoreArgs(sharding=s) if s is not None else None,
        shardings,
    )
    return _checkpointer().restore(
        os.path.abspath(path), item=template, restore_args=restore_args
    )
