"""Checkpointing.

Two formats:

* the reference's pickle contract — a dict ``{"coarse": params, "fine":
  params, "background": [3]}`` written atomically via tmp+rename
  (``learn_nerf/train.py:62-76``), consumed by every render/mesh CLI,
* a full train-state checkpoint (params + Adam moments + step counter) via
  ``flax.serialization`` msgpack, fixing the reference's lossy resume
  (params-only, SURVEY.md section 5).
"""

import os
import pickle
from typing import Any

import jax
from flax import serialization


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        # fsync BEFORE the rename: with delayed allocation a crash can
        # persist the rename but not the data blocks, replacing the only
        # good checkpoint with a truncated file.
        os.fsync(f.fileno())
    os.rename(tmp, path)
    # fsync the DIRECTORY too: the rename is a directory-entry update, so
    # a power loss after this function returns could otherwise roll the
    # path back to the previous checkpoint — and a resume would silently
    # replay steps the caller believed were persisted.
    dir_fd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def save_params_pickle(path: str, params: Any) -> None:
    """Save ``{"coarse", "fine", "background"}`` params as a pickle."""
    host_params = jax.device_get(params)
    _atomic_write(path, pickle.dumps(host_params))


def import_reference_params(params: Any) -> Any:
    """Convert a param tree saved by the *reference* implementation.

    Vanilla NeRF and Ref-NeRF trees transfer unchanged (both codebases
    create the Dense layers in the same order, so flax names match — the
    golden renderer-parity test proves byte compatibility).  Instant-NGP
    trees need renaming: the reference nests per-level tables as
    ``MultiresHashTableEncoding_i/HashTableEncoding_j/table``
    (``learn_nerf/instant_ngp.py:92-208``) where this framework owns them
    as ``HashGridEncoding_i/table_j``.
    """

    def fix_model(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for key, value in tree.items():
            if key.startswith("MultiresHashTableEncoding_"):
                idx = key.rsplit("_", 1)[1]
                tables = {
                    f"table_{k.rsplit('_', 1)[1]}": v["table"]
                    for k, v in value.items()
                }
                out[f"HashGridEncoding_{idx}"] = tables
            else:
                out[key] = fix_model(value)
        return out

    return fix_model(params)


def _is_reference_tree(params: Any) -> bool:
    def has_marker(tree):
        if not isinstance(tree, dict):
            return False
        return any(
            k.startswith("MultiresHashTableEncoding_") or has_marker(v)
            for k, v in tree.items()
        )

    return has_marker(params)


def load_params_pickle(path: str) -> Any:
    """Load a params pickle; reference-format NGP trees convert on the fly."""
    with open(path, "rb") as f:
        params = pickle.load(f)
    if _is_reference_tree(params):
        params = import_reference_params(params)
    return params


def save_train_state(path: str, state: Any) -> None:
    """Full train state (params + optimizer + step), atomic msgpack."""
    _atomic_write(path, serialization.to_bytes(jax.device_get(state)))


def _reconcile_ema(raw: Any, target: Any) -> Any:
    """Migrate ``ema_params`` mismatches between a serialized state dict
    and the loading template's state dict.

    Four cases (the field was added after the first full-state format):

    * blob lacks the field, template has it disabled (``None``): nothing.
    * blob lacks it, template has an EMA tree: seed the average from the
      blob's ``params`` (an old checkpoint resumed with ``--ema``).
    * blob has a tree, template disabled: drop it (resumed without
      ``--ema``; raw params continue, the stale average must not leak
      into eval — see ``TrainLoop.eval_params``).
    * blob has ``None`` (saved EMA-off), template enabled: seed from
      ``params``.
    """
    if isinstance(raw, dict) and isinstance(target, dict):
        t_ema, r_ema = target.get("ema_params"), raw.get("ema_params")
        if "params" in target:  # a TrainState-shaped node
            if t_ema is None:
                raw.pop("ema_params", None)
                if "ema_params" in target:
                    raw["ema_params"] = None
            elif r_ema is None:
                import numpy as np

                # COPIES, not aliases: the jitted step donates the whole
                # state, and aliased leaves would hand XLA the same
                # buffer twice (same invariant as train._ema_seed).
                raw["ema_params"] = jax.tree_util.tree_map(
                    np.array, raw.get("params")
                )
        for k, v in list(raw.items()):
            if k in target:
                _reconcile_ema(v, target[k])
    return raw


def peek_train_state_step(path: str) -> int:
    """Optimizer step counter from a full-state checkpoint, WITHOUT a
    template (no loop construction needed — the cosine-schedule CLI uses
    this before it knows the remaining step budget).

    Handles both on-disk layouts: ``TrainLoop.save_full`` serializes the
    TrainState alone (top-level ``step``); the occupancy loop serializes
    a ``(state, grid_state)`` tuple, which msgpack stores under keys
    ``"0"``/``"1"`` — the grid state has its own ``step``, so the tuple
    case must read element 0, not search for the key.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    node = raw if "step" in raw else raw["0"]
    return int(node["step"])


def load_train_state(path: str, template: Any) -> Any:
    """Restore a full train state into the structure of ``template``.

    Tolerant of the ``ema_params`` field (added later): checkpoints
    written before it load into current templates and vice versa — the
    average is seeded from (or dropped with) the checkpointed params as
    the template dictates.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    target = serialization.to_state_dict(template)
    raw = _reconcile_ema(raw, target)
    return serialization.from_state_dict(template, raw)
