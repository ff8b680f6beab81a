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
    os.rename(tmp, path)


def save_params_pickle(path: str, params: Any) -> None:
    """Save ``{"coarse", "fine", "background"}`` params as a pickle."""
    host_params = jax.device_get(params)
    _atomic_write(path, pickle.dumps(host_params))


def load_params_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_train_state(path: str, state: Any) -> None:
    """Full train state (params + optimizer + step), atomic msgpack."""
    _atomic_write(path, serialization.to_bytes(jax.device_get(state)))


def load_train_state(path: str, template: Any) -> Any:
    """Restore a full train state into the structure of ``template``."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
