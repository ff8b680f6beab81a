"""Neural field models.

All models share one contract (parity with reference
``learn_nerf/model.py:12-27``, generalized to arbitrary leading batch dims
so the renderer can feed ``[N, T, 3]`` directly without flattening):

``model.apply({"params": p}, x[..., 3], d[..., 3])`` returns

* ``density``: ``[..., 1]`` non-negative densities,
* ``rgb``: ``[..., 3]`` colors in ``[-1, 1]``,
* ``aux``: dict of ``[...]`` per-point auxiliary losses.
"""

from .base import FieldModel
from .vanilla import NeRFModel
from .ref_nerf import RefNeRFBase, RefNeRFModel
from .instant_ngp import HashGridEncoding, InstantNGPModel, InstantNGPRefNeRFModel

__all__ = [
    "FieldModel",
    "NeRFModel",
    "RefNeRFBase",
    "RefNeRFModel",
    "HashGridEncoding",
    "InstantNGPModel",
    "InstantNGPRefNeRFModel",
]
