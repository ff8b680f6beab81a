"""Host-side data layer: cameras, datasets, out-of-core shuffling.

On-disk contract parity with the reference (``learn_nerf/dataset.py``):
per-frame ``XXXX.png`` + ``XXXX.json`` (keys ``origin, x, y, z, x_fov,
y_fov``) and a global ``metadata.json`` with ``min``/``max`` bbox.  Rays are
packed ``[N, 3, 3]`` rows of (origin, direction, color) with colors in
``[-1, 1]``.

This layer is pure NumPy/PIL on the host; device placement happens at the
jit boundary (``parallel.mesh.global_batch_from_local``).
"""

from .camera import CameraView
from .dataset import FileNeRFView, ModelMetadata, NeRFDataset, NeRFView, load_dataset
from .shuffle import ShuffledDataset

__all__ = [
    "CameraView",
    "NeRFView",
    "FileNeRFView",
    "ModelMetadata",
    "NeRFDataset",
    "ShuffledDataset",
    "load_dataset",
]
