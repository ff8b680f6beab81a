"""Dataset converters (parity with the reference ``convert_dataset/``):

* :mod:`.blender` — original-NeRF Blender-synthetic ``transforms_*.json``
* :mod:`.llff` — LLFF ``poses_bounds.npy`` real scenes
* ``blender_script.py`` / ``blender_script_random.py`` — exporters that run
  *inside* Blender (no JAX/numpy deps beyond Blender's python)
"""
