"""Export a Blender animation as a NeRF dataset (run inside Blender).

Behaviour parity with the reference ``convert_dataset/blender_script.py``:
each animation frame renders to ``{i:05}.png`` with a camera JSON built
from ``matrix_world`` columns (``x = col0``, ``y = -col1``, ``z = -col2``)
and the scene bbox (excluding cameras/lights) written to ``metadata.json``.

Usage: set OUTPUT_DIR below, then run in Blender's Scripting tab.
"""

import json
import math
import os

import bpy

OUTPUT_DIR = None
assert OUTPUT_DIR is not None, "must set OUTPUT_DIR"
os.makedirs(OUTPUT_DIR, exist_ok=True)

scene = bpy.context.scene


def scene_bbox():
    big = 1e5
    lo, hi = [big] * 3, [-big] * 3
    for obj in scene.objects.values():
        if isinstance(obj.data, (bpy.types.Camera, bpy.types.Light)):
            continue
        for coord in obj.bound_box:
            lo = [min(a, b) for a, b in zip(lo, coord)]
            hi = [max(a, b) for a, b in zip(hi, coord)]
    return dict(min=lo, max=hi)


def scene_fov():
    cam = scene.camera.data
    width = scene.render.resolution_x
    height = scene.render.resolution_y
    x_fov, y_fov = cam.angle_x, cam.angle_y
    if cam.angle == x_fov:
        y_fov = 2 * math.atan(math.tan(x_fov / 2) * height / width)
    else:
        x_fov = 2 * math.atan(math.tan(y_fov / 2) * width / height)
    return x_fov, y_fov


def camera_json():
    x_fov, y_fov = scene_fov()
    matrix = scene.camera.matrix_world
    return dict(
        origin=list(matrix.col[3])[:3],
        x_fov=x_fov,
        y_fov=y_fov,
        x=list(matrix.col[0])[:3],
        y=list(-matrix.col[1])[:3],
        z=list(-matrix.col[2])[:3],
    )


with open(os.path.join(OUTPUT_DIR, "metadata.json"), "w") as f:
    json.dump(scene_bbox(), f)

backup_path = scene.render.filepath
backup_format = scene.render.image_settings.file_format
try:
    scene.render.image_settings.file_format = "PNG"
    for i, frame in enumerate(range(scene.frame_start, scene.frame_end)):
        scene.frame_set(frame)
        scene.render.filepath = os.path.join(OUTPUT_DIR, f"{i:05}")
        with open(scene.render.filepath + ".json", "w") as f:
            json.dump(camera_json(), f)
        bpy.ops.render.render(write_still=True)
finally:
    scene.render.filepath = backup_path
    scene.render.image_settings.file_format = backup_format
