"""Export random views of a Blender scene as a NeRF dataset (run in Blender).

Behaviour parity with ``convert_dataset/blender_script_random.py``:
NUM_FRAMES random unit view directions at the camera's original distance
from the scene center, camera oriented with a ``-Z``/``Y`` track
quaternion; JSON convention identical to ``blender_script.py``.
"""

import json
import math
import os

import bpy
from mathutils import Vector
from mathutils.noise import random_unit_vector

NUM_FRAMES = 100
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


def scene_center():
    bbox = scene_bbox()
    return (Vector(bbox["min"]) + Vector(bbox["max"])) / 2


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


with open(os.path.join(OUTPUT_DIR, "metadata.json"), "w") as f:
    json.dump(scene_bbox(), f)

backup_matrix = scene.camera.matrix_world.copy()
camera_dist = (backup_matrix.to_translation() - scene_center()).length
backup_path = scene.render.filepath
backup_format = scene.render.image_settings.file_format
try:
    scene.render.image_settings.file_format = "PNG"
    for i in range(NUM_FRAMES):
        scene.render.filepath = os.path.join(OUTPUT_DIR, f"{i:05}")
        x_fov, y_fov = scene_fov()

        direction = random_unit_vector()
        scene.camera.location = scene_center() - camera_dist * direction
        scene.camera.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()
        bpy.context.view_layer.update()

        matrix = scene.camera.matrix_world
        with open(scene.render.filepath + ".json", "w") as f:
            json.dump(
                dict(
                    origin=list(matrix.col[3])[:3],
                    x_fov=x_fov,
                    y_fov=y_fov,
                    x=list(matrix.col[0])[:3],
                    y=list(-matrix.col[1])[:3],
                    z=list(-matrix.col[2])[:3],
                ),
                f,
            )
        bpy.ops.render.render(write_still=True)
finally:
    scene.camera.matrix_world = backup_matrix
    bpy.context.view_layer.update()
    scene.render.filepath = backup_path
    scene.render.image_settings.file_format = backup_format
