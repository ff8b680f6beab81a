"""Export random views of a Blender scene as a NeRF dataset (run in Blender).

Behaviour parity with ``convert_dataset/blender_script_random.py``:
NUM_FRAMES uniformly random unit view directions, camera placed at its
original distance from the scene center looking inward (``-Z``/``Y`` track
quaternion), per-frame PNG + JSON in the dataset convention of
``blender_script.py`` (x = +X column, y = -Y, z = -Z of ``matrix_world``).

Set OUTPUT_DIR below, open the script in Blender's text editor, run.
"""

import contextlib
import json
import math
import os

import bpy
from mathutils import Vector
from mathutils.noise import random_unit_vector

NUM_FRAMES = 100
OUTPUT_DIR = None


def content_bbox(scene):
    """Union bound box of everything except cameras and lights."""
    corners = [
        Vector(corner)
        for obj in scene.objects.values()
        if not isinstance(obj.data, (bpy.types.Camera, bpy.types.Light))
        for corner in obj.bound_box
    ]
    lo = [min(c[i] for c in corners) for i in range(3)]
    hi = [max(c[i] for c in corners) for i in range(3)]
    return lo, hi


def camera_fovs(scene):
    """(x_fov, y_fov) with the minor fov derived from the aspect ratio."""
    cam = scene.camera.data
    aspect = scene.render.resolution_y / scene.render.resolution_x
    if cam.angle == cam.angle_x:
        return cam.angle_x, 2 * math.atan(math.tan(cam.angle_x / 2) * aspect)
    return 2 * math.atan(math.tan(cam.angle_y / 2) / aspect), cam.angle_y


def frame_json(scene):
    """Camera pose in the dataset's axis convention."""
    m = scene.camera.matrix_world
    x_fov, y_fov = camera_fovs(scene)
    return dict(
        origin=list(m.col[3])[:3],
        x_fov=x_fov,
        y_fov=y_fov,
        x=list(m.col[0])[:3],
        y=list(-m.col[1])[:3],
        z=list(-m.col[2])[:3],
    )


@contextlib.contextmanager
def render_settings(scene):
    """Snapshot and restore camera pose + render output settings."""
    saved = (
        scene.camera.matrix_world.copy(),
        scene.render.filepath,
        scene.render.image_settings.file_format,
    )
    try:
        yield
    finally:
        scene.camera.matrix_world = saved[0]
        bpy.context.view_layer.update()
        scene.render.filepath = saved[1]
        scene.render.image_settings.file_format = saved[2]


def export_random_views(scene, output_dir, num_frames):
    os.makedirs(output_dir, exist_ok=True)
    lo, hi = content_bbox(scene)
    with open(os.path.join(output_dir, "metadata.json"), "w") as f:
        json.dump(dict(min=lo, max=hi), f)

    center = (Vector(lo) + Vector(hi)) / 2
    radius = (scene.camera.matrix_world.to_translation() - center).length

    with render_settings(scene):
        scene.render.image_settings.file_format = "PNG"
        for i in range(num_frames):
            toward = random_unit_vector()
            scene.camera.location = center - radius * toward
            scene.camera.rotation_euler = toward.to_track_quat(
                "-Z", "Y"
            ).to_euler()
            bpy.context.view_layer.update()

            scene.render.filepath = os.path.join(output_dir, f"{i:05}")
            with open(scene.render.filepath + ".json", "w") as f:
                json.dump(frame_json(scene), f)
            bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    assert OUTPUT_DIR is not None, "must set OUTPUT_DIR"
    export_random_views(bpy.context.scene, OUTPUT_DIR, NUM_FRAMES)
