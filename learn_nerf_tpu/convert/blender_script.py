"""Export a Blender animation as a NeRF dataset (run inside Blender).

Behaviour parity with the reference ``convert_dataset/blender_script.py``:
each animation frame renders to ``{i:05}.png`` with a camera JSON built
from ``matrix_world`` columns (``x = col0``, ``y = -col1``, ``z = -col2``)
and the scene bbox (excluding cameras/lights) written to ``metadata.json``.

Set OUTPUT_DIR below, open the script in Blender's text editor, run.
"""

import contextlib
import json
import math
import os

import bpy
from mathutils import Vector

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
    """Snapshot and restore render output settings."""
    saved = (scene.render.filepath, scene.render.image_settings.file_format)
    try:
        yield
    finally:
        scene.render.filepath = saved[0]
        scene.render.image_settings.file_format = saved[1]


def export_animation(scene, output_dir):
    os.makedirs(output_dir, exist_ok=True)
    lo, hi = content_bbox(scene)
    with open(os.path.join(output_dir, "metadata.json"), "w") as f:
        json.dump(dict(min=lo, max=hi), f)

    with render_settings(scene):
        scene.render.image_settings.file_format = "PNG"
        for i, frame in enumerate(range(scene.frame_start, scene.frame_end)):
            scene.frame_set(frame)
            scene.render.filepath = os.path.join(output_dir, f"{i:05}")
            with open(scene.render.filepath + ".json", "w") as f:
                json.dump(frame_json(scene), f)
            bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    assert OUTPUT_DIR is not None, "must set OUTPUT_DIR"
    export_animation(bpy.context.scene, OUTPUT_DIR)
