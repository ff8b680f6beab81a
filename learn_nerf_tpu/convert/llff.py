"""Convert an LLFF forward-facing dataset (``poses_bounds.npy``).

Parity with the reference (``convert_dataset/llff.py``): the 3x5 pose
decode, the bmild/nerf axis swap ``(x,y,z) = (y,-x,z)`` followed by the
blender-style ``y,z`` negation, FOVs from the hwf focal, a loose bbox as the
union of ``pos +- z_far`` over all views, optional downscale factor, and a
thread pool for image conversion.
"""

import argparse
import json
import os
from functools import partial
from multiprocessing.pool import ThreadPool
from typing import Tuple

import numpy as np
from PIL import Image


def process_img(
    output_dir: str, factor: float, item: Tuple[int, Tuple[np.ndarray, str]]
):
    i, (pose_bound, img_path) = item
    info = pose_bound[:15].reshape([3, 5])
    x, y, z, pos, hwf = info.T
    h, w, focal = hwf
    _z_near, z_far = pose_bound[15:]

    # bmild/nerf load_llff.py axis convention, then the same y/z negation
    # as the blender converter.
    x, y, z = y, -x, z
    y = -y
    z = -z

    info = dict(
        origin=pos.tolist(),
        x_fov=float(2 * np.arctan(w / (2 * focal))),
        y_fov=float(2 * np.arctan(h / (2 * focal))),
        x=x.tolist(),
        y=y.tolist(),
        z=z.tolist(),
    )
    with open(os.path.join(output_dir, f"{i:05}.json"), "w") as f:
        json.dump(info, f)

    new_img = Image.open(img_path).convert("RGB")
    if factor != 1.0:
        old_w, old_h = new_img.size
        new_img = new_img.resize((round(old_w * factor), round(old_h * factor)))
    new_img.save(os.path.join(output_dir, f"{i:05}.png"))

    return pos - z_far, pos + z_far


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--factor", type=float, default=1.0)
    parser.add_argument("input_dir", type=str)
    parser.add_argument("output_dir", type=str)
    args = parser.parse_args(argv)

    img_dir = os.path.join(args.input_dir, "images")
    img_paths = [
        os.path.join(img_dir, x)
        for x in sorted(os.listdir(img_dir))
        if os.path.splitext(x)[1].lower() in [".jpg", ".jpeg", ".png"]
    ]
    pose_bounds = np.load(os.path.join(args.input_dir, "poses_bounds.npy"))
    assert len(pose_bounds) == len(img_paths), "image count must match pose count"

    os.makedirs(args.output_dir, exist_ok=True)
    bbox_min, bbox_max = None, None
    with ThreadPool(8) as p:
        for local_min, local_max in p.imap_unordered(
            partial(process_img, args.output_dir, args.factor),
            enumerate(zip(pose_bounds, img_paths)),
        ):
            if bbox_min is None:
                bbox_min, bbox_max = local_min, local_max
            else:
                bbox_min = np.minimum(bbox_min, local_min)
                bbox_max = np.maximum(bbox_max, local_max)

    with open(os.path.join(args.output_dir, "metadata.json"), "w") as f:
        json.dump(dict(min=bbox_min.tolist(), max=bbox_max.tolist()), f)


if __name__ == "__main__":
    main()
