"""Render a panning orbit around the scene center.

Parity with ``learn_nerf/scripts/render_nerf_pan.py``: camera orbits at
``distance * |bbox|`` from the center about a fixed (or random) axis with
60-degree FOV frames.
"""

import math

import numpy as np

from ..data.camera import CameraView
from .render_nerf import RenderSession, argparser


def main(argv=None):
    parser = argparser()
    parser.add_argument("--frames", type=int, default=10)
    parser.add_argument("--distance", type=float, default=2.0)
    parser.add_argument("--random_axis", action="store_true")
    parser.add_argument("output_png", type=str)
    args = parser.parse_args(argv)

    session = RenderSession(args)
    bbox_min = np.asarray(session.metadata.bbox_min)
    bbox_max = np.asarray(session.metadata.bbox_max)
    scale = float(np.linalg.norm(bbox_min - bbox_max))
    center = (bbox_min + bbox_max) / 2

    rot_axis = np.array([0.0, 0.0, -1.0])
    basis_1 = np.array([1.0, 0.0, 0.0])
    if args.random_axis:
        rot_axis = np.random.normal(size=(3,))
        rot_axis /= np.linalg.norm(rot_axis)
        basis_1 = np.array([-rot_axis[2], 0.0, rot_axis[0]])
        basis_1 /= np.linalg.norm(basis_1)
    basis_2 = np.cross(rot_axis, basis_1)

    for frame in range(args.frames):
        print(f"rendering frame {frame}...")
        theta = (frame / args.frames) * math.pi * 2
        direction = np.cos(theta) * basis_1 + np.sin(theta) * basis_2
        session.render_view(
            CameraView(
                camera_direction=tuple(direction.tolist()),
                camera_origin=tuple(
                    (-direction * scale * args.distance + center).tolist()
                ),
                x_axis=tuple(
                    (
                        np.cos(theta + np.pi / 2) * basis_1
                        + np.sin(theta + np.pi / 2) * basis_2
                    ).tolist()
                ),
                y_axis=tuple(rot_axis.tolist()),
                x_fov=60.0 * math.pi / 180,
                y_fov=60.0 * math.pi / 180,
            )
        )

    session.save(args.output_png)


if __name__ == "__main__":
    main()
