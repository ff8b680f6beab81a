"""Spin around the camera's y axis from a fixed view.

Parity with ``learn_nerf/scripts/render_nerf_spin.py``: N frames rotating
the x axis and view direction in their shared plane, concatenated into one
output image.
"""

import math

import numpy as np

from ..data.camera import CameraView
from .render_nerf import RenderSession, argparser


def main(argv=None):
    parser = argparser()
    parser.add_argument("--frames", type=int, default=10)
    parser.add_argument("view_json", type=str)
    parser.add_argument("output_png", type=str)
    args = parser.parse_args(argv)

    session = RenderSession(args)
    view = CameraView.from_json(args.view_json)
    x = np.asarray(view.x_axis)
    z = np.asarray(view.camera_direction)

    from ..utils.progress import progress

    for i in progress(range(args.frames), desc="frames"):
        theta = 2 * math.pi * i / args.frames
        sin, cos = math.sin(theta), math.cos(theta)
        view.x_axis = tuple((cos * x + sin * z).tolist())
        view.camera_direction = tuple((-sin * x + cos * z).tolist())
        session.render_view(view)

    session.save(args.output_png)


if __name__ == "__main__":
    main()
