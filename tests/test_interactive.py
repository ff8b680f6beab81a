"""Interactive fly-through CLI test (scripted stdin)."""

import io
import os

import numpy as np


def test_interactive_session(tmp_path):
    import jax

    from learn_nerf_tpu.models import NeRFModel
    from learn_nerf_tpu.scripts import render_nerf_interactive
    from learn_nerf_tpu.train import TrainLoop

    from .synthetic_scene import write_dataset

    scene = write_dataset(str(tmp_path / "scene"), num_views=2, resolution=8)
    # The CLI rebuilds the default full-size NeRFModel, so checkpoint one.
    full = NeRFModel()
    loop = TrainLoop(
        full, full, init_rng=jax.random.PRNGKey(0), lr=1e-3,
        coarse_ts=4, fine_ts=4, bbox_min=(-0.7,) * 3, bbox_max=(0.7,) * 3,
    )
    pkl = str(tmp_path / "nerf.pkl")
    loop.save(pkl)
    out_dir = str(tmp_path / "frames")

    commands = io.StringIO("f\n2r\no\nq\n")
    render_nerf_interactive.main(
        [
            "--width", "8",
            "--height", "8",
            "--batch_size", "64",
            "--coarse_samples", "4",
            "--fine_samples", "4",
            "--model_path", pkl,
            os.path.join(scene, "metadata.json"),
            os.path.join(scene, "0000.json"),
            out_dir,
        ],
        input_stream=commands,
    )
    frames = sorted(os.listdir(out_dir))
    # initial frame + one per command (f, 2r, o).
    assert frames == [f"frame_{i:05d}.png" for i in range(4)]
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out_dir, frames[-1])))
    assert img.shape == (8, 8, 3)
