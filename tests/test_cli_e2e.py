"""End-to-end CLI test: synthetic scene -> train -> render -> checkpoint."""

import os

import numpy as np
import pytest

from .synthetic_scene import write_dataset


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    return write_dataset(str(tmp_path_factory.mktemp("scene")), num_views=6, resolution=16)


def test_train_then_render(tiny_dataset, tmp_path):
    from learn_nerf_tpu.scripts import render_nerf, train_nerf

    save_path = str(tmp_path / "nerf.pkl")
    train_nerf.main(
        [
            "--seed", "0",
            "--lr", "1e-3",
            "--batch_size", "256",
            "--coarse_samples", "8",
            "--fine_samples", "8",
            "--steps", "8",
            "--save_path", save_path,
            tiny_dataset,
        ]
    )
    assert os.path.exists(save_path)

    out_png = str(tmp_path / "out.png")
    render_nerf.main(
        [
            "--seed", "0",
            "--batch_size", "128",
            "--coarse_samples", "8",
            "--fine_samples", "8",
            "--width", "16",
            "--height", "16",
            "--model_path", save_path,
            os.path.join(tiny_dataset, "metadata.json"),
            os.path.join(tiny_dataset, "0000.json"),
            os.path.join(tiny_dataset, "0001.json"),
            out_png,
        ]
    )
    from PIL import Image

    img = np.asarray(Image.open(out_png))
    assert img.shape == (16, 32, 3)  # two views side by side

    # Auto-resume path: train a few more steps from the checkpoint.
    train_nerf.main(
        [
            "--seed", "1",
            "--batch_size", "256",
            "--coarse_samples", "8",
            "--fine_samples", "8",
            "--steps", "2",
            "--save_path", save_path,
            tiny_dataset,
        ]
    )


def test_eval_psnr_cli(tiny_dataset, tmp_path, capsys):
    import jax

    from learn_nerf_tpu.models import NeRFModel
    from learn_nerf_tpu.scripts import eval_psnr
    from learn_nerf_tpu.train import TrainLoop

    model = NeRFModel()
    loop = TrainLoop(
        model, model, init_rng=jax.random.PRNGKey(0), lr=1e-3,
        coarse_ts=4, fine_ts=4, bbox_min=(-0.7,) * 3, bbox_max=(0.7,) * 3,
    )
    pkl = str(tmp_path / "nerf.pkl")
    loop.save(pkl)

    eval_psnr.main(
        [
            "--seed", "0",
            "--batch_size", "64",
            "--coarse_samples", "4",
            "--fine_samples", "4",
            "--max_views", "2",
            "--model_path", pkl,
            tiny_dataset,
        ]
    )
    out = capsys.readouterr().out
    assert "view 0: psnr=" in out
    assert "mean_psnr=" in out
