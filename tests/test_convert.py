"""Dataset converter tests (Blender-synthetic and LLFF)."""

import json
import os

import numpy as np
from PIL import Image


def test_blender_converter(tmp_path):
    from learn_nerf_tpu.convert import blender

    src = tmp_path / "blender"
    os.makedirs(src / "train")
    # Identity pose at origin looking down -z (OpenGL convention).
    frames = []
    for i, angle in enumerate([0.0, np.pi / 2]):
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        mat = np.eye(4)
        mat[:3, :3] = rot
        mat[:3, 3] = [i, 0.0, 4.0]
        frames.append(
            dict(file_path=f"./train/r_{i}", transform_matrix=mat.tolist())
        )
        Image.fromarray(
            np.full((20, 30, 3), 50 * (i + 1), np.uint8)
        ).save(src / "train" / f"r_{i}.png")
    with open(src / "transforms_train.json", "w") as f:
        json.dump(dict(camera_angle_x=0.7, frames=frames), f)

    out = str(tmp_path / "out")
    blender.main(["--split", "train", str(src), out])

    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta == dict(min=[-1.0] * 3, max=[1.0] * 3)
    info = json.load(open(os.path.join(out, "0000.json")))
    assert info["origin"] == [0.0, 0.0, 4.0]
    np.testing.assert_allclose(info["x"], [1, 0, 0], atol=1e-9)
    np.testing.assert_allclose(info["y"], [0, -1, 0], atol=1e-9)
    np.testing.assert_allclose(info["z"], [0, 0, -1], atol=1e-9)
    assert abs(info["x_fov"] - 0.7) < 1e-9
    # y_fov from aspect 20/30.
    expected_y = 2 * np.arctan(np.tan(0.35) * 20 / 30)
    assert abs(info["y_fov"] - expected_y) < 1e-9
    assert os.path.exists(os.path.join(out, "0001.png"))

    # Loadable by our dataset layer.
    from learn_nerf_tpu.data import load_dataset

    data = load_dataset(out)
    assert len(data.views) == 2


def test_llff_converter(tmp_path):
    from learn_nerf_tpu.convert import llff

    src = tmp_path / "llff"
    os.makedirs(src / "images")
    n = 3
    poses = np.zeros((n, 17))
    for i in range(n):
        # Columns: x, y, z, pos, hwf.
        info = np.stack(
            [
                [0, 1, 0],  # x
                [-1, 0, 0],  # y
                [0, 0, 1],  # z
                [i, 0.0, 2.0],  # pos
                [40, 60, 50.0],  # hwf
            ],
            axis=1,
        )
        poses[i, :15] = info.reshape(-1)
        poses[i, 15:] = [0.5, 3.0]
        Image.fromarray(np.full((40, 60, 3), 20 * i, np.uint8)).save(
            src / "images" / f"img_{i}.png"
        )
    np.save(src / "poses_bounds.npy", poses)

    out = str(tmp_path / "out_llff")
    llff.main([str(src), out])

    meta = json.load(open(os.path.join(out, "metadata.json")))
    # bbox = union of pos +- z_far.
    np.testing.assert_allclose(meta["min"], [-3.0, -3.0, -1.0])
    np.testing.assert_allclose(meta["max"], [5.0, 3.0, 5.0])

    info = json.load(open(os.path.join(out, "00000.json")))
    # x,y,z = (y,-x,z) then y,z negated: y = -(-x_in) = x_in.
    np.testing.assert_allclose(info["x"], [-1, 0, 0], atol=1e-9)
    np.testing.assert_allclose(info["y"], [0, 1, 0], atol=1e-9)
    np.testing.assert_allclose(info["z"], [0, 0, -1], atol=1e-9)
    assert abs(info["x_fov"] - 2 * np.arctan(60 / (2 * 50))) < 1e-9
    assert abs(info["y_fov"] - 2 * np.arctan(40 / (2 * 50))) < 1e-9

    from learn_nerf_tpu.data import load_dataset

    data = load_dataset(out)
    assert len(data.views) == 3


def test_llff_downscale(tmp_path):
    from learn_nerf_tpu.convert import llff

    src = tmp_path / "llff2"
    os.makedirs(src / "images")
    poses = np.zeros((1, 17))
    info = np.stack(
        [[0, 1, 0], [-1, 0, 0], [0, 0, 1], [0, 0, 2.0], [40, 60, 50.0]], axis=1
    )
    poses[0, :15] = info.reshape(-1)
    poses[0, 15:] = [0.5, 3.0]
    np.save(src / "poses_bounds.npy", poses)
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(src / "images" / "a.png")

    out = str(tmp_path / "out2")
    llff.main(["--factor", "0.5", str(src), out])
    img = Image.open(os.path.join(out, "00000.png"))
    assert img.size == (30, 20)


def test_llff_standin_capture_roundtrip(tmp_path):
    """Full LLFF pipeline: synthetic forward-facing capture in genuine LLFF
    format -> convert/llff.py -> dataset whose cameras reproduce the ground
    truth exactly (BASELINE.md config 5 stand-in)."""
    import subprocess
    import sys

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cap, out = str(tmp_path / "cap"), str(tmp_path / "data")
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools/make_llff_standin.py"), cap, "32"],
        check=True,
        capture_output=True,
        env=dict(
            os.environ,
            # Append, don't override: the TPU platform registration rides
            # in the inherited PYTHONPATH (see CLAUDE.md).
            PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        ),
    )
    from learn_nerf_tpu.convert import llff

    llff.main([cap, out])

    from learn_nerf_tpu.data.dataset import load_dataset
    from tests.synthetic_scene import cube_color

    data = load_dataset(out)
    assert len(data.views) == 12
    # Forward-facing loose bbox covers the cube.
    assert all(m <= -0.5 for m in data.metadata.bbox_min)
    assert all(m >= 0.5 for m in data.metadata.bbox_max)
    for view in data.views[:3]:
        rays = view.bare_rays(32, 32)
        expect = cube_color(rays[:, 0], rays[:, 1]).reshape(32, 32, 3)
        np.testing.assert_array_equal(view.image(), expect)
