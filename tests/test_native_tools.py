"""Native (C++) tool tests: build with make, drive the binaries end-to-end."""

import json
import os
import struct
import subprocess
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "bin")


@pytest.fixture(scope="module")
def binaries():
    subprocess.run(
        ["make", "-s"], cwd=os.path.join(REPO, "tools", "cpp"), check=True
    )
    return BIN


@pytest.fixture(scope="module")
def cube_stl(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stl") / "cube.stl")
    faces = []
    for axis in range(3):
        for s in (0.0, 1.0):
            pts = []
            for a in (0.0, 1.0):
                for b in (0.0, 1.0):
                    p = [0.0, 0.0, 0.0]
                    p[axis] = s
                    p[(axis + 1) % 3] = a
                    p[(axis + 2) % 3] = b
                    pts.append(p)
            faces.append((pts[0], pts[1], pts[2]))
            faces.append((pts[1], pts[3], pts[2]))
    with open(path, "wb") as f:
        f.write(b"\x00" * 80)
        f.write(struct.pack("<I", len(faces)))
        for tri in faces:
            f.write(struct.pack("<3f", 0, 0, 0))
            for v in tri:
                f.write(struct.pack("<3f", *v))
            f.write(b"\x00\x00")
    return path


def test_simple_dataset_random(binaries, cube_stl, tmp_path):
    out = str(tmp_path / "ds")
    subprocess.run(
        [
            os.path.join(binaries, "simple_dataset"),
            "-resolution", "48",
            "-images", "3",
            "-seed", "7",
            cube_stl,
            out,
        ],
        check=True,
        capture_output=True,
    )
    meta = json.load(open(os.path.join(out, "metadata.json")))
    # Reference normalizeMesh scale: max HALF-extent = 1 (bbox +-1);
    # an earlier version divided by the full dimension (+-0.5 worlds).
    np.testing.assert_allclose(meta["min"], [-1.0] * 3)
    np.testing.assert_allclose(meta["max"], [1.0] * 3)

    from learn_nerf_tpu.data import load_dataset

    data = load_dataset(out)
    assert len(data.views) == 3
    for view in data.views:
        # Camera basis is orthonormal with z = x cross y.
        x = np.asarray(view.x_axis)
        y = np.asarray(view.y_axis)
        z = np.asarray(view.camera_direction)
        np.testing.assert_allclose(np.cross(x, y), z, atol=1e-9)
        assert abs(np.dot(x, y)) < 1e-9
        np.testing.assert_allclose([np.linalg.norm(v) for v in (x, y, z)], 1.0)
        # The object is visible and centered-ish.
        img = view.image()
        assert (img > 0).mean() > 0.05
        # FOV is radians (not double-converted like the reference Go bug).
        assert 0.9 < view.x_fov < 1.2

    # The cube must project inside the image: border pixels are background.
    img = data.views[0].image()
    assert img[0].max() == 0 and img[-1].max() == 0
    assert img[:, 0].max() == 0 and img[:, -1].max() == 0


def test_simple_dataset_rotate_and_no_images(binaries, cube_stl, tmp_path):
    out = str(tmp_path / "rot")
    subprocess.run(
        [
            os.path.join(binaries, "simple_dataset"),
            "-images", "4",
            "-rotate",
            "-no-images",
            cube_stl,
            out,
        ],
        check=True,
        capture_output=True,
    )
    names = sorted(os.listdir(out))
    assert names == ["0000.json", "0001.json", "0002.json", "0003.json", "metadata.json"]
    # Orbit: all origins equidistant from the center.
    dists = []
    for i in range(4):
        info = json.load(open(os.path.join(out, f"{i:04}.json")))
        dists.append(np.linalg.norm(info["origin"]))
    np.testing.assert_allclose(dists, dists[0], rtol=1e-6)


def test_point_cloud_roundtrip(binaries, tmp_path):
    """Synthesize a tiny RGBD dataset of a sphere and reconstruct it."""
    from PIL import Image

    from learn_nerf_tpu.data.camera import CameraView

    data_dir = str(tmp_path / "rgbd")
    os.makedirs(data_dir)
    max_depth = 10.0
    size = 48
    radius = 0.5
    for i in range(3):
        theta = 2 * np.pi * i / 3
        z = -np.array([np.cos(theta), np.sin(theta), 0.0])
        x = np.cross(z, [0, 0, 1.0])
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        view = CameraView(
            camera_direction=tuple(z.tolist()),
            camera_origin=tuple((-z * 2.0).tolist()),
            x_axis=tuple(x.tolist()),
            y_axis=tuple(y.tolist()),
            x_fov=1.0,
            y_fov=1.0,
        )
        with open(os.path.join(data_dir, f"{i:05}.json"), "w") as f:
            f.write(view.to_json())
        rays = view.bare_rays(size, size)
        o, d = rays[:, 0], rays[:, 1]
        # Ray-sphere intersection at the origin.
        b = np.sum(o * d, axis=-1)
        c = np.sum(o * o, axis=-1) - radius**2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.where(hit, disc, 0.0))
        z_depth = t * (d @ z)
        depth01 = np.where(hit & (t > 0), z_depth / max_depth, 1.0)
        depth = (depth01 * 0xFFFF).astype(np.uint16).reshape(size, size)
        Image.fromarray(depth).save(os.path.join(data_dir, f"{i:05}_depth.png"))
        img = np.zeros((size, size, 3), np.uint8)
        img[hit.reshape(size, size)] = [200, 40, 40]
        Image.fromarray(img).save(os.path.join(data_dir, f"{i:05}.png"))

    out_obj = str(tmp_path / "cloud.obj")
    subprocess.run(
        [
            os.path.join(binaries, "point_cloud"),
            "-data-dir", data_dir,
            "-output-path", out_obj,
            "-thickness", "0.08",
            "-delta", "0.06",
            "-max-points", "3000",
        ],
        check=True,
        capture_output=True,
    )
    verts = []
    faces = 0
    for line in open(out_obj):
        if line.startswith("v "):
            verts.append([float(v) for v in line.split()[1:]])
        elif line.startswith("f "):
            faces += 1
    verts = np.asarray(verts)
    assert len(verts) > 50 and faces > 50
    # Reconstruction hugs the sphere surface (within thickness+delta).
    r = np.linalg.norm(verts, axis=-1)
    assert np.all(r > radius - 0.2) and np.all(r < radius + 0.2)
    assert os.path.exists(str(tmp_path / "material.mtl"))

    # Zip output variant.
    out_zip = str(tmp_path / "cloud.zip")
    subprocess.run(
        [
            os.path.join(binaries, "point_cloud"),
            "-data-dir", data_dir,
            "-output-path", out_zip,
            "-thickness", "0.08",
            "-delta", "0.08",
            "-max-points", "2000",
            "-sort-density",
        ],
        check=True,
        capture_output=True,
    )
    with zipfile.ZipFile(out_zip) as zf:
        assert sorted(zf.namelist()) == ["material.mtl", "model.obj"]
        assert b"usemtl" in zf.read("model.obj")


def test_simple_dataset_specular(binaries, cube_stl, tmp_path):
    """-specular adds view-dependent highlights: images differ from the
    Lambertian render of the same views, and only ever get brighter."""
    flat, shiny = str(tmp_path / "flat"), str(tmp_path / "shiny")
    base = [
        os.path.join(binaries, "simple_dataset"),
        "-resolution", "48", "-images", "2", "-seed", "7",
    ]
    subprocess.run(base + [cube_stl, flat], check=True, capture_output=True)
    subprocess.run(
        base + ["-specular", "0.8", "-shininess", "16", cube_stl, shiny],
        check=True,
        capture_output=True,
    )
    from PIL import Image

    for i in range(2):
        a = np.asarray(Image.open(os.path.join(flat, f"{i:04}.png"))).astype(int)
        b = np.asarray(Image.open(os.path.join(shiny, f"{i:04}.png"))).astype(int)
        assert (b >= a - 1).all()  # specular only adds light (u8 rounding)
        assert (b - a).max() > 20  # and visibly does somewhere
