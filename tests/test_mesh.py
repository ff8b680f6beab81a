"""Mesh extraction and writer tests."""

import os
import struct

import numpy as np

from learn_nerf_tpu.mesh import marching_tetrahedra, write_obj, write_stl


def sphere_volume(n=24, radius=0.35):
    axes = np.linspace(0, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(axes, axes, axes, indexing="ij")
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    return 1.0 - r / radius  # >0 inside the sphere


def test_sphere_extraction():
    n = 24
    vol = sphere_volume(n)
    verts, faces = marching_tetrahedra(vol, level=0.0)
    assert len(verts) > 100
    assert len(faces) > 100
    assert faces.max() < len(verts)

    # All vertices should lie near the sphere of radius 0.35 (in index
    # coordinates: radius 0.35 * (n-1)).
    center = np.array([0.5, 0.5, 0.5]) * (n - 1)
    r = np.linalg.norm(verts - center, axis=-1) / (n - 1)
    assert np.all(np.abs(r - 0.35) < 0.05)


def test_mesh_is_closed():
    """Every edge of the extracted surface must be shared by exactly 2 faces."""
    vol = sphere_volume(12, radius=0.3)
    verts, faces = marching_tetrahedra(vol, level=0.0)
    edges = {}
    for tri in faces:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            e = (min(tri[a], tri[b]), max(tri[a], tri[b]))
            edges[e] = edges.get(e, 0) + 1
    counts = np.array(list(edges.values()))
    assert np.all(counts == 2), f"open edges: {(counts != 2).sum()}"


def test_normals_point_outward():
    vol = sphere_volume(16, radius=0.3)
    verts, faces = marching_tetrahedra(vol, level=0.0)
    center = np.array([0.5, 0.5, 0.5]) * 15
    tris = verts[faces]
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    outward = tris.mean(axis=1) - center
    dots = (n * outward).sum(axis=-1)
    # Consistent orientation: essentially all normals point away from center.
    assert (dots > 0).mean() > 0.99


def test_normals_stay_outward_after_cli_reflection():
    """The marching_cubes CLI flips x/z (a REFLECTION) to match the
    reference's output frame; the winding must reverse with it or every
    normal inverts inward (found by review: 100% outward -> 0%)."""
    vol = sphere_volume(16, radius=0.3)
    verts, faces = marching_tetrahedra(vol, level=0.0)
    verts = np.stack([verts[..., 2], verts[..., 1], verts[..., 0]], axis=-1)
    faces = faces[:, ::-1]  # the CLI's paired winding reversal
    center = np.array([0.5, 0.5, 0.5]) * 15
    tris = verts[faces]
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    dots = (n * (tris.mean(axis=1) - center)).sum(axis=-1)
    assert (dots > 0).mean() > 0.99


def test_obj_writer(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    path = str(tmp_path / "m.obj")
    write_obj(path, verts, faces)
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "v 0.00000 0.00000 0.00000"
    assert lines[-1] == "f 1 2 3"


def test_stl_writer(tmp_path):
    vol = sphere_volume(10, radius=0.3)
    verts, faces = marching_tetrahedra(vol, level=0.0)
    path = str(tmp_path / "m.stl")
    write_stl(path, verts, faces)
    with open(path, "rb") as f:
        data = f.read()
    (count,) = struct.unpack("<I", data[80:84])
    assert count == len(faces)
    assert len(data) == 84 + 50 * len(faces)
    # First triangle's vertices decode back.
    rec = np.frombuffer(data[84 : 84 + 48], dtype="<f4").reshape(4, 3)
    np.testing.assert_allclose(rec[1:], verts[faces[0]], rtol=1e-6)


def test_mesh_watertight_on_smooth_field():
    """Every directed face edge must have its reverse somewhere: shared
    edges interpolate canonically (global-corner-id order), so adjacent
    tetrahedra produce bit-identical vertices and the dedupe merges them.
    The old endpoint-order-dependent interpolation left ~4% open edges on
    exactly this smooth sphere (review round 3)."""
    import numpy as np

    from learn_nerf_tpu.mesh import marching_tetrahedra

    n = 24
    g = np.stack(
        np.meshgrid(*([np.linspace(-1, 1, n)] * 3), indexing="ij"), axis=-1
    )
    r = np.linalg.norm(g, axis=-1)
    volume = 1.0 / (1.0 + np.exp((r - 0.6) / 0.05))  # smooth sphere
    verts, faces = marching_tetrahedra(volume, 0.5)
    assert len(faces) > 100

    from collections import Counter

    edges = Counter()
    for a, b, c in faces.tolist():
        for e in ((a, b), (b, c), (c, a)):
            edges[e] += 1
    # Closed 2-manifold: every directed edge appears EXACTLY once and its
    # reverse exactly once (a set would collapse duplicated-winding faces
    # and pass non-manifold fins).
    bad = [
        e
        for e, n in edges.items()
        if n != 1 or edges.get((e[1], e[0]), 0) != 1
    ]
    assert not bad, f"{len(bad)} non-manifold/open directed edges"
