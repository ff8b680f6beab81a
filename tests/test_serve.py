"""HTTP render service (scripts/serve_nerf.py): health/metadata/render
endpoints against a live server on a loopback port, determinism vs a
direct RenderSession with the same seed, and request validation."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from .synthetic_scene import write_dataset


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """(base_url, scene_dir, pkl) with the server running on a free port."""
    import jax

    from learn_nerf_tpu.models import NeRFModel
    from learn_nerf_tpu.scripts.serve_nerf import argparser, make_server
    from learn_nerf_tpu.train import TrainLoop

    scene = str(tmp_path_factory.mktemp("scene"))
    write_dataset(scene, num_views=2, resolution=16)
    model = NeRFModel()
    loop = TrainLoop(
        model, model, init_rng=jax.random.PRNGKey(0), lr=1e-3,
        coarse_ts=4, fine_ts=4, bbox_min=(-0.7,) * 3, bbox_max=(0.7,) * 3,
    )
    pkl = str(tmp_path_factory.mktemp("ckpt") / "nerf.pkl")
    loop.save(pkl)

    argv = [
        "--seed", "0", "--batch_size", "64",
        "--coarse_samples", "4", "--fine_samples", "4",
        "--width", "16", "--height", "16",
        "--model_path", pkl, "--port", "0",
        f"{scene}/metadata.json",
    ]
    server = make_server(argparser().parse_args(argv))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", scene, (argv,)
    server.shutdown()
    server.server_close()
    thread.join(timeout=10)


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.read()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_health_and_metadata(served):
    base, _, _ = served
    status, body = _get(f"{base}/health")
    assert status == 200 and json.loads(body) == {"ok": True}
    status, body = _get(f"{base}/metadata")
    md = json.loads(body)
    assert status == 200
    assert len(md["bbox_min"]) == 3 and md["default_width"] == 16


def test_render_matches_direct_session(served):
    from PIL import Image

    from learn_nerf_tpu.data.camera import CameraView
    from learn_nerf_tpu.scripts.serve_nerf import argparser
    from learn_nerf_tpu.scripts.render_nerf import RenderSession

    base, scene, (argv,) = served
    with open(f"{scene}/0000.json", "rb") as f:
        cam = f.read()
    status, ctype, png = _post(f"{base}/render", cam)
    assert status == 200 and ctype == "image/png"
    import io

    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == (16, 16, 3)

    # Same seed, fresh session, first render -> identical image (the
    # server's PRNG stream starts at the same seeded key).
    direct = RenderSession(argparser().parse_args(argv))
    expected = direct.render_view(CameraView.from_json(f"{scene}/0000.json"))
    np.testing.assert_array_equal(img, expected)


def test_render_custom_resolution_and_validation(served):
    base, scene, _ = served
    with open(f"{scene}/0000.json") as f:
        info = json.load(f)
    from PIL import Image
    import io

    info["width"], info["height"] = 24, 12
    status, _, png = _post(f"{base}/render", json.dumps(info).encode())
    assert status == 200
    assert np.asarray(Image.open(io.BytesIO(png))).shape == (12, 24, 3)

    for bad in (
        b"not json at all",
        json.dumps({"z": [0, 0, 1]}).encode(),  # missing fields
        json.dumps(dict(info, width=0)).encode(),
        json.dumps(dict(info, width=10**6)).encode(),
    ):
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(f"{base}/render", bad)
        assert err.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as err:
        _post(f"{base}/nope", b"{}")
    assert err.value.code == 404


def test_render_failure_answers_500_not_dropped_connection(served):
    """Values that pass the request-level validation but break the render
    (an axis with the wrong arity only fails at ray-math shape checks)
    must produce an HTTP 500, not a closed socket: a long-lived client
    needs to tell a bad view from a dead server."""
    base, scene, _ = served
    with open(f"{scene}/0000.json") as f:
        info = json.load(f)
    info["x"] = [1.0, 0.0]  # wrong arity: raises inside ray generation
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(f"{base}/render", json.dumps(info).encode())
    assert err.value.code == 500
    assert "render failed" in json.loads(err.value.read())["error"]
    # The server must still be alive and serving afterwards.
    status, _ = _get(f"{base}/health")
    assert status == 200
