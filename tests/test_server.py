"""End-to-end HTTP server test: real socket, tiny model, fallback SAM."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

import jax


@pytest.fixture(scope="module")
def server_url():
    from grasp_any_region_tpu.cli.runtime import GARRuntime
    from grasp_any_region_tpu.sam.pipeline import SamPredictor
    from grasp_any_region_tpu.serve.server import GARServer

    rt = GARRuntime.load(None, "gar_tiny", random_init=True)
    srv = GARServer(rt, SamPredictor(), max_new_tokens=4)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _b64_image(rng, w=160, h=120):
    img = Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_healthz_and_index(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["sam"] is False
    with urllib.request.urlopen(server_url + "/", timeout=30) as r:
        page = r.read().decode()
    assert "Grasp Any Region" in page and "/describe" in page


def test_describe_with_points(server_url, rng):
    code, out = _post(
        server_url + "/describe",
        {"image": _b64_image(rng), "points": [[80, 60]], "max_new_tokens": 4},
    )
    assert code == 200, out
    assert "text" in out


def test_describe_with_mask(server_url, rng):
    mask = np.zeros((120, 160), np.uint8)
    mask[30:90, 40:120] = 255
    buf = io.BytesIO()
    Image.fromarray(mask).save(buf, format="PNG")
    code, out = _post(
        server_url + "/describe",
        {
            "image": _b64_image(rng),
            "mask": base64.b64encode(buf.getvalue()).decode(),
            "question": "What is it?",
            "max_new_tokens": 4,
        },
    )
    assert code == 200, out
    assert "text" in out


def test_error_paths(server_url, rng):
    # missing image field
    code, out = _post(server_url + "/describe", {"points": [[1, 2]]})
    assert code == 400 and "image" in out["error"]
    # sam embedding without weights
    code, out = _post(server_url + "/image_to_sam_embedding", {"image": _b64_image(rng)})
    assert code == 422 and "SAM" in out["error"]
    # bad json
    req = urllib.request.Request(
        server_url + "/describe", b"{bad", {"Content-Type": "application/json"}
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown route
    code, out = _post(server_url + "/nope", {})
    assert code == 404


def test_point_to_mask_overlay(server_url, rng):
    code, out = _post(
        server_url + "/point_to_mask",
        {"image": _b64_image(rng), "points": [[80, 60]]},
    )
    assert code == 200, out
    assert out["area"] > 0
    overlay = np.asarray(
        Image.open(io.BytesIO(base64.b64decode(out["overlay"])))
    )
    assert overlay.shape == (120, 160, 4)
    # on-mask pixels are red with nonzero alpha; off-mask fully transparent
    assert overlay[..., 3].max() == 255 and overlay[..., 3].min() == 0
    mask = np.asarray(Image.open(io.BytesIO(base64.b64decode(out["mask"]))))
    assert mask.shape == (120, 160) and set(np.unique(mask)) <= {0, 255}
    # geometric fallback: disk around the click
    assert mask[60, 80] == 255 and mask[0, 0] == 0


def test_describe_streaming(server_url, rng):
    """stream=true chunk-streams plain text (no JSON envelope)."""
    req = urllib.request.Request(
        server_url + "/describe",
        json.dumps(
            {"image": _b64_image(rng), "points": [[80, 60]],
             "max_new_tokens": 4, "stream": True}
        ).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert isinstance(text, str)


def test_sam_decoder_onnx_endpoint(server_url, rng):
    """No SAM weights on the fixture server -> 503 with a clear error."""
    try:
        with urllib.request.urlopen(
            server_url + "/sam_decoder.onnx", timeout=30
        ) as r:
            assert False, f"expected 503, got {r.status}"
    except urllib.error.HTTPError as e:
        assert e.code == 503
        assert "SAM" in json.loads(e.read())["error"]


def test_sam_decoder_onnx_served_with_model():
    """A server whose SamPredictor has weights serves a real ONNX proto."""
    pytest.importorskip("torch")
    from grasp_any_region_tpu.cli.runtime import GARRuntime
    from grasp_any_region_tpu.sam.model import SAMConfig, init_sam_params
    from grasp_any_region_tpu.sam.pipeline import SamPredictor
    from grasp_any_region_tpu.serve.server import GARServer

    cfg = SAMConfig(img_size=128, embed_dim=64, depth=1, num_heads=2,
                    global_attn_indexes=(0,), out_chans=64,
                    decoder_mlp_dim=128)
    params = jax.tree_util.tree_map(
        np.asarray, init_sam_params(jax.random.PRNGKey(0), cfg)
    )
    rt = GARRuntime.load(None, "gar_tiny", random_init=True)
    srv = GARServer(rt, SamPredictor(params=params, cfg=cfg))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/sam_decoder.onnx", timeout=120
        ) as r:
            data = r.read()
        assert r.headers["Content-Type"] == "application/octet-stream"
        # ONNX is a protobuf ModelProto: the graph carries the official
        # input names as raw strings
        assert len(data) > 10_000
        for name in (b"image_embeddings", b"point_coords", b"point_labels",
                     b"mask_input", b"has_mask_input", b"orig_im_size"):
            assert name in data
        # cached on second hit (same object served)
        assert srv.decoder_onnx() is srv.decoder_onnx()
    finally:
        httpd.shutdown()


def test_index_page_wires_client_side_decode(server_url):
    with urllib.request.urlopen(server_url + "/", timeout=30) as r:
        page = r.read().decode()
    for needle in ("/sam_decoder.onnx", "image_to_sam_embedding",
                   "onnxruntime-web", "InferenceSession", "onmousemove"):
        assert needle in page
