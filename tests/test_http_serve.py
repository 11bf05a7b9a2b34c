"""HTTP inference endpoint (http_serve): protocol, parity, error paths.

The reference has no serving story; the endpoint must return exactly the
pipeline's masks (same normalization/alignment as eval) over plain JSON +
base64 NIfTI, and reject malformed input with 400s rather than dying.
"""

import base64
import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glfusion_tpu.config import tiny_config
from glfusion_tpu.data.nifti import nifti_bytes, parse_nifti_bytes
from glfusion_tpu.http_serve import make_http_server
from glfusion_tpu.models import GlobalAndLocal
from glfusion_tpu.serve import ClipPipeline


@pytest.fixture(scope="module")
def server():
    cfg = tiny_config()
    model = GlobalAndLocal(cfg.model)
    hw, v = cfg.data.crop_hw, cfg.model.num_views
    x = jnp.zeros((v, 2, hw, hw, 1), jnp.float32)
    variables = jax.device_get(
        jax.jit(lambda r: model.init(r, x, False))(jax.random.PRNGKey(0)))
    pipe = ClipPipeline(cfg, model, variables, depth=1, threads=1)
    srv = make_http_server(pipe, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield cfg, pipe, srv.server_address[1]
    srv.shutdown()
    srv.server_close()


def _request(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(method, path,
                 body=None if body is None else json.dumps(body),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def _b64_vol(vol):
    return base64.b64encode(nifti_bytes(np.asarray(vol))).decode()


def test_healthz(server):
    cfg, _, port = server
    status, out = _request(port, "GET", "/healthz")
    assert status == 200
    assert out["status"] == "ok"
    assert out["views"] == list(cfg.model.views)
    assert out["num_classes"] == cfg.model.num_classes


def test_predict_matches_pipeline(server):
    cfg, pipe, port = server
    hw = cfg.data.crop_hw
    t = 3
    rs = np.random.RandomState(0)
    raw = {view: rs.randint(0, 255, (1, hw, hw, t)).astype(np.uint8)
           for view in cfg.model.views}
    status, out = _request(port, "POST", "/predict",
                           {"views": {v: _b64_vol(a) for v, a in raw.items()}})
    assert status == 200
    assert out["frames"] == t
    assert sorted(out["masks"]) == sorted(cfg.model.views)

    want = pipe.predict_one(pipe.stack_raw_views(raw))  # (V, T, H, W, C)
    for vi, view in enumerate(cfg.model.views):
        got = parse_nifti_bytes(base64.b64decode(out["masks"][view]))
        assert got.shape == (cfg.model.num_classes, hw, hw, t)
        np.testing.assert_array_equal(
            got, np.transpose(want[vi], (3, 1, 2, 0)))


def test_predict_partial_views_returns_only_uploaded(server):
    cfg, _, port = server
    hw = cfg.data.crop_hw
    view = cfg.model.views[0]
    vol = np.zeros((hw, hw, 2), np.uint8)  # bare (H, W, T) also accepted
    status, out = _request(port, "POST", "/predict",
                           {"views": {view: _b64_vol(vol)}})
    assert status == 200
    assert list(out["masks"]) == [view]  # zero-filled views not echoed
    assert out["frames"] == 2


def test_predict_errors(server):
    cfg, _, port = server
    status, out = _request(port, "POST", "/predict", {"views": {"9": "AA=="}})
    assert status == 400 and "unknown view" in out["error"]

    status, out = _request(port, "POST", "/predict", {"nope": 1})
    assert status == 400

    status, out = _request(port, "POST", "/predict",
                           {"views": {cfg.model.views[0]: base64.b64encode(
                               b"not a nifti at all").decode()}})
    assert status == 400

    status, out = _request(port, "GET", "/nope")
    assert status == 404


def test_predict_through_aot_export(server, tmp_path):
    """The endpoint serves a deserialized AOT artifact identically."""
    from glfusion_tpu.utils.model_export import (export_serving_forward,
                                                 load_serving_forward,
                                                 save_exported)

    cfg, pipe, _ = server
    exported = export_serving_forward(cfg, pipe.model, pipe.variables,
                                      platforms=("cpu",))
    save_exported(exported, str(tmp_path / "art"), cfg)
    fwd, meta = load_serving_forward(str(tmp_path / "art"))
    aot_pipe = ClipPipeline(cfg, pipe.model, pipe.variables, forward=fwd,
                            expected_hw=meta["input_hw"])
    srv = make_http_server(aot_pipe, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        hw = cfg.data.crop_hw
        rs = np.random.RandomState(1)
        raw = {view: rs.randint(0, 255, (1, hw, hw, 2)).astype(np.uint8)
               for view in cfg.model.views}
        body = {"views": {v: _b64_vol(a) for v, a in raw.items()}}
        status, out = _request(srv.server_address[1], "POST", "/predict",
                               body)
        assert status == 200
        want = pipe.predict_one(pipe.stack_raw_views(raw))
        for vi, view in enumerate(cfg.model.views):
            got = parse_nifti_bytes(base64.b64decode(out["masks"][view]))
            np.testing.assert_array_equal(
                got, np.transpose(want[vi], (3, 1, 2, 0)))
    finally:
        srv.shutdown()
        srv.server_close()
