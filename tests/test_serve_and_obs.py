"""Serving endpoint + observability tests (tiny model, real HTTP)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_nan_guard(tmp_path):
    from resshift_tpu.utils.observability import nan_guard

    batch = {"a": jnp.asarray([1.0, float("nan")]), "b": jnp.ones((2,))}
    out, flagged = nan_guard(batch, tmp_path / "audit.log")
    assert flagged
    assert np.isfinite(np.asarray(out["a"])).all()
    assert (tmp_path / "audit.log").read_text().startswith("NaN found")
    out2, flagged2 = nan_guard({"a": jnp.ones((2,))})
    assert not flagged2


def test_measure():
    from resshift_tpu.utils.observability import measure

    r = measure(lambda: jnp.ones((64, 64)) @ jnp.ones((64, 64)), iters=2)
    assert r["compile_s"] >= 0 and r["steady_s"] >= 0


def test_http_serving_roundtrip(monkeypatch):
    """Boot the HTTP server with a stub predictor and drive it end-to-end."""
    import cv2

    from resshift_tpu import serve as srv

    class StubPredictor:
        def predict(self, image, mask=None):
            # 4x nearest upscale standing in for the real pipeline
            return np.repeat(np.repeat(image.astype(np.float32) / 255.0, 4, 0), 4, 1)

    srv._Handler.predictor = StubPredictor()
    httpd = srv.ThreadingHTTPServer(("127.0.0.1", 0), srv._Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"
        # restore
        img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
        ok, enc = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        req = urllib.request.Request(f"http://127.0.0.1:{port}/restore",
                                     data=enc.tobytes(), method="POST")
        with urllib.request.urlopen(req) as r:
            out = cv2.imdecode(np.frombuffer(r.read(), np.uint8), cv2.IMREAD_COLOR)
        assert out.shape == (64, 64, 3)
        # malformed body -> clean 500 JSON error
        req = urllib.request.Request(f"http://127.0.0.1:{port}/restore",
                                     data=b"not-an-image", method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.loads(e.read())
        # wrong path -> 404
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # browser demo page (app.py-equivalent UI)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert "ResShift-TPU" in page and "/restore" in page
    finally:
        httpd.shutdown()
