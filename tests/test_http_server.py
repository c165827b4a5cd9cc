"""HTTP inference server (surya_tpu/infer/http_server.py): request
decoding, wire-format enforcement, and a real localhost round trip.

The reference serves nothing (its closest path is rerunning the eager
eval script, ``experiment/test_on_video_cnn.py:253-254``); this tier is
beyond-reference deployment surface, so the tests pin its contract:
npz and JSON bodies, uint8 wire enforcement, label mapping, and error
codes that keep the process alive.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surya_tpu.core.config import ModelConfig
from surya_tpu.infer.http_server import PredictionServer
from surya_tpu.infer.serve import Predictor
from surya_tpu.models import get_model

CLASSES = ["c0", "c1", "c2", "c3", "c4"]


@pytest.fixture(scope="module")
def server_setup():
    cfg = ModelConfig(name="quadtree", num_classes=5,
                      compute_dtype="float32")
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(3, 224, 224, 3), dtype=np.uint8)
    feats = rng.normal(size=(3, 47)).astype(np.float32)
    norm = raw.astype(np.float32) / 255.0
    variables = model.init({"params": jax.random.key(0)},
                           jnp.asarray(norm), jnp.asarray(feats),
                           train=False)
    predictor = Predictor(cfg, variables, batch_size=4,
                          input_dtype=jnp.uint8)
    want_preds, want_probs = predictor.predict(raw, feats)
    srv = PredictionServer(predictor, class_names=CLASSES)
    return srv, raw, feats, want_preds, want_probs


def _npz_bytes(images, feats):
    buf = io.BytesIO()
    np.savez(buf, images=images, features=feats)
    return buf.getvalue()


def test_handle_npz_body(server_setup):
    srv, raw, feats, want_preds, want_probs = server_setup
    out = srv.handle_bytes(_npz_bytes(raw, feats), "application/x-npz")
    assert out["n"] == 3
    np.testing.assert_array_equal(out["predictions"], want_preds)
    np.testing.assert_allclose(out["probabilities"], want_probs,
                               atol=1e-5)
    assert out["labels"] == [CLASSES[i] for i in want_preds]


def test_handle_json_body(server_setup):
    srv, raw, feats, want_preds, _ = server_setup
    body = json.dumps({"images": raw.tolist(),
                       "features": feats.tolist()}).encode()
    out = srv.handle_bytes(body, "application/json")
    np.testing.assert_array_equal(out["predictions"], want_preds)


def test_json_int_lists_cast_to_wire_dtype(server_setup):
    """JSON number lists (asarray default int64) are cast straight to
    the server's wire dtype — the strict dtype check is for binary
    bodies, not the curl-able convenience path."""
    srv, raw, feats, want_preds, _ = server_setup
    body = json.dumps({"images": raw.tolist(),
                       "features": feats.tolist()}).encode()
    out = srv.handle_bytes(body, "application/json")
    assert out["n"] == 3
    np.testing.assert_array_equal(out["predictions"], want_preds)


def test_wire_dtype_enforced(server_setup):
    srv, raw, feats, *_ = server_setup
    with pytest.raises(ValueError, match="wire format is uint8"):
        srv.handle_bytes(
            _npz_bytes(raw.astype(np.float32) / 255.0, feats),
            "application/x-npz")


def test_malformed_bodies_raise_value_error(server_setup):
    srv, raw, feats, *_ = server_setup
    with pytest.raises(ValueError):
        srv.handle_bytes(b"not an npz", "application/x-npz")
    with pytest.raises(ValueError, match="missing field"):
        srv.handle_bytes(json.dumps({"images": [[0]]}).encode(),
                         "application/json")
    with pytest.raises(ValueError, match="batch mismatch"):
        srv.handle_bytes(_npz_bytes(raw, feats[:2]),
                         "application/x-npz")


def test_json_float_pixels_rejected_on_uint8_wire(server_setup):
    """Normalized [0,1] float pixels sent as JSON to a uint8-wire server
    must 400, not truncate to all-zeros and answer confidently
    (ADVICE r3: the npz path already rejected this, JSON did not)."""
    srv, raw, feats, *_ = server_setup
    norm = (raw.astype(np.float64) / 255.0)
    body = json.dumps({"images": norm.tolist(),
                       "features": feats.tolist()}).encode()
    with pytest.raises(ValueError, match="wire format is uint8"):
        srv.handle_bytes(body, "application/json")
    # out-of-range integers are rejected too
    body = json.dumps({"images": (raw.astype(np.int64) + 300).tolist(),
                       "features": feats.tolist()}).encode()
    with pytest.raises(ValueError, match="wire format is uint8"):
        srv.handle_bytes(body, "application/json")


def test_json_ragged_lists_are_400_not_500(server_setup):
    srv, raw, feats, *_ = server_setup
    body = json.dumps({"images": [[1, 2], [3]],
                       "features": feats.tolist()}).encode()
    with pytest.raises(ValueError, match="rectangular"):
        srv.handle_bytes(body, "application/json")


def test_info_contract(server_setup):
    srv, *_ = server_setup
    info = srv.info()
    assert info["status"] == "ok"
    assert info["model"] == "quadtree"
    assert info["input_dtype"] == "uint8"
    assert info["classes"] == CLASSES


def test_temporal_server_round_trip():
    """Sequence-input serving over real sockets: a temporal checkpoint
    (ji_3dcnn) behind the same uint8-wire HTTP path — (N,T,H,W,3)
    images + (N,T,F) features in one npz body (VERDICT r3 item 8)."""
    cfg = ModelConfig(name="ji_3dcnn", num_classes=5, seq_len=4,
                      compute_dtype="float32")
    model = get_model(cfg)
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(3, 4, 32, 32, 3), dtype=np.uint8)
    feats = rng.normal(size=(3, 4, 47)).astype(np.float32)
    norm = raw.astype(np.float32) / 255.0
    variables = model.init({"params": jax.random.key(0)},
                           jnp.asarray(norm), jnp.asarray(feats),
                           train=False)
    predictor = Predictor(cfg, variables, batch_size=4, image_size=32,
                          input_dtype=jnp.uint8)
    want_preds, _ = predictor.predict(raw, feats)
    srv = PredictionServer(predictor, class_names=CLASSES)

    assert srv.info()["model"] == "ji_3dcnn"
    out = srv.handle_bytes(_npz_bytes(raw, feats), "application/x-npz")
    np.testing.assert_array_equal(out["predictions"], want_preds)

    httpd = srv.make_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=_npz_bytes(raw, feats),
            headers={"Content-Type": "application/x-npz"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        np.testing.assert_array_equal(out["predictions"], want_preds)
        assert out["labels"] == [CLASSES[i] for i in want_preds]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_localhost_round_trip(server_setup):
    """Real sockets: /healthz, /predict (npz), 400 on garbage, 404."""
    srv, raw, feats, want_preds, _ = server_setup
    httpd = srv.make_server("127.0.0.1", 0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"

        req = urllib.request.Request(
            f"{base}/predict", data=_npz_bytes(raw, feats),
            headers={"Content-Type": "application/x-npz"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        np.testing.assert_array_equal(out["predictions"], want_preds)
        assert out["labels"] == [CLASSES[i] for i in want_preds]

        bad = urllib.request.Request(
            f"{base}/predict", data=b"garbage",
            headers={"Content-Type": "application/x-npz"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert ei.value.code == 404

        # Server survived the errors: predict again.
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.load(r)["n"] == 3
    finally:
        httpd.shutdown()
        httpd.server_close()
