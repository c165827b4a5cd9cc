"""Minimal stdlib HTTP inference server around :class:`Predictor`.

The reference has no serving story at all — its closest artifact is
re-running the eager evaluation script with the full training stack
installed (``experiment/test_on_video_cnn.py:253-254``). This module
makes the TPU build's deployment tier concrete: one process owns the
chip, requests are chunked/padded/batched by the AOT-compiled
``Predictor`` (``infer/serve.py``), and the wire protocol needs numpy
only on the client (see ``scripts/serving_client.py`` for the
artifact-file sibling).

Endpoints
  GET  /healthz   → JSON {status, model, batch_size, image wire spec}
  POST /predict   → JSON {predictions, [labels], probabilities, n}

Request body for /predict:
  * ``application/x-npz`` (preferred): ``np.savez`` bytes with arrays
    ``images`` (N,H,W,3) and ``features`` (N,F) — or, for a temporal
    checkpoint (``--preset fact``, ``cnn-lstm``, ...), sequence inputs
    ``images`` (N,T,H,W,3) and ``features`` (N,T,F) through the same
    wire. Image dtype must match
    the server's wire format — raw uint8 pixels when started with
    ``--input-dtype uint8`` (4× smaller requests, the production
    default), float32 [0,1] otherwise.
  * ``application/json``: {"images": nested lists, "features": ...} —
    curl-able, but ~10× the bytes; intended for smoke tests.

Concurrency: the handler is threaded (keeps slow readers from stalling
the accept loop) but device dispatch is serialized behind one lock —
a single chip executes one program at a time anyway, and ``Predictor``
already amortizes via chunked batching. Horizontal scale = one process
per chip behind any off-the-shelf HTTP balancer.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["PredictionServer", "main"]

_MAX_BODY = 1 << 30  # 1 GiB: ~7k uint8 224² images per request


class PredictionServer:
    """Owns a ``Predictor`` + optional class names; builds the stdlib
    server. Split from the handler so tests can drive ``handle_bytes``
    without sockets."""

    def __init__(self, predictor, class_names: list[str] | None = None):
        self.predictor = predictor
        self.class_names = class_names
        self._lock = threading.Lock()

    # ---- protocol-independent core (unit-testable) -------------------
    def info(self) -> dict:
        p = self.predictor
        return {
            "status": "ok",
            "model": p.cfg.name,
            "mode": p.cfg.mode,
            "num_classes": p.cfg.num_classes,
            "batch_size": p.batch_size,
            "image_size": p.image_size,
            "input_dtype": str(np.dtype(p.input_dtype)),
            "num_features": p.cfg.num_features,
            "classes": self.class_names,
        }

    def handle_bytes(self, body: bytes, content_type: str) -> dict:
        """Decode one /predict request body → response dict.

        Raises ``ValueError`` for malformed requests (mapped to 400)."""
        wire = np.dtype(self.predictor.input_dtype)
        if content_type.startswith("application/json"):
            req = json.loads(body.decode("utf-8"))
            try:
                # JSON is the convenience path: parse at full precision
                # first so a uint8 wire can VERIFY the values are raw
                # 0-255 integers before casting — [0,1] float pixels
                # cast straight to uint8 truncate to all-zeros and
                # return confidently wrong predictions with a 200.
                images = np.asarray(req["images"], np.float64)
                feats = np.asarray(req["features"], np.float32)
            except KeyError as e:
                raise ValueError(f"missing field {e.args[0]!r}") from e
            except (TypeError, ValueError) as e:
                # ragged or non-numeric nested lists → 400, not 500
                raise ValueError(
                    f"images/features must be rectangular numeric "
                    f"lists: {e}") from e
            if wire == np.uint8:
                if images.size and (np.any(images != np.floor(images))
                                    or images.min() < 0
                                    or images.max() > 255):
                    raise ValueError(
                        "this server's wire format is uint8 raw pixels; "
                        "JSON image values must be integers in [0, 255] "
                        "(got float or out-of-range values — send raw "
                        "pixels, not normalized ones)")
            images = images.astype(wire)
        else:  # npz (the efficient path)
            try:
                with np.load(io.BytesIO(body)) as z:
                    images, feats = z["images"], z["features"]
            except KeyError as e:
                raise ValueError(str(e)) from e
            except Exception as e:  # zipfile/np header errors
                raise ValueError(f"not a readable .npz body: {e}") from e
        if images.ndim < 2 or feats.ndim < 1:
            raise ValueError("images/features have too few dimensions")
        if images.shape[0] != feats.shape[0]:
            raise ValueError(
                f"batch mismatch: {images.shape[0]} images vs "
                f"{feats.shape[0]} feature rows")
        if wire == np.uint8 and images.dtype != np.uint8:
            raise ValueError(
                "this server's wire format is uint8 raw pixels; got "
                f"{images.dtype} (re-export or send raw pixels)")
        with self._lock:  # one chip, one program at a time
            preds, probs = self.predictor.predict(images, feats)
        out = {"n": int(preds.shape[0]),
               "predictions": preds.tolist(),
               "probabilities": np.round(probs, 6).tolist()}
        if self.class_names:
            out["labels"] = [self.class_names[i] for i in preds]
        return out

    # ---- stdlib server ------------------------------------------------
    def make_server(self, host: str = "0.0.0.0", port: int = 8577
                    ) -> ThreadingHTTPServer:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _send(self, code: int, payload: dict,
                      close: bool = False) -> None:
                raw = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                if close:
                    # Rejecting a request WITHOUT reading its body:
                    # under HTTP/1.1 keep-alive the unread body bytes
                    # would be parsed as the next request line, so end
                    # the connection instead of desyncing it.
                    self.send_header("Connection", "close")
                    self.close_connection = True
                self.end_headers()
                self.wfile.write(raw)

            def do_GET(self):  # noqa: N802 (stdlib API)
                if self.path == "/healthz":
                    self._send(200, outer.info())
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):  # noqa: N802
                if self.path != "/predict":
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                if not 0 < n <= _MAX_BODY:
                    self._send(413 if n else 400,
                               {"error": f"bad Content-Length {n}"},
                               close=True)
                    return
                body = self.rfile.read(n)
                try:
                    self._send(200, outer.handle_bytes(
                        body, self.headers.get("Content-Type", "")))
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:  # keep the server up
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

            def log_message(self, fmt, *args):  # quiet by default
                pass

        return ThreadingHTTPServer((host, port), Handler)


def main(argv: list[str]) -> int:
    """``python -m surya_tpu serve CKPT [--preset P] [--port N] ...``"""
    import argparse

    import jax.numpy as jnp

    from surya_tpu.core.checkpoint import load_checkpoint_variables
    from surya_tpu.core.config import get_preset, parse_cli_overrides
    from surya_tpu.infer.serve import Predictor

    ap = argparse.ArgumentParser(prog="surya_tpu serve")
    ap.add_argument("checkpoint")
    ap.add_argument("--preset", default="quadtree-fusion")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8577)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--param-dtype", default="bfloat16",
                    choices=["bfloat16", "float16", "float32"])
    ap.add_argument("--input-dtype", default="uint8",
                    choices=["float32", "bfloat16", "uint8"],
                    help="image wire format (uint8 raw pixels is the "
                         "production default: 4x smaller requests, "
                         "/255 traced into the program)")
    ap.add_argument("--classes", default=None,
                    help="JSON list of class names for the 'labels' "
                         "response field")
    args, rest = ap.parse_known_args(argv)
    cfg = get_preset(args.preset)
    if rest:
        cfg = cfg.override(parse_cli_overrides(rest))
    class_names = None
    if args.classes:
        with open(args.classes) as f:
            class_names = json.load(f)
        if len(class_names) < cfg.model.num_classes:
            raise SystemExit(
                f"--classes lists {len(class_names)} names but the "
                f"model has {cfg.model.num_classes} classes; every "
                "/predict with labels would 500 on IndexError")

    variables = load_checkpoint_variables(args.checkpoint)
    predictor = Predictor(cfg.model, variables,
                          batch_size=args.batch_size,
                          image_size=cfg.data.image_size,
                          param_dtype=jnp.dtype(args.param_dtype),
                          input_dtype=jnp.dtype(args.input_dtype))
    server = PredictionServer(predictor, class_names)
    httpd = server.make_server(args.host, args.port)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      **server.info()}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0
