"""HTTP scoring endpoint — the online half of the serving story.

The reference has no serving surface at all (its closest is an offline
``evaluate`` over cached splits, `train.py:88-139`); this module serves a
trained run over HTTP with the run's own preprocessing pipeline and the
persisted dataset-creation scalers, so a production client POSTs the raw
instrument file and gets per-event probabilities back:

    python train.py serve log/version_0 --port 8000 [--quant int8|auto]

    POST /predict   body = raw shower HDF5 bytes → JSON predictions
    GET  /health    → {"status": "ok", "model": ..., "quant": ...}

Design notes:

- one warm ``ModelWrapper`` per process: the jit'd eval program compiles on
  the first request per batch shape and is cached after (static pow2
  buckets keep the shape set small)
- requests are scored under a lock — a single TPU executes one program at
  a time anyway, so cross-request parallelism belongs at the replica
  level, not in-process
- stdlib ``http.server`` only (zero new dependencies), threaded accept
  loop so health checks never queue behind a scoring request
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

MAX_BODY = 1 << 30  # refuse absurd uploads before buffering them


class Scorer:
    """Load a run dir once; score raw shower files thread-safely."""

    def __init__(self, model_dir: str, quant: str = "none"):
        from point_cloud_classifier_tpu.factory import (
            apply_quant,
            get_model,
            resolve_quant,
        )
        from point_cloud_classifier_tpu.utils.config import load_config

        self.config = load_config(os.path.join(model_dir, "config.yaml"))
        self.model_name = self.config["meta"]["model_name"]
        self.dataset_name = self.config["meta"]["dataset_name"]
        # store the RESOLVED path ("auto" → int8/none by the measured
        # crossover) so /health's quant_active never reports "auto"
        self.quant = resolve_quant(self.config, self.model_name, quant)
        apply_quant(self.config, self.model_name, self.quant)
        self.model = get_model(
            model_name=self.model_name, config=self.config, model_dir=model_dir
        )
        self._lock = threading.Lock()

    def quant_active(self) -> str:
        """The quantization the eval step will ACTUALLY run.

        ``--quant int8`` on a layer_norm DeepSets config silently falls
        back to float inside the model (``DeepSets._phi_mode``); /health
        must report the executing path, not the requested one."""
        net = getattr(self.model, "model", None)
        if self.quant != "none" and hasattr(net, "_phi_mode"):
            return self.quant if net._phi_mode(train=False) == "int8" else "none"
        return self.quant

    def score_bytes(self, data: bytes) -> list:
        """Raw shower HDF5 bytes → [{event_id, probability, prediction}]."""
        import numpy as np

        from point_cloud_classifier_tpu.data.inference import inference_loader

        with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            loader, event_ids = inference_loader(
                self.dataset_name, self.config, path
            )
            with self._lock:
                _, probs = self.model.predict(loader, return_prob=True)
        finally:
            os.unlink(path)
        probs = np.asarray(probs).reshape(-1)
        return [
            {
                "event_id": int(ev),
                "probability": float(p),
                "prediction": int(p >= 0.5),
            }
            for ev, p in zip(event_ids, probs)
        ]


class _Handler(BaseHTTPRequestHandler):
    scorer: Scorer = None  # injected by make_server
    quiet = True
    # socket timeout (BaseRequestHandler.setup applies it): without one, a
    # client that sends fewer bytes than Content-Length parks rfile.read()
    # forever and ThreadingHTTPServer leaks one stuck thread per such
    # connection until fd exhaustion
    timeout = 60

    def _json(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/health":
            self._json(
                200,
                {
                    "status": "ok",
                    "model": self.scorer.model_name,
                    "dataset": self.scorer.dataset_name,
                    "quant": self.scorer.quant_active(),
                },
            )
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/predict":
            self._json(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            self._json(400, {"error": "bad Content-Length header"})
            return
        if not 0 < length <= MAX_BODY:
            self._json(400, {"error": f"bad Content-Length {length}"})
            return
        try:
            data = self.rfile.read(length)
        except OSError as exc:  # client stalled past the socket timeout
            self._json(408, {"error": f"body read failed: {exc}"})
            return
        try:
            predictions = self.scorer.score_bytes(data)
        except FileNotFoundError as exc:
            # e.g. the run's persisted scaler missing on the serving host —
            # a server-side deployment defect, not bad client input
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})
            return
        except (ValueError, KeyError, OSError) as exc:
            # undecodable/malformed payloads → client error.  The h5 stack
            # surfaces bad uploads as OSError("Unable to open file"), so
            # OSError counts as client input here, post-read.
            self._json(400, {"error": f"{type(exc).__name__}: {exc}"})
            return
        except Exception as exc:
            # anything else (missing scaler on the serving host, backend
            # or compile failure, OOM) is a SERVER fault: a 400 would send
            # monitoring after the clients and make them retry a permanent
            # server defect
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._json(200, {"predictions": predictions})

    def log_message(self, fmt, *args):
        if not self.quiet:
            super().log_message(fmt, *args)


def make_server(
    model_dir: str, host: str = "127.0.0.1", port: int = 8000,
    quant: str = "none", quiet: bool = True,
) -> ThreadingHTTPServer:
    """Build (but don't start) the scoring server; ``.server_address`` has
    the bound port (use port=0 for an ephemeral one)."""
    scorer = Scorer(model_dir, quant=quant)
    handler = type("Handler", (_Handler,), {"scorer": scorer, "quiet": quiet})
    return ThreadingHTTPServer((host, port), handler)


def serve(model_dir: str, host: str = "127.0.0.1", port: int = 8000,
          quant: str = "none") -> None:
    server = make_server(model_dir, host, port, quant=quant, quiet=False)
    print(f"Serving {model_dir} on http://{host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
