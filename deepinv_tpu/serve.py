"""Inference serving — the server side of :class:`deepinv_tpu.models.Client`.

The reference ships only the REST *client* (deepinv/models/client.py:13:
base64-npy tensors inside JSON, physics passed by name, bearer-token
auth). This module provides the matching production server so the pair
works end-to-end:

- :class:`InferenceServer` — a threaded HTTP server hosting named
  reconstructors. Each model's forward is jit-compiled once per
  measurement shape and cached; requests run the compiled program (on the
  TPU when one is attached).
- :func:`serve` — one-liner blocking entry point.

The wire protocol matches the client exactly, so a reference-API user can
point either framework's ``Client`` at this server.

:Examples:

    >>> import jax, numpy as np
    >>> from deepinv_tpu.serve import InferenceServer
    >>> from deepinv_tpu.models import MedianFilter, ArtifactRemoval, Client
    >>> from deepinv_tpu.physics import Denoising, GaussianNoise
    >>> physics = Denoising(noise_model=GaussianNoise(0.05))
    >>> model = ArtifactRemoval(MedianFilter(3), mode="direct")
    >>> server = InferenceServer()
    >>> server.register("Denoising", model, physics)
    >>> with server.running() as url:  # doctest: +SKIP
    ...     xhat = Client(url)(y, physics)
"""

from __future__ import annotations

import base64
import io
import json
import threading
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["InferenceServer", "serve"]


def _encode(arr):
    buf = io.BytesIO()
    np.save(buf, np.asarray(arr))
    return base64.b64encode(buf.getvalue()).decode()


def _decode(s):
    return np.load(io.BytesIO(base64.b64decode(s)))


class InferenceServer:
    """Threaded HTTP reconstruction server (counterpart of the reference's
    remote endpoint consumed by models/client.py).

    :param api_key: optional bearer token; requests must present it.
    :param host: bind address (default loopback).
    :param port: port; 0 picks a free one.
    """

    def __init__(self, api_key: str = "", host: str = "127.0.0.1", port: int = 0):
        self.api_key = api_key
        self.host = host
        self.port = port
        self._registry = {}
        self._jitted = {}
        self._httpd = None
        self._thread = None

    def register(self, physics_name: str, model, physics):
        """Host ``model`` for requests naming ``physics_name`` (the Client
        sends ``type(physics).__name__``)."""
        self._registry[physics_name] = (model, physics)
        return self

    # -- request handling --------------------------------------------------
    def _infer(self, payload: dict):
        import jax
        import jax.numpy as jnp

        name = payload.get("physics")
        if name not in self._registry:
            raise KeyError(
                f"no model registered for physics {name!r}; "
                f"available: {sorted(self._registry)}"
            )
        model, physics = self._registry[name]
        y = jnp.asarray(_decode(payload["y"]))
        key = (name, y.shape, str(y.dtype))
        if key not in self._jitted:
            self._jitted[key] = jax.jit(lambda m, yv, p: m(yv, p))
        x_hat = self._jitted[key](model, y, physics)
        return {"x_hat": _encode(x_hat)}

    def _make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                try:
                    if server_self.api_key:
                        auth = self.headers.get("Authorization", "")
                        if auth != f"Bearer {server_self.api_key}":
                            self.send_response(401)
                            self.end_headers()
                            self.wfile.write(b'{"error": "unauthorized"}')
                            return
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length))
                    out = server_self._infer(payload)
                    body = json.dumps(out).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as e:  # noqa: BLE001 — report to client
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

        return Handler

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> str:
        """Start serving in a background thread; returns the endpoint URL."""
        self._httpd = ThreadingHTTPServer(
            (self.host, self.port), self._make_handler()
        )
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.url

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    @contextmanager
    def running(self):
        url = self.start()
        try:
            yield url
        finally:
            self.stop()


def serve(model, physics, host: str = "127.0.0.1", port: int = 8000,
          api_key: str = ""):
    """Blocking one-model server: ``serve(model, physics)`` then point a
    :class:`deepinv_tpu.models.Client` (or the reference's) at it."""
    s = InferenceServer(api_key=api_key, host=host, port=port)
    s.register(type(physics).__name__, model, physics)
    url = s.start()
    print(f"serving {type(model).__name__} for {type(physics).__name__} at {url}")
    try:
        s._thread.join()
    except KeyboardInterrupt:
        s.stop()
