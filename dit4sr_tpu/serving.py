"""Production serving for the SR pipeline.

The reference has no serving layer — SURVEY.md §1: "There is no
service/serving layer; inference is batch-script based." This module adds
one, shaped by how the TPU actually behaves:

  * **static shapes, compiled once**: a server instance is compiled for one
    (lq_size, text_len) contract at startup; requests are resized to it, so
    no request can ever trigger a recompile (an XLA recompile mid-traffic is
    a multi-second stall).
  * **B=1 latency serving**: measured on v5e the chip is compute-saturated
    at batch 1 (CLAUDE.md: B=4 gives 1.61 s/image vs 1.57 at B=1), so the
    server runs one request at a time behind a lock instead of micro-batching
    — micro-batching would only add queueing delay.
  * **warm start**: the first compile (~100 s on TPU) happens in warmup(),
    before the port opens, not on the first request.
  * **health/stats endpoints** for orchestration (readiness probes, p50/p99).

Transport is stdlib http.server (zero extra dependencies; the TPU host
serves one model — a single-threaded handler in front of a locked device is
the honest concurrency model).
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np


class SRServer:
    """Wraps a compiled SRPipeline into a request-at-a-time inference server.

    Args:
      pipe: `pipelines.sr_pipeline.SRPipeline`.
      params: {"mmdit": ..., "vae": ...} parameter pytree.
      encoder: prompt encoder, `list[str] -> (text_embeds, pooled)`.
      lq_size: the LQ input size this instance is compiled for. Incoming
        images of any size are bicubic-resized to (lq_size, lq_size); the
        SR output is resized back to (H*upscale, W*upscale) of the original.
      upscale: SR factor (4 for the DiT4SR protocol).
    """

    def __init__(self, pipe, params, encoder, lq_size: int = 128,
                 upscale: int = 4, seed: int = 0, tsm_sampler=None):
        self.pipe = pipe
        self.params = params
        self.encoder = encoder
        self.lq_size = lq_size
        self.upscale = upscale
        # TSM mode (reference pred_tsm protocol): an OCRGuidedSampler drives
        # the denoise loop with per-step TESTR -> prompt rewriting. `params`
        # must then include "testr". The jitted step inside the sampler is
        # compiled once; only prompt re-encoding runs per step on the host.
        self.tsm = tsm_sampler
        self._fn = pipe.jit() if tsm_sampler is None else None
        # CFG: guidance_scale > 1 in the pipe's SamplerConfig combines with
        # this negative prompt (reference default: null prompt); its
        # embeddings are computed once and cached — the prompt is fixed
        # per server instance
        self.negative_prompt = ""
        self._neg_cache = None
        self._rng = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        self._latencies = deque(maxlen=1024)
        self._count = 0
        self._warm = False

    # -- core ---------------------------------------------------------------

    def warmup(self) -> float:
        """Compile + run once on zeros. Returns wall seconds."""
        t0 = time.perf_counter()
        lq = np.zeros((self.lq_size, self.lq_size, 3), np.float32)
        self.infer(lq, prompt="")
        self._warm = True
        # warmup is not traffic
        self._latencies.clear()
        self._count = 0
        return time.perf_counter() - t0

    def infer(self, image: np.ndarray, prompt: str = "") -> np.ndarray:
        """uint8/float (H, W, 3) LQ image -> uint8 (H*up, W*up, 3) SR image."""
        import cv2

        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(f"expected (H, W, 3) image, got {image.shape}")
        h, w = image.shape[:2]
        img = image.astype(np.float32)
        if image.dtype == np.uint8:
            img = img / 255.0
        if (h, w) != (self.lq_size, self.lq_size):
            img = cv2.resize(img, (self.lq_size, self.lq_size),
                             interpolation=cv2.INTER_CUBIC).clip(0.0, 1.0)

        from dit4sr_tpu.pipelines.sr_pipeline import bicubic_upscale

        text, pooled = self.encoder([prompt])
        lq_up = bicubic_upscale(jnp.asarray(img[None]), self.upscale)

        t0 = time.perf_counter()
        with self._lock:  # one request on the chip at a time (B=1 regime)
            self._rng, key = jax.random.split(self._rng)
            if self.tsm is not None:
                sr = self.tsm(self.params, key, lq_up, [prompt])
            elif self.pipe.sampler_cfg.guidance_scale > 1.0:
                if self._neg_cache is None:
                    self._neg_cache = self.encoder([self.negative_prompt])
                neg_t, neg_p = self._neg_cache
                sr = self._fn(self.params, key, lq_up, text, pooled,
                              neg_text_embeds=neg_t, neg_pooled_embeds=neg_p)
            else:
                sr = self._fn(self.params, key, lq_up, text, pooled)
            sr_np = np.asarray(sr[0], np.float32)  # device sync
        self._latencies.append(time.perf_counter() - t0)
        self._count += 1

        out_hw = (w * self.upscale, h * self.upscale)
        if sr_np.shape[:2] != (out_hw[1], out_hw[0]):
            sr_np = cv2.resize(sr_np, out_hw, interpolation=cv2.INTER_CUBIC)
        return (sr_np.clip(0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

    # -- introspection --------------------------------------------------------

    def stats(self) -> dict:
        lat = sorted(self._latencies)
        pct = lambda p: lat[min(int(len(lat) * p), len(lat) - 1)] if lat else None
        return {
            "requests": self._count,
            "warm": self._warm,
            "lq_size": self.lq_size,
            "upscale": self.upscale,
            "latency_p50_s": pct(0.50),
            "latency_p99_s": pct(0.99),
            "backend": jax.default_backend(),
        }


def make_handler(server: SRServer):
    """HTTP handler:
      GET  /healthz          -> 200 "ok" once warm (503 before)
      GET  /v1/stats         -> JSON latency/request stats
      POST /v1/sr?prompt=... -> body: PNG/JPEG bytes, response: PNG bytes
                                (prompt also accepted via X-Prompt header)
    """
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                if server._warm:
                    self._send(200, b"ok", "text/plain")
                else:
                    self._send(503, b"warming up", "text/plain")
            elif path == "/v1/stats":
                self._send(200, json.dumps(server.stats()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/v1/sr":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                   cv2.IMREAD_COLOR)
                if img is None:
                    self._send(400, b"could not decode image", "text/plain")
                    return
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                q = parse_qs(parsed.query)
                prompt = (q.get("prompt", [None])[0]
                          or self.headers.get("X-Prompt", ""))
                sr = server.infer(img, prompt=prompt)
                ok, buf = cv2.imencode(
                    ".png", cv2.cvtColor(sr, cv2.COLOR_RGB2BGR))
                if not ok:
                    raise RuntimeError("png encode failed")
                self._send(200, buf.tobytes(), "image/png")
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._send(500, f"error: {e}".encode(), "text/plain")

    return Handler


def serve(server: SRServer, host: str = "0.0.0.0", port: int = 8000,
          warmup: bool = True) -> ThreadingHTTPServer:
    """Warm up, bind, and return the HTTP server (call .serve_forever())."""
    if warmup:
        dt = server.warmup()
        print(f"warmup compile+run: {dt:.1f} s", flush=True)
    httpd = ThreadingHTTPServer((host, port), make_handler(server))
    print(f"serving on http://{host}:{httpd.server_address[1]} "
          f"(lq_size={server.lq_size}, x{server.upscale})", flush=True)
    return httpd
