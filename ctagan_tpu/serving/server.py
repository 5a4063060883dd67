"""Production serving: HTTP synthesis service with micro-batching.

The reference has no serving story (inference = editing test lists and
re-running train.py). This daemon turns the flagship generator into a
service shaped for TPU throughput:

- ``POST /synthesize``: request body = one NCCT DICOM slice; response =
  the synthetic-CTA DICOM slice (same header, fresh SeriesInstanceUID).
- ``GET /healthz``: device/model status + rolling latency stats.

Requests are **micro-batched**: a collector thread drains the request queue
up to ``max_batch`` (or ``batch_timeout_ms``), pads to the compiled batch
shape, and runs ONE jitted forward — so concurrent clients share MXU work
instead of serializing 1-slice launches. Dispatch is **pipelined**: up to
``pipeline_depth`` batches are in flight before the oldest is synced, so the
host↔device round-trip latency (≈29 ms on the tunnel-attached TPU here) is
hidden under load instead of serializing every batch — measured +62% service
throughput at depth 2 and +78% at depth 4 vs depth 1 (512², max_batch 8,
saturated). Default ``max_batch`` is 16: the r1c generator throughput
curve reaches 269.7 slices/s at b=16 vs 194.5 at b=8 with the batch-gated
tap/fused paths (docs/evidence/bench_final1_r1c.log). Everything is stdlib
(http.server, queue, threading); the model and its compiled executable are
process-wide.
"""
from __future__ import annotations

import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ctagan_tpu.data.dicom import generate_uid, read_dicom
from ctagan_tpu.data.native import (
    dual_window_native,
    resize_nearest_native,
)


class _Pending:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image):
        self.image = image  # (H, W, C) model-input context stack
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[str] = None


class _SeriesRing:
    """Per-series state for 2.5-D models: the last ``C`` preprocessed
    slices (enough to build any still-dispatchable centered context) plus
    the requests waiting for their right-context to arrive."""

    __slots__ = ("slices", "pending", "count", "touched")

    def __init__(self):
        self.slices: "deque" = deque()  # (index, image), len kept <= C
        self.pending: "deque" = deque()  # (_Pending, center_index)
        self.count = 0  # slices received so far
        self.touched = time.monotonic()


class SynthesisService:
    def __init__(
        self,
        g_model,
        params,
        size: int = 512,
        max_batch: int = 16,
        batch_timeout_ms: float = 5.0,
        pipeline_depth: int = 2,
        quantize: str = "",
        channels: int = 1,
    ):
        import jax

        if channels % 2 != 1:
            raise ValueError("channels (context_slices) must be odd")
        self.size = size
        self.channels = channels
        # per-series context rings for 2.5-D models (channels > 1); a
        # request for slice i answers once slice i + channels//2 arrives
        # (or the series is flushed), so the served context is exactly the
        # training-time centered, edge-clamped window
        # (data/datasets.py::_load_context)
        self._rings: dict = {}
        self._ring_lock = threading.Lock()
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1e3
        self.pipeline_depth = max(1, pipeline_depth)
        self.quantize = quantize
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        if quantize == "int8":
            from ctagan_tpu.ops.quantize import (
                generator_int8_forward,
                quantize_generator,
            )

            self._fwd = jax.jit(generator_int8_forward)
            self._params = quantize_generator(params)
        elif quantize:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        else:
            self._fwd = jax.jit(lambda p, x: g_model.apply(p, x))
            self._params = params
        self._latencies = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        # warm the compiled executable at the fixed batch shape
        warm = np.zeros((max_batch, size, size, channels), np.float32)
        np.asarray(self._fwd(self._params, warm))
        self._worker.start()

    def _resolve(self, item):
        """Sync one in-flight batch (device→host) and wake its waiters."""
        batch, y_dev, t0 = item
        try:
            y = np.asarray(y_dev)
            for i, p in enumerate(batch):
                p.result = y[i, :, :, 0]
                p.event.set()
        except Exception as e:  # device-side failure surfaces at sync
            for p in batch:
                p.error = repr(e)
                p.event.set()
        with self._lock:
            self._latencies.append(time.perf_counter() - t0)
            if len(self._latencies) > 200:
                self._latencies.pop(0)

    def _run(self):
        # (batch, device_result, dispatch_time) awaiting device→host sync;
        # jit dispatch is async, so collecting+dispatching batch k+1 while
        # batch k computes hides the per-call round-trip latency.
        inflight: "deque" = deque()
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1 if not inflight else 0.0)
            except queue.Empty:
                if inflight:  # idle: drain the pipeline
                    self._resolve(inflight.popleft())
                continue
            batch = [first]
            deadline = time.perf_counter() + self.batch_timeout
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            t0 = time.perf_counter()
            try:
                x = np.stack([p.image for p in batch])  # (b, H, W, C)
                if len(batch) < self.max_batch:  # pad to compiled shape
                    pad = np.repeat(x[-1:], self.max_batch - len(batch), 0)
                    x = np.concatenate([x, pad], 0)
                inflight.append((batch, self._fwd(self._params, x), t0))
            except Exception as e:  # host-side failure (bad shapes etc.)
                for p in batch:
                    p.error = repr(e)
                    p.event.set()
            while len(inflight) > self.pipeline_depth:
                self._resolve(inflight.popleft())
        while inflight:  # stop(): don't leave waiters hanging until timeout
            self._resolve(inflight.popleft())

    def _context_window(self, ring: _SeriesRing, center: int, hi: int):
        """Training-exact centered context for ``center``: offsets clamped
        into the received range [oldest, hi] — identical edge behavior to
        ``PairedSliceDataset._load_context`` (clamp-replicate)."""
        half = self.channels // 2
        by_idx = dict(ring.slices)
        lo = ring.slices[0][0]
        return np.stack(
            [
                by_idx[min(max(center + off, lo), hi)]
                for off in range(-half, half + 1)
            ],
            axis=-1,
        )

    def _enqueue_series(self, image, series: str, last: bool) -> _Pending:
        """2.5-D streaming path: ring the slice, dispatch every request
        whose centered context is now complete (the response for slice i
        leaves when slice i + C//2 arrives, or immediately on ``last`` with
        the end-of-series clamp)."""
        half = self.channels // 2
        p = _Pending(None)
        ready = []
        with self._ring_lock:
            ring = self._rings.setdefault(series, _SeriesRing())
            ring.touched = time.monotonic()
            i = ring.count
            ring.count += 1
            ring.slices.append((i, image))
            while len(ring.slices) > self.channels:
                ring.slices.popleft()
            ring.pending.append((p, i))
            hi = i
            while ring.pending and (last or ring.pending[0][1] + half <= hi):
                q, c = ring.pending.popleft()
                q.image = self._context_window(ring, c, hi)
                ready.append(q)
            if last:
                del self._rings[series]
            elif len(self._rings) > 512:  # abandoned-stream GC
                stale = min(self._rings, key=lambda k: self._rings[k].touched)
                if stale != series:
                    for q, _c in self._rings[stale].pending:
                        q.error = "series evicted (abandoned stream)"
                        q.event.set()
                    del self._rings[stale]
        for q in ready:
            self._queue.put(q)
        return p

    def synthesize(
        self,
        image: np.ndarray,
        timeout: float = 60.0,
        series: Optional[str] = None,
        last: bool = False,
    ) -> np.ndarray:
        """Synthesize one slice. For 2.5-D models (``channels`` > 1):
        pass ``series`` to stream a series in order — the call blocks until
        the centered context is complete (C//2 slices of lag, flushed by
        ``last=True`` on the final slice). Without ``series`` the slice is
        treated as a one-slice series (context = C copies, the training
        clamp for a length-1 series)."""
        if self.channels == 1:
            p = _Pending(np.asarray(image, np.float32)[..., None])
            self._queue.put(p)
        elif series is None:
            ctx = np.repeat(
                np.asarray(image, np.float32)[..., None], self.channels, -1
            )
            p = _Pending(ctx)
            self._queue.put(p)
        else:
            p = self._enqueue_series(
                np.asarray(image, np.float32), str(series), last
            )
        if not p.event.wait(timeout):
            raise TimeoutError("synthesis timed out")
        if p.error:
            raise RuntimeError(p.error)
        return p.result

    def stats(self):
        with self._lock:
            lats = list(self._latencies)
        return {
            "batches_served": len(lats),
            "p50_batch_ms": float(np.median(lats) * 1e3) if lats else None,
            "max_batch": self.max_batch,
            "pipeline_depth": self.pipeline_depth,
            "quantize": self.quantize or None,
            "size": self.size,
        }

    def stop(self):
        self._stop.set()


def _make_handler(service: SynthesisService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({"status": "ok", **service.stats()}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/synthesize":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                ds = read_dicom(self.rfile.read(n))
                raw = ds.pixel_array()
                _, full = dual_window_native(raw)
                orig = full.shape[0]
                if full.shape != (service.size, service.size):
                    full = resize_nearest_native(
                        np.ascontiguousarray(full, np.float32), service.size
                    )
                # 2.5-D streaming: X-Series-UID groups a stream (default:
                # the slice's own SeriesInstanceUID); X-Last-Slice: 1 on the
                # final slice flushes the tail. Clients must pipeline —
                # response i completes when slice i + C//2 posts.
                series = self.headers.get("X-Series-UID") or getattr(
                    ds, "series_instance_uid", None
                )
                last = self.headers.get("X-Last-Slice", "0") == "1"
                if service.channels > 1 and self.headers.get(
                    "X-Single-Slice", "0"
                ) == "1":
                    series = None  # stateless: replicate-context
                fake = service.synthesize(full, series=series, last=last)
                if fake.shape[0] != orig:
                    fake = resize_nearest_native(
                        np.ascontiguousarray(fake, np.float32), orig
                    )
                ds.set_pixel_data((fake + 1.0) * 0.5 * 4095.0)
                ds.series_instance_uid = generate_uid()
                from ctagan_tpu.data.dicom import dicom_bytes

                out = dicom_bytes(ds)
                self.send_response(200)
                self.send_header("Content-Type", "application/dicom")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            except Exception as e:
                msg = json.dumps({"error": repr(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return Handler


def serve(
    g_model,
    params,
    host: str = "127.0.0.1",
    port: int = 8080,
    size: int = 512,
    max_batch: int = 16,
    pipeline_depth: int = 2,
    quantize: str = "",
    channels: int = 1,
):
    """Start the synthesis HTTP server (blocking); returns (server, service)
    when used programmatically via ``serve_async``."""
    service = SynthesisService(
        g_model, params, size=size, max_batch=max_batch,
        pipeline_depth=pipeline_depth, quantize=quantize, channels=channels,
    )
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    server.serve_forever()


def serve_async(
    g_model,
    params,
    host: str = "127.0.0.1",
    port: int = 0,
    size: int = 512,
    max_batch: int = 16,
    pipeline_depth: int = 2,
    channels: int = 1,
):
    """Start in a background thread; returns (server, service, port)."""
    service = SynthesisService(
        g_model, params, size=size, max_batch=max_batch,
        pipeline_depth=pipeline_depth, channels=channels,
    )
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, service, server.server_address[1]
