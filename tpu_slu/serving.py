"""Production inference serving: micro-batching SLU decode server.

The reference has no serving story beyond ``model.decode_intents(signal)``
in a Python shell (reference README.md:26-41). This module packages that for
deployment on a TPU chip:

* **Micro-batching**: concurrent requests are drained from a queue and padded
  into ONE fixed-batch-dim device call — the chip sees large batches, callers
  see single-request latency plus at most ``batch_window_ms``.
* **Static compiled shapes**: waveforms pad to 0.5 s bucket boundaries and
  the batch dim is fixed at ``max_batch``, so steady-state serving reuses a
  handful of compiled programs (no recompiles in the request path after
  :meth:`IntentServer.warmup`).
* **Length-exact results**: batching/padding never changes an answer — the
  decode runs through the lengths-aware path (``Model.predict_intents
  lengths=``), which is bit-equal to running each request at its exact shape
  (tests/test_masking.py pins this).

HTTP surface (stdlib, zero dependencies): ``POST /decode`` with a WAV body ->
``{"intents": [...]}``; ``GET /healthz`` -> ``{"ok": true}``.
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import os
import queue
import threading
import time

import numpy as np

from tpu_slu.data.loader import pad_to_bucket

WAVE_BUCKET_QUANT = 8000  # 0.5 s at 16 kHz, matches the training loader


def load_trained_model(config):
    """Build a Model for dataset-free inference from a trained experiment.

    vocab.json (written by the Trainer at checkpoint time) replaces the
    reference's get_SLU_datasets side-effect requirement; native ``.npz``
    checkpoints are preferred, reference ``.pth`` supported.
    """
    from tpu_slu.data.datasets import get_SLU_datasets
    from tpu_slu.models.slu import Model

    vocab_path = os.path.join(config.folder, "training", "vocab.json")
    if os.path.isfile(vocab_path):
        with open(vocab_path) as f:
            Model.attach_vocab(config, json.load(f))
    else:
        get_SLU_datasets(config)
    model = Model(config, load_pretrained=False)
    npz = os.path.join(config.folder, "training", "model_state.npz")
    pth = os.path.join(config.folder, "training", "model_state.pth")
    if os.path.isfile(npz):
        model.load_native_checkpoint(npz)
    elif os.path.isfile(pth):
        model.load_torch_state_dict(pth)
    else:
        raise FileNotFoundError(f"no trained SLU checkpoint at {npz} or {pth}")
    return model


class IntentServer:
    """Queue + worker thread turning concurrent decode requests into batched
    device calls. Thread-safe; one device call in flight at a time."""

    def __init__(self, model, max_batch: int = 8, batch_window_ms: float = 5.0,
                 max_seconds: float = 16.0, fs: int = 16000):
        self.model = model
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1000.0
        self.max_samples = int(max_seconds * fs)
        self.fs = fs
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client API ---------------------------------------------------------

    def submit(self, wav: np.ndarray) -> cf.Future:
        """Enqueue a 1-D float32 waveform; resolves to the intent decode
        (list of slot strings, or the seq2seq string)."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        if wav.size == 0:
            raise ValueError("empty waveform")
        if wav.size > self.max_samples:
            raise ValueError(
                f"waveform of {wav.size} samples exceeds max_seconds "
                f"({self.max_samples} samples)"
            )
        fut: cf.Future = cf.Future()
        self._queue.put((wav, fut))
        return fut

    def decode(self, wav: np.ndarray):
        return self.submit(wav).result()

    def warmup(self, seconds=(1.0, 2.0, 4.0)):
        """Pre-compile the common bucket shapes so no request pays a compile."""
        for s in seconds:
            self.decode(np.zeros(int(s * self.fs), np.float32))

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # -- worker ---------------------------------------------------------------

    def _drain(self):
        """Block for one request, then gather up to max_batch within the
        batching window."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.time() + self.batch_window_s
        while len(items) < self.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            try:
                results = self._decode_batch([w for w, _ in items])
                for (_, fut), res in zip(items, results):
                    fut.set_result(res)
            except Exception as e:  # pragma: no cover - device failures
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)

    def _decode_batch(self, waves):
        """Pad to (max_batch, bucket) and run ONE length-exact device decode."""
        t_pad = pad_to_bucket(max(len(w) for w in waves), WAVE_BUCKET_QUANT)
        x = np.zeros((self.max_batch, t_pad), np.float32)
        lengths = np.zeros((self.max_batch,), np.int32)
        for i, w in enumerate(waves):
            x[i, : len(w)] = w
            lengths[i] = len(w)
        decoded = self.model.decode_intents(x, lengths=lengths)
        return decoded[: len(waves)]


def make_http_server(server: IntentServer, host: str = "127.0.0.1", port: int = 0):
    """Wrap an IntentServer in a stdlib ThreadingHTTPServer (POST /decode,
    GET /healthz). Returns the HTTPServer; call .serve_forever() (or
    .shutdown() from another thread)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from tpu_slu.data.audio import decode_wav_bytes

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/decode":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                wav, fs = decode_wav_bytes(self.rfile.read(n))
                if fs != server.fs:
                    raise ValueError(f"expected {server.fs} Hz audio, got {fs}")
                t0 = time.time()
                intents = server.decode(wav)
                self._reply(
                    200,
                    {
                        "intents": list(intents) if not isinstance(intents, str) else intents,
                        "ms": round((time.time() - t0) * 1000, 2),
                    },
                )
            except Exception as e:
                self._reply(400, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)
