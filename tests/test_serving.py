"""Micro-batching inference server (tpu_slu/serving.py)."""

import concurrent.futures as cf
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.models.slu import Model
from tpu_slu.serving import IntentServer, load_trained_model, make_http_server


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    path = fixtures.write_cfg(str(tmp / "c.cfg"), folder=str(tmp / "exp"))
    config = read_config(path)
    config.num_phonemes = 5
    config.values_per_slot = [2, 2, 2]
    config.Sy_intent = {"action": {"on": 0, "off": 1}, "object": {"a": 0, "b": 1},
                        "location": {"x": 0, "y": 1}}
    return Model(config)


def _waves(rng, lengths=(7200, 8000, 5111, 12000, 6400)):
    return [rng.standard_normal(t).astype(np.float32) * 0.1 for t in lengths]


def test_batched_results_equal_direct_decodes(model, rng):
    server = IntentServer(model, max_batch=4, batch_window_ms=20)
    try:
        waves = _waves(rng)
        futures = [server.submit(w) for w in waves]
        got = [f.result(timeout=120) for f in futures]
        for w, g in zip(waves, got):
            assert list(g) == list(model.decode_intents(w)[0])
    finally:
        server.close()


def test_oversize_and_empty_requests_rejected(model):
    server = IntentServer(model, max_seconds=1.0)
    try:
        with pytest.raises(ValueError):
            server.submit(np.zeros(20000, np.float32))  # > 1 s
        with pytest.raises(ValueError):
            server.submit(np.zeros(0, np.float32))
    finally:
        server.close()


def test_http_decode_and_healthz(model, rng, tmp_path):
    from tpu_slu.data.audio import write_wav

    server = IntentServer(model, max_batch=4, batch_window_ms=5)
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read()) == {"ok": True}

        wav = _waves(rng, (7200,))[0]
        # round-trip through 16-bit WAV encoding (what a client would POST)
        p = tmp_path / "req.wav"
        write_wav(str(p), wav, 16000)
        body = p.read_bytes()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/decode", data=body)
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        from tpu_slu.data.audio import read_wav

        expect = model.decode_intents(read_wav(str(p))[0])[0]
        assert payload["intents"] == list(expect)

        # malformed body -> 400 with an error message
        bad = urllib.request.Request(f"http://127.0.0.1:{port}/decode", data=b"nope")
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()
        server.close()


def test_load_trained_model_roundtrip(tmp_path, rng):
    """load_trained_model restores a checkpointed model + vocab dataset-free."""
    from tpu_slu.data.datasets import get_SLU_datasets
    from tpu_slu.training.trainer import Trainer

    root = fixtures.make_slu_dataset(str(tmp_path / "fsc"), n_train=16)
    cfg = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"),
                             slu_path=root)
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    train, _, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)
    trainer.save_checkpoint()

    config2 = read_config(cfg)
    served = load_trained_model(config2)
    wav = rng.standard_normal(8000).astype(np.float32) * 0.1
    assert list(served.decode_intents(wav)[0]) == list(model.decode_intents(wav)[0])
