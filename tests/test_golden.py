"""Golden decode gates: replay committed held-out decodes with NO training.

These are the repo's equivalent of the reference's canonical smoke test —
``test.wav`` must decode to ``{activate, lights, kitchen}`` against the
bundled trained checkpoint (reference ``README.md:37-42``). The reference's
``.pth`` is stripped from the mount, so committed artifacts under
``tests/assets/golden*/`` (built by ``tools/make_golden.py``) play its
role: trained checkpoints (fixed-slot head AND seq2seq beam-decode head),
their vocabs, and held-out wavs whose exact decodes are pinned. The tests
exercise the full dataset-free inference chain — ``read_config ->
load_trained_model -> decode_intents`` — the same recipe the reference
documents for embedding the model (reference ``README.md:26-41``).
"""

import json
import os
import shutil

import pytest

from tpu_slu import read_config
from tpu_slu.data.audio import read_wav
from tpu_slu.serving import load_trained_model

_HERE = os.path.dirname(os.path.abspath(__file__))
ASSETS = {
    "slots": os.path.join(_HERE, "assets", "golden"),
    "seq2seq": os.path.join(_HERE, "assets", "golden_seq2seq"),
}


def _meta(kind):
    with open(os.path.join(ASSETS[kind], "expected.json")) as f:
        return json.load(f)


def _load(kind, tmp_path_factory):
    assets = ASSETS[kind]
    tmp = tmp_path_factory.mktemp(f"golden_{kind}")
    folder = str(tmp / "exp")
    template = open(os.path.join(assets, "experiment.cfg.template")).read()
    cfg_path = str(tmp / "exp.cfg")
    with open(cfg_path, "w") as f:
        f.write(template.replace("__GOLDEN_FOLDER__", folder))
    config = read_config(cfg_path)
    meta = _meta(kind)
    if "max_decode_len" in meta:
        config.seq2seq_max_decode_len = meta["max_decode_len"]
    for name in ("model_state.npz", "vocab.json"):
        shutil.copyfile(os.path.join(assets, name),
                        os.path.join(folder, "training", name))
    return load_trained_model(config)


@pytest.fixture(scope="module")
def slots_model(tmp_path_factory):
    return _load("slots", tmp_path_factory)


@pytest.fixture(scope="module")
def seq2seq_model(tmp_path_factory):
    return _load("seq2seq", tmp_path_factory)


@pytest.mark.parametrize("kind", sorted(ASSETS))
def test_golden_artifact_complete(kind):
    names = set(os.listdir(ASSETS[kind]))
    for required in ("model_state.npz", "vocab.json", "expected.json",
                     "experiment.cfg.template"):
        assert required in names
    expected = _meta(kind)["expected"]
    assert len(expected) >= 6
    if kind == "slots":
        distinct = {(e["action"], e["object"], e["location"]) for e in expected}
    else:
        distinct = {e["semantics"] for e in expected}
    assert len(distinct) >= 4  # gate spans at least 4 distinct intents


@pytest.mark.parametrize("case", _meta("slots")["expected"], ids=lambda c: c["wav"])
def test_golden_decode_slots(slots_model, case):
    wav, fs = read_wav(os.path.join(ASSETS["slots"], case["wav"]))
    assert fs == 16000
    decoded = slots_model.decode_intents(wav[None, :])[0]
    assert list(decoded) == [case["action"], case["object"], case["location"]]


@pytest.mark.parametrize("case", _meta("seq2seq")["expected"], ids=lambda c: c["wav"])
def test_golden_decode_seq2seq(seq2seq_model, case):
    wav, fs = read_wav(os.path.join(ASSETS["seq2seq"], case["wav"]))
    assert fs == 16000
    decoded = seq2seq_model.decode_intents(wav[None, :])[0]
    assert isinstance(decoded, str)
    assert decoded == case["semantics"]
