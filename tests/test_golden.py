"""Golden decode gate: replay committed held-out decodes with NO training.

This is the repo's equivalent of the reference's canonical smoke test —
``test.wav`` must decode to ``{activate, lights, kitchen}`` against the
bundled trained checkpoint (reference ``README.md:37-42``). The reference's
``.pth`` is stripped from the mount, so the committed artifact under
``tests/assets/golden/`` (built by ``tools/make_golden.py``) plays its role:
a trained sinc-front-end checkpoint, its vocab, and six held-out wavs whose
exact decodes are pinned. The test exercises the full dataset-free
inference chain — ``read_config -> load_trained_model -> decode_intents`` —
the same recipe the reference documents for embedding the model
(reference ``README.md:26-41``).
"""

import json
import os
import shutil

import pytest

from tpu_slu import read_config
from tpu_slu.data.audio import read_wav
from tpu_slu.serving import load_trained_model

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets", "golden")


@pytest.fixture(scope="module")
def golden_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    folder = str(tmp / "exp")
    template = open(os.path.join(ASSETS, "experiment.cfg.template")).read()
    cfg_path = str(tmp / "exp.cfg")
    with open(cfg_path, "w") as f:
        f.write(template.replace("__GOLDEN_FOLDER__", folder))
    config = read_config(cfg_path)
    for name in ("model_state.npz", "vocab.json"):
        shutil.copyfile(
            os.path.join(ASSETS, name), os.path.join(folder, "training", name)
        )
    return load_trained_model(config)


def _expected():
    with open(os.path.join(ASSETS, "expected.json")) as f:
        return json.load(f)["expected"]


def test_golden_artifact_complete():
    names = set(os.listdir(ASSETS))
    for required in ("model_state.npz", "vocab.json", "expected.json",
                     "experiment.cfg.template"):
        assert required in names
    expected = _expected()
    assert len(expected) >= 6
    # at least 4 distinct intents pinned
    assert len({(e["action"], e["object"], e["location"]) for e in expected}) >= 4


@pytest.mark.parametrize("case", _expected(), ids=lambda c: c["wav"])
def test_golden_decode(golden_model, case):
    wav, fs = read_wav(os.path.join(ASSETS, case["wav"]))
    assert fs == 16000
    decoded = golden_model.decode_intents(wav[None, :])[0]
    assert list(decoded) == [case["action"], case["object"], case["location"]]
