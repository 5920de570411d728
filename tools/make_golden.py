"""Train and commit the golden decode-gate artifact (tests/assets/golden/).

The reference's canonical smoke test decodes ``test.wav`` to
``{activate, lights, kitchen}`` against a bundled trained checkpoint
(reference ``README.md:37-42``); that checkpoint is stripped from this
mount (``.MISSING_LARGE_BLOBS``), so the gate cannot be replayed verbatim.
This script gives the repo its OWN equivalent gate: it trains a small
sinc-front-end model on the tone-coded synthetic task (tests/fixtures.py),
verifies held-out decodes, and commits the trained checkpoint + vocab +
wavs + expected intents so ``tests/test_golden.py`` can replay the full
dataset-free inference path (read_config -> load_trained_model ->
decode_intents) in seconds, with NO training step — the exact shape of the
reference's README recipe (reference ``README.md:26-41``).

Run: ``python tools/make_golden.py`` (CPU, a few minutes). Deterministic
given the fixture seeds; re-run only to regenerate the artifact.
"""

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.data.audio import read_wav
from tpu_slu.data.datasets import get_SLU_datasets
from tpu_slu.models import Model
from tpu_slu.training.trainer import Trainer

ASSETS = os.path.join(REPO, "tests", "assets", "golden")
FOLDER_PLACEHOLDER = "__GOLDEN_FOLDER__"
N_GOLDEN_WAVS = 6
TARGET_VALID_ACC = 0.97
MAX_EPOCHS = 60


def main():
    work = tempfile.mkdtemp(prefix="golden_")
    slu_root = fixtures.make_slu_dataset(
        os.path.join(work, "fsc"), n_train=192, n_valid=32, n_test=32, seed=3
    )
    cfg_path = fixtures.write_cfg(
        os.path.join(work, "exp.cfg"),
        folder=os.path.join(work, "exp"),
        slu_path=slu_root,
        extra="gradient_clip_norm=1.0\n",
    )
    config = read_config(cfg_path)
    fixtures.write_phonemes_txt(config.folder)
    train, valid, test = get_SLU_datasets(config)

    model = Model(config)
    trainer = Trainer(model, config)
    valid_acc = 0.0
    for epoch in range(MAX_EPOCHS):
        train_acc, train_loss = trainer.train(train)
        valid_acc, _ = trainer.test(valid)
        print(f"epoch {epoch + 1}: train acc {train_acc:.3f} "
              f"loss {train_loss:.3f} valid acc {valid_acc:.3f}")
        if valid_acc >= TARGET_VALID_ACC and train_acc >= TARGET_VALID_ACC:
            break
    if valid_acc < TARGET_VALID_ACC:
        raise SystemExit(f"did not converge: valid acc {valid_acc}")
    trainer.save_checkpoint()

    # Select held-out test wavs the trained model decodes exactly, spanning
    # as many distinct intents as possible.
    chosen, seen_intents = [], set()
    for _, row in test.df.iterrows():
        truth = [row["action"], row["object"], row["location"]]
        wav, _ = read_wav(os.path.join(slu_root, row["path"]))
        decoded = list(model.decode_intents(wav[None, :])[0])
        if decoded != truth:
            print(f"skip {row['path']}: decoded {decoded} != {truth}")
            continue
        key = tuple(truth)
        if key in seen_intents and len(seen_intents) < 4:
            continue
        seen_intents.add(key)
        chosen.append((os.path.join(slu_root, row["path"]), truth))
        if len(chosen) == N_GOLDEN_WAVS:
            break
    if len(chosen) < N_GOLDEN_WAVS:
        raise SystemExit(f"only {len(chosen)} clean golden decodes; need {N_GOLDEN_WAVS}")

    # Commit the artifact.
    shutil.rmtree(ASSETS, ignore_errors=True)
    os.makedirs(ASSETS)
    tdir = os.path.join(config.folder, "training")
    shutil.copyfile(os.path.join(tdir, "model_state.npz"),
                    os.path.join(ASSETS, "model_state.npz"))
    shutil.copyfile(os.path.join(tdir, "vocab.json"),
                    os.path.join(ASSETS, "vocab.json"))
    expected = []
    for i, (src, truth) in enumerate(chosen):
        name = f"golden_{i}.wav"
        shutil.copyfile(src, os.path.join(ASSETS, name))
        expected.append({"wav": name, "action": truth[0],
                         "object": truth[1], "location": truth[2]})
    with open(os.path.join(ASSETS, "expected.json"), "w") as f:
        json.dump({"valid_acc": round(float(valid_acc), 4),
                   "expected": expected}, f, indent=1)
    # cfg template: same topology, folder/slu_path rebound at test time
    # (slu_path is unused by the dataset-free decode path).
    cfg_text = open(cfg_path).read()
    cfg_text = cfg_text.replace(os.path.join(work, "exp"), FOLDER_PLACEHOLDER)
    cfg_text = cfg_text.replace(slu_root, "")
    with open(os.path.join(ASSETS, "experiment.cfg.template"), "w") as f:
        f.write(cfg_text)
    with open(os.path.join(ASSETS, "README.md"), "w") as f:
        f.write(
            "# Golden decode gate\n\n"
            "Trained checkpoint + held-out wavs + expected intent decodes for\n"
            "`tests/test_golden.py` — this repo's equivalent of the reference's\n"
            "`test.wav -> {activate, lights, kitchen}` smoke test (reference\n"
            "README.md:37-42), whose bundled `.pth` is stripped from the mount.\n"
            "Regenerate with `python tools/make_golden.py`.\n\n"
            f"Validation accuracy at commit time: {valid_acc:.4f}.\n"
        )
    total = sum(os.path.getsize(os.path.join(ASSETS, p)) for p in os.listdir(ASSETS))
    print(f"wrote {ASSETS} ({total / 1024:.0f} KiB, valid acc {valid_acc:.4f})")


if __name__ == "__main__":
    main()
