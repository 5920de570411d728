"""Hermetic end-to-end pipelines on synthetic data (SURVEY.md §4 strategy).

The synthetic SLU task is tone-coded (see fixtures.py), so a few epochs of
training must reach high intent accuracy — a real learning-signal check, not
just a smoke test. Covers: SLU training + eval + decode, checkpoint resume,
ASR pre-training -> SLU transfer with frozen encoder + unfreezing, and the
CLI driver.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.data.datasets import get_ASR_datasets, get_SLU_datasets
from tpu_slu.models import Model, PretrainedModel
from tpu_slu.training.trainer import Trainer

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def slu_root(tmp_path_factory):
    return fixtures.make_slu_dataset(str(tmp_path_factory.mktemp("fsc")))


@pytest.fixture(scope="module")
def asr_root(tmp_path_factory):
    return fixtures.make_asr_dataset(str(tmp_path_factory.mktemp("libri")))


def _slu_config(tmp_path, slu_root, **kw):
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root, **kw
    )
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    return config


class TestSLUTraining:
    def test_learns_tone_coded_intents(self, tmp_path, slu_root):
        # Conv front-end + lr 0.01 + clipping: stable learning in few epochs
        # (sinc cutoff params need the reference's gentler lr; covered by the
        # smoke test below).
        config = _slu_config(
            tmp_path, slu_root, use_sincnet=False,
            replace={"training_lr=0.003": "training_lr=0.01"},
            extra="gradient_clip_norm=1.0\n",
        )
        train, valid, test = get_SLU_datasets(config)
        model = Model(config)
        trainer = Trainer(model, config)

        accs, losses = [], []
        for _ in range(12):
            acc, loss = trainer.train(train)
            accs.append(acc)
            losses.append(loss)
        valid_acc, valid_loss = trainer.test(valid)
        # Random baseline: acc 1/8 = 0.125, loss 3*ln(2) = 2.08.
        tail_acc = float(np.mean(accs[-3:]))
        assert tail_acc > 0.4, f"train accs {accs}"
        assert losses[-1] < 1.2, f"train losses {losses}"
        assert valid_acc > 0.3, f"valid acc {valid_acc}"

        # decode_intents end to end
        wav, _ = __import__("tpu_slu.data.audio", fromlist=["read_wav"]).read_wav(
            os.path.join(slu_root, train.df.loc[0].path)
        )
        intents = model.decode_intents(wav[None, :])
        assert intents[0][0] in ("activate", "deactivate")

        # log.csv written with reference columns
        log = os.path.join(config.folder, "training", "log.csv")
        assert os.path.isfile(log)
        header = open(log).readline()
        for col in ("intent_loss", "intent_acc", "set"):
            assert col in header

    def test_checkpoint_resume(self, tmp_path, slu_root):
        config = _slu_config(tmp_path, slu_root)
        train, valid, _ = get_SLU_datasets(config)
        model = Model(config)
        trainer = Trainer(model, config)
        trainer.train(train)
        trainer.save_checkpoint()
        ref_params = model.params

        model2 = Model(config)
        trainer2 = Trainer(model2, config)
        trainer2.load_checkpoint()
        assert trainer2.epoch == 1
        import jax

        for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(model2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_checkpoint_starts_from_scratch(self, tmp_path, slu_root, capsys):
        config = _slu_config(tmp_path, slu_root)
        get_SLU_datasets(config)
        model = Model(config)
        trainer = Trainer(model, config)
        trainer.load_checkpoint()
        assert "No previous model" in capsys.readouterr().out


class TestPretrainTransfer:
    def test_pretrain_then_slu_with_unfreezing(self, tmp_path, slu_root, asr_root):
        config = _slu_config(
            tmp_path, slu_root, asr_path=asr_root, pretraining_type=2, unfreezing_type=1
        )
        # Phase 1: ASR pre-training
        # remove the fixture phonemes.txt so the vocab is built from dev split
        os.remove(os.path.join(config.folder, "pretraining", "phonemes.txt"))
        asr_train, asr_valid, _ = get_ASR_datasets(config)
        pre = PretrainedModel(config)
        pre_trainer = Trainer(pre, config)
        pa0 = pre_trainer.train(asr_train)[0]
        pre_trainer.test(asr_valid)
        pre_trainer.save_checkpoint()
        assert os.path.isfile(os.path.join(config.folder, "pretraining", "model_state.npz"))

        # Phase 2: SLU training restores the encoder and freezes it
        slu_train, slu_valid, _ = get_SLU_datasets(config)
        model = Model(config)
        import jax

        for a, b in zip(
            jax.tree.leaves(pre.params), jax.tree.leaves(model.params["pretrained_model"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        trainer = Trainer(model, config)
        mask0 = model.trainable_mask()
        assert all(
            v == 0.0
            for v in jax.tree.leaves(mask0["pretrained_model"]["word_layers"])
        )
        frozen_snapshot = jax.tree.leaves(model.params["pretrained_model"]["word_layers"])
        frozen_snapshot = [np.asarray(x).copy() for x in frozen_snapshot]
        trainer.train(slu_train)
        # frozen word layers unchanged after epoch 1
        for before, after in zip(
            frozen_snapshot, jax.tree.leaves(model.params["pretrained_model"]["word_layers"])
        ):
            np.testing.assert_array_equal(before, np.asarray(after))
        # epoch 2 trains with last word GRU unfrozen
        trainer.train(slu_train)
        changed = any(
            not np.array_equal(b, np.asarray(a))
            for b, a in zip(
                frozen_snapshot,
                jax.tree.leaves(model.params["pretrained_model"]["word_layers"]),
            )
        )
        assert changed, "unfreezing schedule did not update any word-layer params"


class TestCLI:
    def test_decode_cli(self, tmp_path, slu_root):
        """Train 1 epoch via API, then `main.py --decode --wav=...` decodes
        without touching the dataset (vocab.json path)."""
        config = _slu_config(tmp_path, slu_root)
        train, _, _ = get_SLU_datasets(config)
        model = Model(config)
        trainer = Trainer(model, config)
        trainer.train(train)
        trainer.save_checkpoint()
        assert os.path.isfile(os.path.join(config.folder, "training", "vocab.json"))

        wav = os.path.join(slu_root, train.df.loc[0].path)
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"), "--decode",
             f"--config_path={tmp_path / 'exp.cfg'}", f"--wav={wav}"],
            capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "activate" in proc.stdout or "deactivate" in proc.stdout

    def test_console_script_target(self):
        """The packaged `tpu-slu` entry point and the repo-root main.py shim
        resolve to the same driver (pyproject [project.scripts])."""
        import importlib.util

        from tpu_slu.cli import main as cli_main

        spec = importlib.util.spec_from_file_location(
            "main_shim", os.path.join(REPO, "main.py")
        )
        shim = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(shim)
        assert shim.main is cli_main

    def test_main_pretrain_smoke(self, tmp_path, asr_root):
        folder = str(tmp_path / "exp")
        cfg = fixtures.write_cfg(
            str(tmp_path / "exp.cfg"), folder=folder, asr_path=asr_root,
            pretraining_type=2,
            replace={"pretraining_num_epochs=2": "pretraining_num_epochs=1"},
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"), "--pretrain",
             f"--config_path={cfg}"],
            capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "*phonemes*" in proc.stdout and "*words*" in proc.stdout
        assert os.path.isfile(os.path.join(folder, "pretraining", "model_state.npz"))
        assert os.path.isfile(os.path.join(folder, "pretraining", "phonemes.txt"))

    def test_main_train_smoke(self, tmp_path, slu_root):
        folder = str(tmp_path / "exp")
        cfg = fixtures.write_cfg(
            str(tmp_path / "exp.cfg"), folder=folder, slu_path=slu_root,
        )
        # tiny run: 1 epoch
        text = open(cfg).read().replace("training_num_epochs=4", "training_num_epochs=1")
        open(cfg, "w").write(text)
        os.makedirs(os.path.join(folder, "pretraining"), exist_ok=True)
        fixtures.write_phonemes_txt(folder)
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"), "--train", f"--config_path={cfg}"],
            capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "Test results" in proc.stdout
        assert os.path.isfile(os.path.join(folder, "training", "model_state.npz"))
        assert os.path.isfile(os.path.join(folder, "training", "log.csv"))
