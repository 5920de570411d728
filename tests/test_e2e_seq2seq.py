"""End-to-end seq2seq SLU training on synthetic data + augmentation path."""

import numpy as np
import pytest

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.data.datasets import _augment_wave, get_SLU_datasets
from tpu_slu.models import Model
from tpu_slu.training.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def slu_root(tmp_path_factory):
    return fixtures.make_slu_dataset(str(tmp_path_factory.mktemp("fsc_s2s")), n_train=32)


def test_seq2seq_training_loop_and_decode_eval(tmp_path, slu_root):
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root,
        seq2seq=True,
    )
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    config.seq2seq_max_decode_len = 16  # synthetic semantics are 6 chars
    train, valid, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)

    losses = []
    for _ in range(3):
        acc, loss = trainer.train(train)
        losses.append(loss)
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], f"teacher-forced loss did not decrease: {losses}"

    # epoch > 1 triggers the beam-decode string-match eval path
    # (reference training.py:158-165)
    vacc, vloss = trainer.test(valid)
    assert np.isfinite(vloss)
    assert 0.0 <= vacc <= 1.0

    # decode returns plausible strings over the char vocab
    wav_path = slu_root + "/" + train.df.loc[0].path
    from tpu_slu.data.audio import read_wav

    wav, _ = read_wav(wav_path)
    out = model.decode_intents(wav[None, :])
    assert isinstance(out[0], str)


def test_decode_acc_from_epoch_flag(tmp_path, slu_root, capsys):
    """decode_acc_from_epoch=1 logs decoded accuracy from the FIRST eval
    (default 2 = reference parity: intent_acc rows are 0.0 until epoch 2)."""
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root,
        seq2seq=True, extra="decode_acc_from_epoch=1\n",
    )
    config = read_config(cfg)
    assert config.decode_acc_from_epoch == 1
    fixtures.write_phonemes_txt(config.folder)
    config.seq2seq_max_decode_len = 16
    train, valid, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)
    trainer.train(train)  # epoch -> 1
    capsys.readouterr()
    trainer.test(valid)
    assert "decoding batch" in capsys.readouterr().out

    # default gate: no decode at epoch 1
    config.decode_acc_from_epoch = 2
    trainer2 = Trainer(model, config)
    trainer2.epoch = 1
    capsys.readouterr()
    trainer2.test(valid)
    assert "decoding batch" not in capsys.readouterr().out


def test_augment_wave_properties(rng):
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)
    y = _augment_wave(x, rng)
    assert y.dtype == np.float32
    # speed perturbation in [0.9, 1.1] changes length accordingly
    assert 0.85 * len(x) <= len(y) <= 1.15 * len(x)
    assert np.isfinite(y).all()
    assert not np.array_equal(y[: len(x)], x)


def test_augment_enabled_dataset(tmp_path, slu_root):
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root,
        extra="augment=True\n",
    )
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    assert config.augment is True
    train, valid, _ = get_SLU_datasets(config)
    assert train.augment is True
    assert valid.augment is False  # eval splits never augment
    x1, _ = train[0]
    x2, _ = train[0]
    assert len(x1) != len(x2) or not np.array_equal(x1, x2)  # random each draw
    batch = next(iter(train.loader))
    assert np.isfinite(batch["x"]).all()
