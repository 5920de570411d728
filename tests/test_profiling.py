"""Profiling hooks: StepTimer summaries and trace emission in training."""

import glob
import os

import numpy as np
import pytest

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.data.datasets import get_SLU_datasets
from tpu_slu.models import Model
from tpu_slu.training.trainer import Trainer
from tpu_slu.utils.profiling import StepTimer, profile_trace

pytestmark = pytest.mark.slow


def test_step_timer_summary():
    import time

    t = StepTimer()
    for _ in range(5):
        with t.step():
            time.sleep(0.002)
    s = t.summary()
    assert s["steps"] == 5
    assert s["step_ms_p50"] >= 1.0
    assert s["step_ms_p99"] >= s["step_ms_p50"]


def test_profile_trace_noop_without_dir():
    with profile_trace(None):
        pass  # must not require jax.profiler


def test_training_emits_trace_and_step_times(tmp_path):
    slu_root = fixtures.make_slu_dataset(str(tmp_path / "fsc"), n_train=16)
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root
    )
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    config.profile_dir = str(tmp_path / "trace")
    train, _, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)
    trainer.train(train)
    # trace files written
    assert glob.glob(os.path.join(config.profile_dir, "**", "*.pb*"), recursive=True) or \
        glob.glob(os.path.join(config.profile_dir, "**", "*trace*"), recursive=True)
    # log.csv has the timer columns
    log = open(os.path.join(config.folder, "training", "log.csv")).readline()
    assert "step_ms_p50" in log and "examples_per_sec" in log
