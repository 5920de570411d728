"""Trainer data-parallel integration on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.data.datasets import get_SLU_datasets
from tpu_slu.models import Model
from tpu_slu.training.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def slu_root(tmp_path_factory):
    return fixtures.make_slu_dataset(str(tmp_path_factory.mktemp("fsc_dp")), n_train=32)


def _config(tmp_path, slu_root):
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root
    )
    config = read_config(cfg)
    fixtures.write_phonemes_txt(config.folder)
    return config


def test_trainer_uses_mesh_when_divisible(tmp_path, slu_root):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    config = _config(tmp_path, slu_root)
    train, valid, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)  # batch 8 over 8 devices
    assert trainer.mesh is not None
    acc, loss = trainer.train(train)
    assert np.isfinite(loss)
    # params remain fully replicated jax.Arrays after the step
    leaf = jax.tree.leaves(model.params)[0]
    assert len(leaf.sharding.device_set) == 8
    vacc, vloss = trainer.test(valid)
    assert np.isfinite(vloss)


def test_trainer_falls_back_on_indivisible_batch(tmp_path, slu_root):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    config = _config(tmp_path, slu_root)
    config.training_batch_size = 6  # not divisible by 8
    train, _, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)
    assert trainer.mesh is None
    acc, loss = trainer.train(train)
    assert np.isfinite(loss)


def test_dp_training_matches_single_device(tmp_path, slu_root):
    """Same seed, same data order: DP and single-device runs agree closely."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    losses = {}
    for dp in (False, True):
        sub = tmp_path / ("dp" if dp else "sp")
        sub.mkdir()
        config = _config(sub, slu_root)
        config.data_parallel = dp
        np.random.seed(0)
        train, _, _ = get_SLU_datasets(config)
        model = Model(config)
        trainer = Trainer(model, config)
        assert (trainer.mesh is not None) == dp
        _, loss = trainer.train(train)
        losses[dp] = loss
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)
