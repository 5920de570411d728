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


def test_asr_model_parallel_matches_dp(tmp_path):
    """ASR training with model_parallel=2 (vocab heads column-sharded over
    the model axis) reproduces the pure-DP loss trajectory.

    Drives the Trainer's real jitted train step on fixed batches (the ASR
    dataset's random crop is drawn from a thread-shared rng, so full-epoch
    trajectories are not run-to-run deterministic), then runs a full epoch
    for integration.
    """
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import PartitionSpec as P

    from tpu_slu.data.datasets import get_ASR_datasets
    from tpu_slu.models.encoder import PretrainedModel

    asr_root = fixtures.make_asr_dataset(str(tmp_path / "libri"))
    rng = np.random.default_rng(0)
    batches = None
    trajs = {}
    for mp in (1, 2):
        sub = tmp_path / f"mp{mp}"
        sub.mkdir()
        cfg = fixtures.write_cfg(
            str(sub / "exp.cfg"), folder=str(sub / "exp"), asr_path=asr_root,
            pretraining_type=2, extra="model_parallel=%d\n" % mp,
        )
        config = read_config(cfg)
        np.random.seed(0)
        train, valid, _ = get_ASR_datasets(config)
        model = PretrainedModel(config)
        trainer = Trainer(model, config)
        assert trainer.model_parallel == mp
        if mp == 2:
            assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
            w = model.params["word_linear"]["w"]
            assert w.sharding.spec == P(None, "model"), w.sharding
        if batches is None:
            n_phone = -(-8000 // config.phone_downsample_factor)
            n_word = -(-8000 // config.word_downsample_factor)
            batches = [
                {
                    "x": rng.standard_normal((8, 8000)).astype(np.float32),
                    "y_phoneme": rng.integers(-1, config.num_phonemes, (8, n_phone)).astype(np.int32),
                    "y_word": rng.integers(-1, config.vocabulary_size, (8, n_word)).astype(np.int32),
                    "w": np.ones((8,), np.float32),
                    "len": np.full((8,), 8000, np.int32),
                }
                for _ in range(3)
            ]
        traj = []
        carry = trainer._params_carry()  # flat vector (mp=1) or tree (mp=2)
        for k, batch in enumerate(batches):
            carry, trainer.opt_state, aux = trainer._train_step(
                carry, trainer.opt_state, np.int32(k),
                trainer._place_batch(batch),
            )
            traj.append(float(aux[0]) + float(aux[1]))
        trainer._set_params_carry(carry)
        trajs[mp] = traj
        if mp == 2:
            # params keep their model sharding through the donated step
            assert model.params["word_linear"]["w"].sharding.spec == P(None, "model")
            _, loss, _, _ = trainer.train(train)
            assert np.isfinite(loss)
            results = trainer.test(valid)
            assert np.isfinite(results[1])
    np.testing.assert_allclose(trajs[2], trajs[1], rtol=1e-4)


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
