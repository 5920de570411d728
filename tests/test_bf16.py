"""bfloat16 gate-stream mode: accuracy envelope + training integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import fixtures
from tpu_slu import ops, read_config
from tpu_slu.models import encoder as enc
from tpu_slu.models.encoder import EncoderArch, init_encoder_params
from tpu_slu.ops.pallas_gru import gru_apply_pallas


def test_bf16_gru_close_to_f32(rng):
    B, T, D, H = 4, 24, 12, 8
    x = rng.standard_normal((B, T, D), dtype=np.float32)
    params = ops.gru_init(jax.random.PRNGKey(0), D, H, bidirectional=True)
    ref = np.asarray(gru_apply_pallas(params, jnp.asarray(x)))
    got = np.asarray(gru_apply_pallas(params, jnp.asarray(x, jnp.bfloat16)))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(got.astype(np.float32), ref, rtol=0.1, atol=0.05)
    # correlation is the meaningful envelope for bf16
    c = np.corrcoef(got.astype(np.float32).ravel(), ref.ravel())[0, 1]
    assert c > 0.999


def test_bf16_grads_flow_f32_params(rng):
    B, T, D, H = 2, 16, 6, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(1), D, H, bidirectional=True)

    def loss(p):
        return jnp.sum(gru_apply_pallas(p, x.astype(jnp.bfloat16)).astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(grads):
        assert leaf.dtype == jnp.float32  # master weights keep f32 grads
        assert np.isfinite(np.asarray(leaf)).all()
    ref = jax.grad(lambda p: jnp.sum(gru_apply_pallas(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0.15, atol=0.05)


def test_bf16_encoder_close_to_f32(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("TPU_SLU_PALLAS_INTERPRET", "1")  # real kernels on CPU
    path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"))
    config = read_config(path)
    config.num_phonemes = 5
    arch = EncoderArch.from_config(config)
    params = init_encoder_params(jax.random.PRNGKey(0), arch)
    x = jnp.asarray(rng.standard_normal((2, 8000), dtype=np.float32))
    ref = np.asarray(enc.encoder_features(params, arch, x))
    got = np.asarray(
        enc.encoder_features(params, arch, x, gru_impl="pallas",
                             compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    c = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert c > 0.995, c


def test_bf16_training_cfg(tmp_path):
    slu_root = fixtures.make_slu_dataset(str(tmp_path / "fsc"), n_train=16)
    cfg = fixtures.write_cfg(
        str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root,
        extra="compute_dtype=bfloat16\n",
    )
    config = read_config(cfg)
    assert config.compute_dtype == "bfloat16"
    fixtures.write_phonemes_txt(config.folder)
    from tpu_slu.data.datasets import get_SLU_datasets
    from tpu_slu.models import Model
    from tpu_slu.training.trainer import Trainer

    train, _, _ = get_SLU_datasets(config)
    model = Model(config)
    trainer = Trainer(model, config)
    acc, loss = trainer.train(train)
    assert np.isfinite(loss)


def test_bf16_unidirectional_grads(rng):
    """Unidirectional path: bf16 gate-stream cotangents match the primal
    dtype (regression for the custom-VJP dtype contract)."""
    B, T, D, H = 2, 12, 6, 8
    x = jnp.asarray(rng.standard_normal((B, T, D), dtype=np.float32))
    params = ops.gru_init(jax.random.PRNGKey(7), D, H, bidirectional=False)

    def loss(p):
        out = gru_apply_pallas(p, x.astype(jnp.bfloat16))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(params)
    ref = jax.grad(lambda p: jnp.sum(gru_apply_pallas(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(grads)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0.15, atol=0.05)
