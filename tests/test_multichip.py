"""Multi-device sharding tests on the 8-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import __graft_entry__
from tpu_slu.models import encoder as enc
from tpu_slu.models import slu as slu_mod
from tpu_slu.models.slu import Model
from tpu_slu.parallel.mesh import make_mesh, param_shardings, shard_batch

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def need_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    __graft_entry__.dryrun_multichip(5)  # falls back to pure DP


def test_entry_compiles_small():
    """entry() returns a jittable fn; compile-check its small sibling here
    (the flagship topology is compile-checked by the driver on TPU)."""
    import tempfile

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=True)
    model = Model(config)
    earch, iarch = model.encoder_arch, model.intent_arch

    def fn(params, x, y):
        feats = enc.encoder_features(params["pretrained_model"], earch, x)
        logits = slu_mod.intent_logits(params["intent_layers"], iarch, feats)
        return slu_mod.intent_loss_acc(logits, y, iarch.values_per_slot)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8000), dtype=np.float32))
    y = jnp.asarray(
        np.stack([rng.integers(0, n, 2) for n in iarch.values_per_slot], 1).astype(np.int32)
    )
    loss, acc = jax.jit(fn)(model.params, x, y)
    assert np.isfinite(float(loss))


def test_dp_matches_single_device():
    """Data-parallel loss/grad == single-device loss/grad on the same batch."""
    import tempfile

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=True)
    model = Model(config)
    earch, iarch = model.encoder_arch, model.intent_arch

    rng = np.random.default_rng(1)
    batch = {
        "x": rng.standard_normal((8, 8000)).astype(np.float32),
        "y_intent": np.stack(
            [rng.integers(0, n, 8) for n in iarch.values_per_slot], 1
        ).astype(np.int32),
        "w": np.ones((8,), np.float32),
    }

    def loss_fn(p, b):
        feats = enc.encoder_features(p["pretrained_model"], earch, b["x"])
        logits = slu_mod.intent_logits(p["intent_layers"], iarch, feats)
        return slu_mod.intent_loss_acc(logits, b["y_intent"], iarch.values_per_slot, b["w"])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (loss_1dev, _), grads_1dev = grad_fn(model.params, batch)

    mesh = make_mesh(8, model_parallel=1)
    with mesh:
        p_shard = param_shardings(mesh, model.params)
        params_sharded = jax.device_put(model.params, p_shard)
        batch_sharded = shard_batch(batch, mesh)
        (loss_dp, _), grads_dp = grad_fn(params_sharded, batch_sharded)

    np.testing.assert_allclose(float(loss_dp), float(loss_1dev), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_1dev), jax.tree.leaves(grads_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_vocab_head_model_sharding():
    """word_linear shards over the model axis and posteriors still match."""
    import tempfile

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=True)
    from tpu_slu.models.encoder import EncoderArch, init_encoder_params

    arch = EncoderArch.from_config(config)
    params = init_encoder_params(jax.random.PRNGKey(0), arch)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 8000)).astype(np.float32)
    ref_ph, ref_wd = jax.jit(lambda p, x: enc.encoder_posteriors(p, arch, x))(params, x)

    mesh = make_mesh(8, model_parallel=2)
    with mesh:
        p_shard = param_shardings(mesh, params)
        w_sharding = p_shard["word_linear"]["w"]
        assert w_sharding.spec == jax.sharding.PartitionSpec(None, "model")
        params_sharded = jax.device_put(params, p_shard)
        ph, wd = jax.jit(lambda p, x: enc.encoder_posteriors(p, arch, x))(
            params_sharded, jnp.asarray(x)
        )
    np.testing.assert_allclose(np.asarray(wd), np.asarray(ref_wd), rtol=1e-4, atol=1e-5)


def test_dp_inference_matches_single_device():
    """make_dp_infer: the batch-sharded decode path reproduces single-device
    predictions exactly (SPMD inference over the data axis)."""
    import tempfile

    from tpu_slu.parallel.mesh import make_dp_infer

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=True)
    model = Model(config)
    earch, iarch = model.encoder_arch, model.intent_arch

    def infer(params, x):
        feats = enc.encoder_features(params["pretrained_model"], earch, x)
        logits = slu_mod.intent_logits(params["intent_layers"], iarch, feats)
        return slu_mod.intent_predictions(logits, iarch.values_per_slot)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((16, 8000), dtype=np.float32))
    ref = jax.jit(infer)(model.params, x)

    mesh = make_mesh(8)
    with mesh:
        dp_infer = make_dp_infer(infer, mesh, model.params, x)
        params_sharded = jax.device_put(
            model.params, param_shardings(mesh, model.params, shard_vocab_heads=False)
        )
        got = dp_infer(params_sharded, shard_batch(x, mesh))
        # per-example outputs stay batch-sharded until the host reads them
        assert len(got.sharding.device_set) == 8

    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
