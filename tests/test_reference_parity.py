"""Activation parity against the ACTUAL reference implementation.

Imports the mounted reference code (read-only, torch-CPU) and compares its
forward activations against ours on identical weights — the real checkpoint
-import contract: a user's ``model_state.pth`` must reproduce predictions.

Skipped when /root/reference is not mounted. The reference's ``models.py``
only needs torch/numpy; ``data.py`` (which needs torchaudio) is not imported.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.models import encoder as enc
from tpu_slu.models import slu as slu_mod
from tpu_slu.models.encoder import EncoderArch, init_encoder_params
from tpu_slu.models.torch_import import export_pretrained_state_dict

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE, "models.py")),
    reason="reference repo not mounted",
)


@pytest.fixture(scope="module")
def ref_models():
    sys.path.insert(0, REFERENCE)
    try:
        import models as reference_models

        yield reference_models
    finally:
        sys.path.remove(REFERENCE)


@pytest.fixture
def config(tmp_path):
    path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"))
    config = read_config(path)
    config.num_phonemes = 5
    config.values_per_slot = [2, 2, 2]
    config.Sy_intent = {"action": {"x": 0, "y": 1}, "object": {"x": 0, "y": 1},
                        "location": {"x": 0, "y": 1}}
    return config


class TestAgainstReferenceImplementation:
    def test_encoder_features_parity(self, ref_models, config, rng):
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(0), arch)
        state = export_pretrained_state_dict(params, arch)

        ref_model = ref_models.PretrainedModel(config)
        ref_model.load_state_dict(state)
        ref_model.eval()

        x = rng.standard_normal((2, 12000), dtype=np.float32)
        with torch.no_grad():
            ref_feats = ref_model.compute_features(torch.from_numpy(x)).numpy()
        got = np.asarray(enc.encoder_features(params, arch, jnp.asarray(x)))
        assert got.shape == ref_feats.shape
        np.testing.assert_allclose(got, ref_feats, rtol=1e-4, atol=2e-5)

    def test_encoder_posteriors_parity(self, ref_models, config, rng):
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(1), arch)
        state = export_pretrained_state_dict(params, arch)
        ref_model = ref_models.PretrainedModel(config)
        ref_model.load_state_dict(state)
        ref_model.eval()

        x = rng.standard_normal((2, 8000), dtype=np.float32)
        with torch.no_grad():
            ref_ph, ref_wd = ref_model.compute_posteriors(torch.from_numpy(x))
        ph, wd = enc.encoder_posteriors(params, arch, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ph), ref_ph.numpy(), rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(wd), ref_wd.numpy(), rtol=1e-4, atol=2e-5)

    def test_full_model_predictions_parity(self, ref_models, config, rng):
        """Our Model and the reference Model agree on intent predictions and
        logits when loaded from the same state_dict."""
        ours = slu_mod.Model(config)
        # Export our params as a full-model state_dict for the reference
        state = export_pretrained_state_dict(
            ours.params["pretrained_model"], ours.encoder_arch, prefix="pretrained_model."
        )
        gru_p = ours.params["intent_layers"]["0"]
        for key, sfx in (("fwd", ""), ("bwd", "_reverse")):
            state[f"intent_layers.0.weight_ih_l0{sfx}"] = torch.from_numpy(
                np.asarray(gru_p[key]["w_ih"]).T.copy())
            state[f"intent_layers.0.weight_hh_l0{sfx}"] = torch.from_numpy(
                np.asarray(gru_p[key]["w_hh"]).T.copy())
            state[f"intent_layers.0.bias_ih_l0{sfx}"] = torch.from_numpy(
                np.asarray(gru_p[key]["b_ih"]).copy())
            state[f"intent_layers.0.bias_hh_l0{sfx}"] = torch.from_numpy(
                np.asarray(gru_p[key]["b_hh"]).copy())
        li = ours.intent_arch.linear_index
        lin = ours.params["intent_layers"][str(li)]
        state[f"intent_layers.{li}.weight"] = torch.from_numpy(np.asarray(lin["w"]).T.copy())
        state[f"intent_layers.{li}.bias"] = torch.from_numpy(np.asarray(lin["b"]).copy())

        ref_model = ref_models.Model(config)
        ref_model.load_state_dict(state)
        ref_model.eval()

        x = rng.standard_normal((3, 10000), dtype=np.float32)
        with torch.no_grad():
            ref_logits, ref_pred = ref_model.predict_intents(torch.from_numpy(x))
        got_logits, got_pred = ours.predict_intents(x)
        np.testing.assert_allclose(
            np.asarray(got_logits), ref_logits.numpy(), rtol=1e-4, atol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(got_pred), ref_pred.numpy())

        # decode_intents strings agree too
        ref_intents = ref_model.decode_intents(torch.from_numpy(x))
        got_intents = ours.decode_intents(x)
        assert [list(i) for i in ref_intents] == [list(i) for i in got_intents]

    def test_torch_saved_checkpoint_roundtrip(self, ref_models, config, tmp_path, rng):
        """torch.save a reference model's state_dict -> our importer loads it
        and reproduces the reference's features (the real .pth flow)."""
        ref_model = ref_models.PretrainedModel(config)
        ref_model.eval()
        pth = str(tmp_path / "model_state.pth")
        torch.save(ref_model.state_dict(), pth)

        arch = EncoderArch.from_config(config)
        from tpu_slu.models.torch_import import import_pretrained_state_dict

        params = import_pretrained_state_dict(pth, arch)
        x = rng.standard_normal((2, 8000), dtype=np.float32)
        with torch.no_grad():
            ref_feats = ref_model.compute_features(torch.from_numpy(x)).numpy()
        got = np.asarray(enc.encoder_features(params, arch, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref_feats, rtol=1e-4, atol=2e-5)
