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
        from tpu_slu.models.torch_import import export_model_state_dict

        ours = slu_mod.Model(config)
        state = export_model_state_dict(ours.params, ours.encoder_arch, ours.intent_arch)

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

    def test_seq2seq_forward_parity(self, ref_models, tmp_path, rng):
        """Seq2seq Model: teacher-forced loss matches the reference decoder."""
        from tpu_slu.models.torch_import import export_model_state_dict

        path = fixtures.write_cfg(str(tmp_path / "s.cfg"), folder=str(tmp_path / "exp"),
                                  seq2seq=True)
        config = read_config(path)
        config.num_phonemes = 5
        config.Sy_intent = ["<sos>", "a", "b", "c", "<eos>"]
        ours = slu_mod.Model(config)
        state = export_model_state_dict(
            ours.params, ours.encoder_arch, seq2seq_arch=ours.seq2seq_arch
        )
        ref_model = ref_models.Model(config)
        ref_model.load_state_dict(state)
        ref_model.eval()

        B, T, U, L = 2, 9000, 6, len(config.Sy_intent)
        x = rng.standard_normal((B, T), dtype=np.float32)
        ids = rng.integers(0, L, (B, U))
        y = np.eye(L, dtype=np.float32)[ids]
        with torch.no_grad():
            ref_loss, _ = ref_model(torch.from_numpy(x), torch.from_numpy(y))
        got_loss, _ = ours.forward(x, y)
        np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-4, atol=1e-5)

    def test_conv_frontend_parity(self, ref_models, tmp_path, rng):
        """use_sincnet=False: plain Conv1d front-end matches the reference."""
        path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"),
                                  use_sincnet=False)
        config = read_config(path)
        config.num_phonemes = 5
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(3), arch)
        state = export_pretrained_state_dict(params, arch)
        ref_model = ref_models.PretrainedModel(config)
        ref_model.load_state_dict(state)
        ref_model.eval()
        x = rng.standard_normal((2, 8000), dtype=np.float32)
        with torch.no_grad():
            ref_feats = ref_model.compute_features(torch.from_numpy(x)).numpy()
        got = np.asarray(enc.encoder_features(params, arch, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref_feats, rtol=1e-4, atol=2e-5)

    @pytest.mark.parametrize(
        "variant",
        ["unidirectional", "max_downsample", "relu_act"],
    )
    def test_config_variants_parity(self, ref_models, tmp_path, rng, variant):
        """Less-traveled config axes match the reference: unidirectional
        RNNs, max-pool time downsampling, relu conv activations."""
        replace = {
            "unidirectional": {
                "phone_rnn_bidirectional=True": "phone_rnn_bidirectional=False",
                "word_rnn_bidirectional=True": "word_rnn_bidirectional=False",
            },
            "max_downsample": {
                "phone_downsample_type=avg,avg": "phone_downsample_type=max,none",
                "word_downsample_type=avg,avg": "word_downsample_type=none,max",
            },
            "relu_act": {
                "cnn_act=leaky_relu,leaky_relu": "cnn_act=relu,relu",
            },
        }[variant]
        path = fixtures.write_cfg(str(tmp_path / "v.cfg"), folder=str(tmp_path / "exp"),
                                  replace=replace)
        config = read_config(path)
        config.num_phonemes = 5
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(6), arch)
        state = export_pretrained_state_dict(params, arch)
        ref_model = ref_models.PretrainedModel(config)
        ref_model.load_state_dict(state)
        ref_model.eval()
        x = rng.standard_normal((2, 8000), dtype=np.float32)
        with torch.no_grad():
            ref_feats = ref_model.compute_features(torch.from_numpy(x)).numpy()
        got = np.asarray(enc.encoder_features(params, arch, jnp.asarray(x)))
        assert got.shape == ref_feats.shape
        np.testing.assert_allclose(got, ref_feats, rtol=1e-4, atol=2e-5)

    def test_asr_loss_and_acc_parity(self, ref_models, config, rng):
        """Full pre-training forward (CE with ignore_index, masked accs)
        matches the reference's PretrainedModel.forward, for pretraining_type
        2 (both heads) and 1 (word branch skipped)."""
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(4), arch)
        state = export_pretrained_state_dict(params, arch)

        x = rng.standard_normal((2, 8000), dtype=np.float32)
        yp = rng.integers(-1, config.num_phonemes, (2, 100)).astype(np.int64)
        yw = rng.integers(-1, config.vocabulary_size, (2, 25)).astype(np.int64)

        for ptype in (2, 1):
            config.pretraining_type = ptype
            arch_t = EncoderArch.from_config(config)
            ref_model = ref_models.PretrainedModel(config)
            ref_model.load_state_dict(state)
            ref_model.eval()
            with torch.no_grad():
                r_pl, r_wl, r_pa, r_wa = ref_model(
                    torch.from_numpy(x), torch.from_numpy(yp), torch.from_numpy(yw)
                )
            g_pl, g_wl, g_pa, g_wa = enc.encoder_loss(
                params, arch_t, jnp.asarray(x), jnp.asarray(yp.astype(np.int32)),
                jnp.asarray(yw.astype(np.int32)),
            )
            np.testing.assert_allclose(float(g_pl), float(r_pl), rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(float(g_pa), float(r_pa), rtol=1e-5)
            if ptype == 2:
                np.testing.assert_allclose(float(g_wl), float(r_wl), rtol=1e-4, atol=1e-5)
                np.testing.assert_allclose(float(g_wa), float(r_wa), rtol=1e-5)
            else:
                assert float(g_wl) == 0.0 and float(g_wa) == 0.0

    @pytest.mark.slow
    def test_beam_search_parity(self, ref_models, tmp_path, rng):
        """Our jitted beam search decodes the same strings (and scores) as the
        reference's Python-loop beam search on shared weights."""
        from tpu_slu.models.torch_import import export_model_state_dict

        path = fixtures.write_cfg(str(tmp_path / "s.cfg"), folder=str(tmp_path / "exp"),
                                  seq2seq=True)
        config = read_config(path)
        config.num_phonemes = 5
        config.Sy_intent = ["<sos>", "a", "b", "c", "<eos>"]
        config.seq2seq_max_decode_len = 200  # reference true_U
        ours = slu_mod.Model(config)
        state = export_model_state_dict(
            ours.params, ours.encoder_arch, seq2seq_arch=ours.seq2seq_arch
        )
        ref_model = ref_models.Model(config)
        ref_model.load_state_dict(state)
        ref_model.eval()

        x = rng.standard_normal((2, 9000), dtype=np.float32)
        with torch.no_grad():
            ref_scores, ref_beam = ref_model.predict_intents(torch.from_numpy(x))
        ref_strings = ref_model.decode_intents(torch.from_numpy(x))

        got_scores, got_tokens = ours.predict_intents(x)
        got_strings = ours.decode_intents(x)

        assert got_strings == ref_strings
        np.testing.assert_allclose(
            np.asarray(got_scores)[0], ref_scores.numpy()[0], rtol=1e-3, atol=1e-3
        )

    @pytest.mark.slow
    def test_fused_beam_kernel_reference_parity(self, ref_models, tmp_path, rng):
        """The fused Pallas beam kernel (interpret mode) decodes the same
        strings as the reference's Python-loop beam search on shared weights
        — a DIRECT pin, not transitive through the scan beam."""
        from tpu_slu.models import encoder as enc_mod
        from tpu_slu.models.torch_import import export_model_state_dict
        from tpu_slu.ops.attention import attention_kv
        from tpu_slu.ops.pallas_beam import beam_decode_pallas

        path = fixtures.write_cfg(str(tmp_path / "s.cfg"), folder=str(tmp_path / "exp"),
                                  seq2seq=True)
        config = read_config(path)
        config.num_phonemes = 5
        config.Sy_intent = ["<sos>", "a", "b", "c", "<eos>"]
        config.seq2seq_max_decode_len = 32  # interpret mode is slow; 32 steps suffice
        ours = slu_mod.Model(config)
        state = export_model_state_dict(
            ours.params, ours.encoder_arch, seq2seq_arch=ours.seq2seq_arch
        )
        ref_model = ref_models.Model(config)
        ref_model.load_state_dict(state)
        ref_model.eval()

        x = rng.standard_normal((2, 9000), dtype=np.float32)
        # call the reference pieces directly: infer(y_lengths=...) shortens
        # its fixed-length search to 32 steps (interpret mode is slow)
        with torch.no_grad():
            feats_t = ref_model.pretrained_model.compute_features(torch.from_numpy(x))
            enc_t = ref_model.encoder(feats_t)
            ref_scores, ref_beam = ref_model.decoder.infer(
                enc_t, config.Sy_intent, B=4, y_lengths=[32, 32]
            )
        ref_strings = [
            ref_model.one_hot_to_string(ref_beam[0, i], config.Sy_intent)
            for i in range(2)
        ]

        arch = ours.seq2seq_arch
        feats = enc_mod.encoder_features(
            ours.params["pretrained_model"], ours.encoder_arch, jnp.asarray(x)
        )
        enc_out = slu_mod.seq2seq_encode(
            ours.params["encoder"], arch, feats, train=False
        )
        keys, values = attention_kv(
            ours.params["decoder"]["attention"], enc_out
        )
        scores, tokens = beam_decode_pallas(
            ours.params["decoder"], arch, keys, values, 4, 32,
            interpret=True,
        )
        got_strings = [
            ours.ids_to_string(np.asarray(tokens)[0, i], config.Sy_intent)
            for i in range(2)
        ]
        assert got_strings == ref_strings
        np.testing.assert_allclose(
            np.asarray(scores)[0], ref_scores.numpy()[0], rtol=1e-3, atol=1e-3
        )

    @pytest.mark.slow
    def test_train_here_deploy_in_reference(self, ref_models, tmp_path, rng):
        """Full interop cycle: train with this framework, export the
        checkpoint, load it into the REFERENCE implementation, and verify
        both decode identical intents on fresh audio."""
        import torch as _torch

        from tests import fixtures
        from tpu_slu.data.audio import read_wav
        from tpu_slu.data.datasets import get_SLU_datasets
        from tpu_slu.models.torch_import import export_model_state_dict
        from tpu_slu.training.trainer import Trainer

        slu_root = fixtures.make_slu_dataset(str(tmp_path / "fsc"), n_train=24)
        cfg = fixtures.write_cfg(
            str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root
        )
        config = read_config(cfg)
        fixtures.write_phonemes_txt(config.folder)
        train, _, _ = get_SLU_datasets(config)
        ours = slu_mod.Model(config)
        trainer = Trainer(ours, config)
        trainer.train(train)  # one epoch is enough: we compare, not converge

        pth = str(tmp_path / "model_state.pth")
        _torch.save(
            export_model_state_dict(ours.params, ours.encoder_arch, ours.intent_arch), pth
        )
        ref_model = ref_models.Model(config)
        ref_model.load_state_dict(_torch.load(pth))
        ref_model.eval()

        for i in range(4):
            wav, _ = read_wav(os.path.join(slu_root, train.df.loc[i].path))
            ours_decode = ours.decode_intents(wav[None, :])
            with torch.no_grad():
                ref_decode = ref_model.decode_intents(_torch.from_numpy(wav[None, :]))
            assert [list(x) for x in ref_decode] == [list(x) for x in ours_decode]

    @pytest.mark.slow
    def test_train_in_reference_deploy_here(self, ref_models, tmp_path, rng):
        """The bundled-checkpoint user flow (reference README.md:26-41), with
        the checkpoint produced by actually TRAINING the reference: optimize
        the reference Model with torch Adam on the synthetic set, torch.save
        its state_dict, import it with load_torch_state_dict, and verify both
        implementations decode identical intents on held-out audio."""
        import pandas as pd
        import torch as _torch

        from tests import fixtures
        from tpu_slu.data.audio import read_wav
        from tpu_slu.data.datasets import get_SLU_datasets

        slu_root = fixtures.make_slu_dataset(str(tmp_path / "fsc"), n_train=48)
        cfg = fixtures.write_cfg(
            str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"), slu_path=slu_root
        )
        config = read_config(cfg)
        train, _, _ = get_SLU_datasets(config)
        config.num_phonemes = 5

        _torch.manual_seed(0)
        ref_model = ref_models.Model(config)  # pretraining_type=0: all trainable
        opt = _torch.optim.Adam(ref_model.parameters(), lr=3e-3)
        ref_model.train()
        for _epoch in range(6):
            for batch in train.loader:
                n = int(batch["w"].sum())
                x = _torch.from_numpy(batch["x"][:n])
                y = _torch.from_numpy(batch["y_intent"][:n]).long()
                loss, _acc = ref_model(x, y)
                opt.zero_grad()
                loss.backward()
                opt.step()
        ref_model.eval()
        pth = str(tmp_path / "model_state.pth")
        _torch.save(ref_model.state_dict(), pth)

        ours = slu_mod.Model(config, load_pretrained=False).load_torch_state_dict(pth)

        df = pd.read_csv(os.path.join(slu_root, "data", "valid_data.csv"))
        correct = 0
        for i in range(8):
            row = df.iloc[i]
            wav, _fs = read_wav(os.path.join(slu_root, row.path))
            with torch.no_grad():
                ref_decode = ref_model.decode_intents(_torch.from_numpy(wav[None, :]))
            got = ours.decode_intents(wav[None, :])
            assert [list(x) for x in got] == [list(x) for x in ref_decode]
            correct += list(ref_decode[0]) == [row.action, row.object, row.location]
        # the imported checkpoint is a genuinely *trained* model, not noise
        assert correct >= 6, f"reference training failed to learn ({correct}/8)"

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
