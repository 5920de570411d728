"""Model-level parity vs a functional PyTorch oracle + checkpoint round-trips.

The oracle assembles the reference topology from torch.nn.functional ops and
torch GRU modules loaded from *our exported* state_dict (reference key
names), then activations are compared end-to-end. This pins the wiring:
ModuleList index mapping, layer order, pooling placement, downsampling, and
the sinc front-end — i.e. whether a real ``model_state.pth`` would reproduce
predictions (SURVEY.md §2 checkpoint layout).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.models import encoder as enc
from tpu_slu.models import slu as slu_mod
from tpu_slu.models.encoder import EncoderArch, init_encoder_params
from tpu_slu.models.torch_import import (
    export_pretrained_state_dict,
    import_model_state_dict,
    import_pretrained_state_dict,
)


@pytest.fixture
def config(tmp_path):
    path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"))
    config = read_config(path)
    config.num_phonemes = 5
    config.values_per_slot = [2, 2, 2]
    config.Sy_intent = {"action": {"a": 0, "b": 1}, "object": {"c": 0, "d": 1},
                        "location": {"e": 0, "f": 1}}
    return config


def numpy_sinc_filters(b1, band, N, fs):
    """Independent filter-synthesis oracle (validated in test_ops_parity)."""
    beg = np.abs(b1) + 50.0 / fs
    end = beg + np.abs(band) + 50.0 / fs
    half = (N - 1) // 2
    t_right = np.linspace(1, (N - 1) / 2, half).astype(np.float32) / fs

    def lp(cut):
        out = np.zeros((len(cut), N), np.float32)
        for i in range(len(cut)):
            arg = 2 * np.pi * cut[i] * fs * t_right
            y_right = np.sin(arg) / arg
            out[i] = 2 * cut[i] * np.concatenate([y_right[::-1], [1.0], y_right])
        return out

    bp = lp(end) - lp(beg)
    bp = bp / bp.max(axis=1, keepdims=True)
    n = np.linspace(0, N, N).astype(np.float32)
    return bp * (0.54 - 0.46 * np.cos(2 * np.pi * n / N)).astype(np.float32)


def torch_gru_from_state(state, prefix, in_dim, hidden, bidirectional):
    gru = torch.nn.GRU(in_dim, hidden, batch_first=True, bidirectional=bidirectional)
    sd = {k[len(prefix) + 1:]: torch.as_tensor(v) for k, v in state.items()
          if k.startswith(prefix + ".")}
    gru.load_state_dict(sd)
    return gru


def torch_encoder_features(state, config, x_np, upto="word"):
    """Functional torch re-execution of the encoder from a state_dict."""
    cfg = config
    out = torch.from_numpy(x_np).unsqueeze(1)
    # conv front-end (indices follow reference construction order)
    i = 0
    for idx in range(len(cfg.cnn_N_filt)):
        if idx == 0:
            filt = numpy_sinc_filters(
                state["phoneme_layers.0.filt_b1"].numpy(),
                state["phoneme_layers.0.filt_band"].numpy(),
                cfg.cnn_len_filt[0], cfg.fs,
            )
            out = F.conv1d(
                out, torch.from_numpy(filt).unsqueeze(1),
                stride=cfg.cnn_stride[0], padding=cfg.cnn_len_filt[0] // 2,
            )
            i += 1
            out = out.abs()
            i += 1
        else:
            w = torch.as_tensor(state[f"phoneme_layers.{i}.weight"])
            b = torch.as_tensor(state[f"phoneme_layers.{i}.bias"])
            out = F.conv1d(out, w, b, stride=cfg.cnn_stride[idx],
                           padding=cfg.cnn_len_filt[idx] // 2)
            i += 1
        if cfg.cnn_max_pool_len[idx] > 1:
            out = F.max_pool1d(out, cfg.cnn_max_pool_len[idx], ceil_mode=True)
        i += 1
        out = F.leaky_relu(out, 0.2) if cfg.cnn_act[idx] == "leaky_relu" else F.relu(out)
        i += 1
        i += 1  # dropout (eval: identity)
    out = out.transpose(1, 2)
    i += 1  # ncl2nlc

    def rnn_stack(out, group, i, in_dim, hiddens, ds_types, ds_lens, bidir):
        for li, hidden in enumerate(hiddens):
            gru = torch_gru_from_state(state, f"{group}.{i}", in_dim, hidden, bidir)
            out, _ = gru(out)
            in_dim = hidden * (2 if bidir else 1)
            i += 3  # gru, select, dropout
            if ds_types[li] == "avg":
                out = F.avg_pool1d(out.transpose(1, 2), ds_lens[li], ceil_mode=True).transpose(1, 2)
            elif ds_types[li] == "max":
                out = F.max_pool1d(out.transpose(1, 2), ds_lens[li], ceil_mode=True).transpose(1, 2)
            elif ds_lens[li] > 1:
                out = out[:, :: ds_lens[li]]
            i += 1
        return out, i, in_dim

    out, i, dim = rnn_stack(out, "phoneme_layers", i, cfg.cnn_N_filt[-1],
                            cfg.phone_rnn_num_hidden, cfg.phone_downsample_type,
                            cfg.phone_downsample_len, cfg.phone_rnn_bidirectional)
    if upto == "phoneme":
        return out
    out, _, _ = rnn_stack(out, "word_layers", 0, dim,
                          cfg.word_rnn_num_hidden, cfg.word_downsample_type,
                          cfg.word_downsample_len, cfg.word_rnn_bidirectional)
    return out


class TestEncoderParity:
    def test_features_match_torch_oracle(self, config, rng):
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(0), arch)
        state = export_pretrained_state_dict(params, arch)

        x = rng.standard_normal((2, 8000), dtype=np.float32)
        ref = torch_encoder_features(state, config, x).detach().numpy()
        got = np.asarray(enc.encoder_features(params, arch, jnp.asarray(x)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_import_roundtrip(self, config):
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(1), arch)
        state = export_pretrained_state_dict(params, arch)
        params2 = import_pretrained_state_dict(state_dict_to_numpy(state), arch)
        for leaf1, leaf2 in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leaf2))

    def test_posteriors_shapes(self, config, rng):
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(0), arch)
        x = jnp.asarray(rng.standard_normal((2, 8000), dtype=np.float32))
        ph, wd = enc.encoder_posteriors(params, arch, x)
        assert ph.shape == (2, 100, 5)  # 8000/80 frames, 5 phonemes
        assert wd.shape == (2, 25, 8)  # 8000/320 frames, vocab 8

    def test_pretraining_loss_ignore_index(self, config, rng):
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(0), arch)
        x = jnp.asarray(rng.standard_normal((2, 8000), dtype=np.float32))
        yp = np.full((2, 100), -1, np.int32)
        yp[0, :10] = 1
        yw = np.full((2, 25), -1, np.int32)
        yw[0, :5] = 2
        pl_, wl, pa, wa = enc.encoder_loss(params, arch, x, jnp.asarray(yp), jnp.asarray(yw))
        ref_pl, ref_pa = _torch_masked_ce(
            np.asarray(enc.encoder_posteriors(params, arch, x)[0]), yp
        )
        np.testing.assert_allclose(float(pl_), ref_pl, rtol=1e-4)
        np.testing.assert_allclose(float(pa), ref_pa, rtol=1e-5)

    def test_pretraining_loss_weight_zero_rows_drop_out(self, config, rng):
        """Weight-0 rows (wrapped multi-host shard duplicates, loader.py) must
        contribute nothing to the ASR losses, accuracies, or gradients."""
        arch = EncoderArch.from_config(config)
        params = init_encoder_params(jax.random.PRNGKey(0), arch)
        x1 = rng.standard_normal((2, 8000)).astype(np.float32)
        yp1 = rng.integers(0, 5, (2, 100)).astype(np.int32)
        yw1 = rng.integers(0, 8, (2, 25)).astype(np.int32)
        # batch 2 = batch 1 plus a duplicated row carrying weight 0
        x2 = np.concatenate([x1, x1[:1]])
        yp2 = np.concatenate([yp1, yp1[:1]])
        yw2 = np.concatenate([yw1, yw1[:1]])
        w2 = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)

        def run(x, yp, yw, w):
            def loss_fn(p):
                pl_, wl, pa, wa = enc.encoder_loss(
                    p, arch, jnp.asarray(x), jnp.asarray(yp), jnp.asarray(yw),
                    weights=w,
                )
                return pl_ + wl, (pl_, wl, pa, wa)

            grads, aux = jax.grad(loss_fn, has_aux=True)(params)
            return grads, aux

        g1, aux1 = run(x1, yp1, yw1, None)
        g2, aux2 = run(x2, yp2, yw2, w2)
        for a, b in zip(aux1, aux2):
            np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
        for la, lb in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=2e-4, atol=1e-6)


def _torch_masked_ce(logits_np, y_np):
    # copy: the input may be a non-writable view of a JAX buffer, which
    # torch.from_numpy warns about (undefined behavior if torch wrote to it)
    logits = torch.from_numpy(logits_np.reshape(-1, logits_np.shape[-1]).copy())
    y = torch.from_numpy(y_np.reshape(-1).astype(np.int64))
    loss = F.cross_entropy(logits, y, ignore_index=-1).item()
    valid = y != -1
    acc = (logits.max(1)[1][valid] == y[valid]).float().mean().item()
    return loss, acc


def state_dict_to_numpy(state):
    return {k: v.numpy() for k, v in state.items()}


class TestSLUModelParity:
    def test_intent_head_matches_torch(self, config, rng):
        model = slu_mod.Model(config)
        # torch oracle for the head: GRU -> linear -> max over time
        arch = model.intent_arch
        gru_p = model.params["intent_layers"]["0"]
        lin_p = model.params["intent_layers"][str(arch.linear_index)]

        feats = rng.standard_normal((3, 25, model.encoder_arch.word_feat_dim), dtype=np.float32)
        got = np.asarray(slu_mod.intent_logits(model.params["intent_layers"], arch,
                                               jnp.asarray(feats)))

        gru = torch.nn.GRU(model.encoder_arch.word_feat_dim, 16, batch_first=True,
                           bidirectional=True)
        sd = {}
        for ours, theirs in (("fwd", ""), ("bwd", "_reverse")):
            sd[f"weight_ih_l0{theirs}"] = torch.from_numpy(np.asarray(gru_p[ours]["w_ih"]).T.copy())
            sd[f"weight_hh_l0{theirs}"] = torch.from_numpy(np.asarray(gru_p[ours]["w_hh"]).T.copy())
            sd[f"bias_ih_l0{theirs}"] = torch.from_numpy(np.asarray(gru_p[ours]["b_ih"]).copy())
            sd[f"bias_hh_l0{theirs}"] = torch.from_numpy(np.asarray(gru_p[ours]["b_hh"]).copy())
        gru.load_state_dict(sd)
        out, _ = gru(torch.from_numpy(feats))
        out = out @ torch.from_numpy(np.asarray(lin_p["w"]).copy()) + torch.from_numpy(
            np.asarray(lin_p["b"]).copy()
        )
        ref = out.max(dim=1)[0].detach().numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_intent_loss_matches_torch(self, config, rng):
        vps = (2, 2, 2)
        logits = rng.standard_normal((4, 6), dtype=np.float32)
        y = rng.integers(0, 2, (4, 3)).astype(np.int32)
        loss, acc = slu_mod.intent_loss_acc(jnp.asarray(logits), jnp.asarray(y), vps)
        t_logits = torch.from_numpy(logits)
        t_y = torch.from_numpy(y.astype(np.int64))
        ref_loss = sum(
            F.cross_entropy(t_logits[:, 2 * s : 2 * s + 2], t_y[:, s]) for s in range(3)
        ).item()
        preds = torch.stack(
            [t_logits[:, 2 * s : 2 * s + 2].max(1)[1] for s in range(3)], dim=1
        )
        ref_acc = (preds == t_y).prod(1).float().mean().item()
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
        np.testing.assert_allclose(float(acc), ref_acc, rtol=1e-6)

    def test_model_import_from_torch_state(self, config, rng):
        """Full Model state_dict (pretrained_model.* + intent_layers.*) import."""
        model = slu_mod.Model(config)
        enc_state = export_pretrained_state_dict(
            model.params["pretrained_model"], model.encoder_arch, prefix="pretrained_model."
        )
        # intent head keys
        gru_p = model.params["intent_layers"]["0"]
        lin_p = model.params["intent_layers"][str(model.intent_arch.linear_index)]
        state = dict(enc_state)
        for ours, theirs in (("fwd", ""), ("bwd", "_reverse")):
            state[f"intent_layers.0.weight_ih_l0{theirs}"] = torch.from_numpy(
                np.asarray(gru_p[ours]["w_ih"]).T.copy())
            state[f"intent_layers.0.weight_hh_l0{theirs}"] = torch.from_numpy(
                np.asarray(gru_p[ours]["w_hh"]).T.copy())
            state[f"intent_layers.0.bias_ih_l0{theirs}"] = torch.from_numpy(
                np.asarray(gru_p[ours]["b_ih"]).copy())
            state[f"intent_layers.0.bias_hh_l0{theirs}"] = torch.from_numpy(
                np.asarray(gru_p[ours]["b_hh"]).copy())
        li = model.intent_arch.linear_index
        state[f"intent_layers.{li}.weight"] = torch.from_numpy(np.asarray(lin_p["w"]).T.copy())
        state[f"intent_layers.{li}.bias"] = torch.from_numpy(np.asarray(lin_p["b"]).copy())

        params2 = import_model_state_dict(
            {k: np.asarray(v) for k, v in state.items()},
            model.encoder_arch, intent_arch=model.intent_arch,
        )
        for l1, l2 in zip(jax.tree.leaves(model.params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_decode_intents_strings(self, config, rng):
        model = slu_mod.Model(config)
        x = rng.standard_normal((2, 8000), dtype=np.float32)
        intents = model.decode_intents(x)
        assert len(intents) == 2
        for intent in intents:
            assert len(intent) == 3
            assert intent[0] in ("a", "b")
            assert intent[1] in ("c", "d")
            assert intent[2] in ("e", "f")


class TestUnfreezing:
    def _model(self, config, unfreezing_type):
        config.unfreezing_type = unfreezing_type
        config.pretraining_type = 2
        config.starting_unfreezing_index = 1
        m = slu_mod.Model.__new__(slu_mod.Model)
        # build without checkpoint load: construct via pretraining_type=0 then freeze
        config.pretraining_type = 0
        m2 = slu_mod.Model(config)
        m2.unfreezing_type = unfreezing_type
        m2.unfreezing_index = 1
        m2.freeze_all_layers()
        return m2

    def test_schedule_walks_word_layers_backwards(self, config):
        m = self._model(config, unfreezing_type=1)
        mask0 = m.trainable_mask()
        enc_mask = mask0["pretrained_model"]
        # Everything in the two ModuleLists frozen; linears trainable
        assert all(v == 0.0 for v in jax.tree.leaves(enc_mask["word_layers"]))
        assert all(v == 0.0 for v in jax.tree.leaves(enc_mask["phoneme_layers"]))
        assert all(v == 1.0 for v in jax.tree.leaves(enc_mask["word_linear"]))

        m.unfreeze_one_layer()  # epoch 1: last word GRU
        enc_mask = m.trainable_mask()["pretrained_model"]
        word_specs = [s for s in m.encoder_arch.word_layers if s.kind == "gru"]
        last, first = str(word_specs[-1].index), str(word_specs[0].index)
        assert all(v == 1.0 for v in jax.tree.leaves(enc_mask["word_layers"][last]))
        assert all(v == 0.0 for v in jax.tree.leaves(enc_mask["word_layers"][first]))

        m.unfreeze_one_layer()  # epoch 2: both word GRUs
        enc_mask = m.trainable_mask()["pretrained_model"]
        assert all(v == 1.0 for v in jax.tree.leaves(enc_mask["word_layers"]))
        # type 1 never touches phoneme layers
        m.unfreeze_one_layer()
        m.unfreeze_one_layer()
        enc_mask = m.trainable_mask()["pretrained_model"]
        assert all(v == 0.0 for v in jax.tree.leaves(enc_mask["phoneme_layers"]))

    def test_schedule_type2_continues_into_phoneme_layers(self, config):
        m = self._model(config, unfreezing_type=2)
        for _ in range(3):  # 2 word GRUs + 1
            m.unfreeze_one_layer()
        enc_mask = m.trainable_mask()["pretrained_model"]
        assert all(v == 1.0 for v in jax.tree.leaves(enc_mask["word_layers"]))
        phone_grus = [s for s in m.encoder_arch.phoneme_layers if s.kind == "gru"]
        assert all(
            v == 1.0
            for v in jax.tree.leaves(enc_mask["phoneme_layers"][str(phone_grus[-1].index)])
        )
        # sinc layer (walk end) still frozen after only 3 unfreezes
        assert all(v == 0.0 for v in jax.tree.leaves(enc_mask["phoneme_layers"]["0"]))


class TestFacadeTrainMode:
    """Model.forward(training=True) applies dropout like the reference's
    model.train() mode (ref models.py:797-828); eval mode stays deterministic
    (VERDICT r2 weak #6)."""

    def test_eval_forward_is_deterministic(self, config, rng):
        m = slu_mod.Model(config)
        x = rng.standard_normal((2, 4000), dtype=np.float32)
        y = rng.integers(0, 2, (2, 3)).astype(np.int32)
        l1, _ = m.forward(x, y)
        l2, _ = m.forward(x, y)
        assert float(l1) == float(l2)

    def test_training_forward_applies_dropout(self, config, rng):
        # the fixture cfg zeroes every dropout; turn them on so train mode
        # is observable
        config.phone_rnn_drop = [0.5] * len(config.phone_rnn_drop)
        config.word_rnn_drop = [0.5] * len(config.word_rnn_drop)
        config.intent_rnn_drop = [0.5] * len(config.intent_rnn_drop)
        m = slu_mod.Model(config)
        x = rng.standard_normal((2, 4000), dtype=np.float32)
        y = rng.integers(0, 2, (2, 3)).astype(np.int32)
        l_eval, _ = m.forward(x, y)
        l_t1, _ = m.forward(x, y, training=True)
        l_t2, _ = m.forward(x, y, training=True)
        # dropout (p=0.5 on every RNN stage) active: train loss differs from
        # eval, and two train calls draw different masks (step-indexed RNG)
        assert float(l_t1) != float(l_eval)
        assert float(l_t1) != float(l_t2)
