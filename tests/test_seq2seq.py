"""Seq2seq head parity (attention, teacher-forced log-prob) + beam search.

Oracles: a functional torch re-execution of the decoder math (independent of
our JAX code paths), and a straightforward NumPy beam search implementing the
reference's search semantics (models.py:558-651) for the jitted scan version
to match.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import fixtures
from tpu_slu import read_config
from tpu_slu.models import slu as slu_mod
from tpu_slu.models.slu import Model, Seq2SeqArch, init_seq2seq_params
from tpu_slu.ops.attention import attend, attention_init


@pytest.fixture
def config(tmp_path):
    path = fixtures.write_cfg(str(tmp_path / "c.cfg"), folder=str(tmp_path / "exp"),
                              seq2seq=True)
    config = read_config(path)
    config.num_phonemes = 5
    config.Sy_intent = ["<sos>", "a", "b", "c", "<eos>"]
    return config


def t2n(t):
    return t.detach().numpy()


class TestAttention:
    def test_matches_torch(self, rng):
        E, D, K, V, B, T = 12, 8, 6, 10, 3, 7
        params = attention_init(jax.random.PRNGKey(0), E, D, K, V)
        enc_states = rng.standard_normal((B, T, E), dtype=np.float32)
        dec_state = rng.standard_normal((B, D), dtype=np.float32)

        got = np.asarray(attend(params, jnp.asarray(enc_states), jnp.asarray(dec_state)))

        keys = torch.from_numpy(enc_states) @ torch.from_numpy(np.asarray(params["key"]["w"])) + torch.from_numpy(np.asarray(params["key"]["b"]))
        values = torch.from_numpy(enc_states) @ torch.from_numpy(np.asarray(params["value"]["w"])) + torch.from_numpy(np.asarray(params["value"]["b"]))
        query = torch.from_numpy(dec_state) @ torch.from_numpy(np.asarray(params["query"]["w"])) + torch.from_numpy(np.asarray(params["query"]["b"]))
        scores = torch.matmul(keys, query.unsqueeze(2)) / torch.sqrt(torch.tensor(float(K)))
        w = torch.softmax(scores, dim=1).transpose(1, 2)
        ref = torch.matmul(w, values).squeeze(1)
        np.testing.assert_allclose(got, t2n(ref), rtol=1e-5, atol=1e-6)


def _torch_decoder_logprob(params, arch, feats_np, y_onehot_np):
    """Functional torch oracle of Seq2SeqEncoder+Decoder forward."""
    dec = params["decoder"]

    def lin(p, x):
        return x @ torch.from_numpy(np.asarray(p["w"])) + torch.from_numpy(np.asarray(p["b"]))

    out = torch.from_numpy(feats_np)
    for idx in range(arch.num_encoder_layers):
        g = params["encoder"][str(3 * idx)]
        gru = torch.nn.GRU(out.shape[-1], arch.encoder_dim, batch_first=True, bidirectional=True)
        sd = {}
        for ours, sfx in (("fwd", ""), ("bwd", "_reverse")):
            sd[f"weight_ih_l0{sfx}"] = torch.from_numpy(np.asarray(g[ours]["w_ih"]).T.copy())
            sd[f"weight_hh_l0{sfx}"] = torch.from_numpy(np.asarray(g[ours]["w_hh"]).T.copy())
            sd[f"bias_ih_l0{sfx}"] = torch.from_numpy(np.asarray(g[ours]["b_ih"]).copy())
            sd[f"bias_hh_l0{sfx}"] = torch.from_numpy(np.asarray(g[ours]["b_hh"]).copy())
        gru.load_state_dict(sd)
        out, _ = gru(out)

    B, U, L = y_onehot_np.shape
    state = torch.from_numpy(np.asarray(dec["initial_state"])).unsqueeze(0).repeat(B, 1, 1)
    y = torch.from_numpy(y_onehot_np)
    y_prev = torch.zeros(B, L)
    y_prev[:, arch.sos] = 1.0
    log_p = torch.zeros(B)
    K = np.asarray(dec["attention"]["key"]["w"]).shape[1]
    for u in range(U):
        keys = lin(dec["attention"]["key"], out)
        values = lin(dec["attention"]["value"], out)
        query = lin(dec["attention"]["query"], state[:, -1]).unsqueeze(2)
        scores = torch.matmul(keys, query) / torch.sqrt(torch.tensor(float(K)))
        ctx = torch.matmul(torch.softmax(scores, dim=1).transpose(1, 2), values).squeeze(1)
        emb = lin(dec["embed"], y_prev)
        h_in = torch.cat([emb, ctx], dim=1)
        new_states = []
        for li in range(arch.num_decoder_layers):
            c = dec["rnn"][str(2 * li)]
            cell = torch.nn.GRUCell(h_in.shape[-1], arch.decoder_dim)
            cell.load_state_dict({
                "weight_ih": torch.from_numpy(np.asarray(c["w_ih"]).T.copy()),
                "weight_hh": torch.from_numpy(np.asarray(c["w_hh"]).T.copy()),
                "bias_ih": torch.from_numpy(np.asarray(c["b_ih"]).copy()),
                "bias_hh": torch.from_numpy(np.asarray(c["b_hh"]).copy()),
            })
            h = cell(h_in, state[:, li])
            new_states.append(h)
            h_in = h
        state = torch.stack(new_states, dim=1)
        logits = lin(dec["linear"], state[:, -1])
        logp = torch.log_softmax(logits, dim=1)
        log_p = log_p + (logp * y[:, u]).sum(dim=1)
        y_prev = y[:, u]
    return t2n(log_p)


class TestSeq2SeqForward:
    def test_log_prob_matches_torch(self, rng):
        arch = Seq2SeqArch(
            num_labels=5, num_encoder_layers=1, encoder_dim=6,
            num_decoder_layers=2, decoder_dim=8, key_dim=6, value_dim=7, sos=0,
        )
        in_dim = 10
        params = init_seq2seq_params(jax.random.PRNGKey(0), arch, in_dim)
        B, T, U = 3, 9, 6
        feats = rng.standard_normal((B, T, in_dim), dtype=np.float32)
        ids = rng.integers(0, 5, (B, U))
        y_onehot = np.eye(5, dtype=np.float32)[ids]

        got = np.asarray(
            slu_mod.seq2seq_log_prob(params, arch, jnp.asarray(feats), jnp.asarray(y_onehot))
        )
        ref = _torch_decoder_logprob(params, arch, feats, y_onehot)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_log_prob_bucket_invariant_with_num_steps(self, rng):
        """EOS-padding labels up to a bucket boundary must not change the
        loss when num_steps masks the extra steps (the trainer passes
        max(y_len); ADVICE r1: loss scale was bucket-dependent)."""
        arch = Seq2SeqArch(
            num_labels=5, num_encoder_layers=1, encoder_dim=6,
            num_decoder_layers=2, decoder_dim=8, key_dim=6, value_dim=7, sos=0,
        )
        in_dim = 10
        params = init_seq2seq_params(jax.random.PRNGKey(0), arch, in_dim)
        B, T, U = 3, 9, 6
        eos = 4
        feats = jnp.asarray(rng.standard_normal((B, T, in_dim), dtype=np.float32))
        ids = rng.integers(0, 5, (B, U))
        y_exact = np.eye(5, dtype=np.float32)[ids]
        ids_bucket = np.concatenate(
            [ids, np.full((B, 10), eos, ids.dtype)], axis=1
        )  # EOS-padded to a 16 "bucket"
        y_bucket = np.eye(5, dtype=np.float32)[ids_bucket]

        lp_exact = slu_mod.seq2seq_log_prob(params, arch, feats, jnp.asarray(y_exact))
        lp_bucket = slu_mod.seq2seq_log_prob(
            params, arch, feats, jnp.asarray(y_bucket), num_steps=jnp.asarray(U)
        )
        np.testing.assert_allclose(np.asarray(lp_bucket), np.asarray(lp_exact),
                                   rtol=1e-6, atol=1e-6)
        # without num_steps the padded version accumulates extra EOS terms
        lp_unmasked = slu_mod.seq2seq_log_prob(params, arch, feats, jnp.asarray(y_bucket))
        assert not np.allclose(np.asarray(lp_unmasked), np.asarray(lp_exact))


def _numpy_beam_search(step_fn, state0, batch, V, U, B):
    """Reference-semantics beam search in plain NumPy (oracle)."""
    tokens = np.zeros((B, batch, U), np.int32)
    scores = np.zeros((B, batch), np.float32)
    states = [state0.copy() for _ in range(B)]
    for u in range(U):
        all_logp = []
        new_states = []
        for b in range(B):
            if u == 0:
                y_prev = np.zeros((batch, V), np.float32)
            else:
                y_prev = np.eye(V, dtype=np.float32)[tokens[b, :, u - 1]]
            s, logp = step_fn(states[b], y_prev)
            new_states.append(s)
            all_logp.append(logp)
        ext = np.stack([scores[b][:, None] + all_logp[b] for b in range(B)])  # (B,batch,V)
        if u == 0:
            ext[1:] = -np.inf
        flat = ext.transpose(1, 0, 2).reshape(batch, B * V)
        top_idx = np.argsort(-flat, axis=1, kind="stable")[:, :B]  # (batch, B)
        top_scores = np.take_along_axis(flat, top_idx, axis=1)
        origin = top_idx // V
        tok = top_idx % V
        tokens_new = np.zeros_like(tokens)
        states_new = [np.zeros_like(state0) for _ in range(B)]
        for nb in range(B):
            for i in range(batch):
                src = origin[i, nb]
                tokens_new[nb, i] = tokens[src, i]
                tokens_new[nb, i, u] = tok[i, nb]
                states_new[nb][i] = new_states[src][i]
                scores[nb, i] = top_scores[i, nb]
        tokens = tokens_new
        states = states_new
    return scores, tokens


class TestBeamSearch:
    def _random_step(self, V, H, seed=0):
        """A toy recurrent step: state (batch, H); logp depends on state+input."""
        rng = np.random.default_rng(seed)
        W1 = rng.standard_normal((V, H)).astype(np.float32) * 0.5
        W2 = rng.standard_normal((H, H)).astype(np.float32) * 0.5
        Wo = rng.standard_normal((H, V)).astype(np.float32)

        def np_step(state, y_prev):
            s = np.tanh(y_prev @ W1 + state @ W2)
            logits = s @ Wo
            logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
            return s, logp

        def jax_step(state, y_prev):
            s = jnp.tanh(y_prev @ W1 + state @ W2)
            return s, jax.nn.log_softmax(s @ Wo, axis=1)

        return np_step, jax_step

    def test_matches_numpy_reference(self):
        from tpu_slu.ops.beam import beam_search

        V, H, batch, U, B = 6, 4, 3, 5, 4
        np_step, jax_step = self._random_step(V, H)
        state0 = np.zeros((batch, H), np.float32)

        ref_scores, ref_tokens = _numpy_beam_search(np_step, state0, batch, V, U, B)
        scores, tokens = jax.jit(
            lambda s0: beam_search(jax_step, s0, batch, V, U, B)
        )(jnp.asarray(state0))
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(tokens), ref_tokens)

    def test_beam1_is_greedy(self):
        from tpu_slu.ops.beam import beam_search

        V, H, batch, U = 5, 4, 2, 6
        np_step, jax_step = self._random_step(V, H, seed=3)
        state0 = np.zeros((batch, H), np.float32)
        scores, tokens = beam_search(jax_step, jnp.asarray(state0), batch, V, U, 1)

        # greedy rollout
        state = state0.copy()
        y_prev = np.zeros((batch, V), np.float32)
        greedy = []
        for u in range(U):
            state, logp = np_step(state, y_prev)
            ids = logp.argmax(axis=1)
            greedy.append(ids)
            y_prev = np.eye(V, dtype=np.float32)[ids]
        np.testing.assert_array_equal(np.asarray(tokens)[0], np.stack(greedy, axis=1))


class TestSeq2SeqModel:
    def test_forward_and_decode(self, config, rng):
        model = Model(config)
        assert model.seq2seq
        model.seq2seq_arch = model.seq2seq_arch.__class__(
            **{**model.seq2seq_arch.__dict__, "max_decode_len": 8}
        )
        model._build_jits()
        x = rng.standard_normal((2, 8000), dtype=np.float32)
        U, L = 5, len(config.Sy_intent)
        ids = rng.integers(0, L, (2, U))
        y = np.eye(L, dtype=np.float32)[ids]
        loss, acc = model.forward(x, y)
        assert np.isfinite(float(loss))

        intents = model.decode_intents(x)
        assert len(intents) == 2
        assert all(isinstance(s, str) for s in intents)

    def test_one_hot_to_string_strip_quirk(self, config):
        model = Model(config)
        S = config.Sy_intent  # ["<sos>", "a", "b", "c", "<eos>"]
        ids = [0, 1, 2, 4, 4]  # <sos> a b <eos> <eos>
        onehot = np.eye(len(S), dtype=np.float32)[ids]
        assert model.one_hot_to_string(onehot, S) == "ab"


class TestBatchedTeacherForcing:
    """The batched teacher-forced path (embeddings hoisted before the scan,
    output projections + log-softmax batched after it) must match the
    reference-shaped per-step path: same math, same dropout RNG draws."""

    def _setup(self, rng):
        arch = Seq2SeqArch(
            num_labels=5, num_encoder_layers=1, encoder_dim=6,
            num_decoder_layers=2, decoder_dim=8, key_dim=6, value_dim=7, sos=0,
        )
        in_dim = 10
        params = init_seq2seq_params(jax.random.PRNGKey(0), arch, in_dim)
        B, T, U = 3, 9, 6
        feats = jnp.asarray(rng.standard_normal((B, T, in_dim), dtype=np.float32))
        ids = rng.integers(0, 5, (B, U))
        y = jnp.asarray(np.eye(5, dtype=np.float32)[ids])
        return arch, params, feats, y

    def test_eval_matches_per_step(self, rng):
        arch, params, feats, y = self._setup(rng)
        lp_b = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=True)
        lp_s = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=False)
        np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_s),
                                   rtol=1e-5, atol=1e-6)

    def test_train_mode_same_dropout_draws(self, rng):
        arch, params, feats, y = self._setup(rng)
        key = jax.random.PRNGKey(7)
        lp_b = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=True,
                                        train=True, rng=key)
        lp_s = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=False,
                                        train=True, rng=key)
        np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_s),
                                   rtol=1e-5, atol=1e-6)

    def test_num_steps_mask_matches(self, rng):
        arch, params, feats, y = self._setup(rng)
        ns = jnp.asarray(4)
        lp_b = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=True,
                                        num_steps=ns)
        lp_s = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=False,
                                        num_steps=ns)
        np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_s),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_match_per_step(self, rng):
        arch, params, feats, y = self._setup(rng)

        def loss(p, batched):
            return -slu_mod.seq2seq_log_prob(p, arch, feats, y,
                                             batched=batched).mean()

        g_b = jax.grad(lambda p: loss(p, True))(params)
        g_s = jax.grad(lambda p: loss(p, False))(params)
        for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_b)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)


class TestSeq2SeqDropoutKnob:
    """Config extension ``seq2seq_dropout``: the reference HARDCODES p=0.5
    inside Seq2SeqEncoder/DecoderRNN (models.py:403,454); the knob makes the
    rate configurable with 0.5 as the parity default."""

    def _setup(self, rng, dropout):
        import dataclasses

        arch = Seq2SeqArch(
            num_labels=5, num_encoder_layers=1, encoder_dim=6,
            num_decoder_layers=2, decoder_dim=8, key_dim=6, value_dim=7, sos=0,
        )
        arch = dataclasses.replace(arch, dropout=dropout)
        params = init_seq2seq_params(jax.random.PRNGKey(0), arch, 10)
        B, T, U = 3, 9, 6
        feats = jnp.asarray(rng.standard_normal((B, T, 10), dtype=np.float32))
        ids = rng.integers(0, 5, (B, U))
        y = jnp.asarray(np.eye(5, dtype=np.float32)[ids])
        return arch, params, feats, y

    def test_default_is_reference_half(self):
        arch = Seq2SeqArch(
            num_labels=5, num_encoder_layers=1, encoder_dim=6,
            num_decoder_layers=1, decoder_dim=8, key_dim=6, value_dim=7, sos=0,
        )
        assert arch.dropout == 0.5

    def test_zero_dropout_train_equals_eval(self, rng):
        arch, params, feats, y = self._setup(rng, dropout=0.0)
        lp_train = slu_mod.seq2seq_log_prob(
            params, arch, feats, y, train=True, rng=jax.random.PRNGKey(3))
        lp_eval = slu_mod.seq2seq_log_prob(params, arch, feats, y)
        np.testing.assert_allclose(np.asarray(lp_train), np.asarray(lp_eval),
                                   rtol=1e-5, atol=1e-6)

    def test_rate_changes_train_logprob(self, rng):
        arch_lo, params, feats, y = self._setup(rng, dropout=0.1)
        arch_hi = Seq2SeqArch(
            num_labels=5, num_encoder_layers=1, encoder_dim=6,
            num_decoder_layers=2, decoder_dim=8, key_dim=6, value_dim=7,
            sos=0, dropout=0.5,
        )
        key = jax.random.PRNGKey(3)
        lp_lo = slu_mod.seq2seq_log_prob(params, arch_lo, feats, y,
                                         train=True, rng=key)
        lp_hi = slu_mod.seq2seq_log_prob(params, arch_hi, feats, y,
                                         train=True, rng=key)
        assert not np.allclose(np.asarray(lp_lo), np.asarray(lp_hi))

    def test_batched_matches_per_step_at_custom_rate(self, rng):
        arch, params, feats, y = self._setup(rng, dropout=0.3)
        key = jax.random.PRNGKey(7)
        lp_b = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=True,
                                        train=True, rng=key)
        lp_s = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=False,
                                        train=True, rng=key)
        np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_s),
                                   rtol=1e-5, atol=1e-6)

    def test_config_roundtrip(self, tmp_path):
        from tests import fixtures
        from tpu_slu import read_config

        cfg_path = fixtures.write_cfg(
            str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"),
            slu_path=str(tmp_path), seq2seq=True,
        )
        config = read_config(cfg_path)
        assert config.seq2seq_dropout == 0.5  # absent key -> parity default
        text = open(cfg_path).read().replace(
            "[intent_module]", "[intent_module]\nseq2seq_dropout=0.25")
        with open(cfg_path, "w") as f:
            f.write(text)
        config = read_config(cfg_path)
        assert config.seq2seq_dropout == 0.25
        arch = Seq2SeqArch.from_config(config, sos=0, num_labels=5)
        assert arch.dropout == 0.25


class TestZerosStartKnob:
    """Config extension ``seq2seq_zeros_start``: the reference trains u=0 on
    one-hot SOS (models.py:536-538) but beam-decodes u=0 from a zeros vector
    (models.py:600). Default preserves the mismatch (parity); True trains on
    the zeros vector inference feeds."""

    def _setup(self, rng, zeros_start):
        import dataclasses

        arch = Seq2SeqArch(
            num_labels=5, num_encoder_layers=1, encoder_dim=6,
            num_decoder_layers=2, decoder_dim=8, key_dim=6, value_dim=7, sos=0,
        )
        arch = dataclasses.replace(arch, zeros_start=zeros_start)
        params = init_seq2seq_params(jax.random.PRNGKey(0), arch, 10)
        B, T, U = 3, 9, 6
        feats = jnp.asarray(rng.standard_normal((B, T, 10), dtype=np.float32))
        ids = rng.integers(0, 5, (B, U))
        y = jnp.asarray(np.eye(5, dtype=np.float32)[ids])
        return arch, params, feats, y

    def test_default_is_sos(self):
        arch = Seq2SeqArch(
            num_labels=5, num_encoder_layers=1, encoder_dim=6,
            num_decoder_layers=1, decoder_dim=8, key_dim=6, value_dim=7, sos=0,
        )
        assert arch.zeros_start is False

    def test_zeros_start_changes_logprob(self, rng):
        arch_sos, params, feats, y = self._setup(rng, zeros_start=False)
        arch_z, _, _, _ = self._setup(rng, zeros_start=True)
        lp_sos = slu_mod.seq2seq_log_prob(params, arch_sos, feats, y)
        lp_z = slu_mod.seq2seq_log_prob(params, arch_z, feats, y)
        assert not np.allclose(np.asarray(lp_sos), np.asarray(lp_z))

    def test_batched_matches_per_step(self, rng):
        arch, params, feats, y = self._setup(rng, zeros_start=True)
        lp_b = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=True)
        lp_s = slu_mod.seq2seq_log_prob(params, arch, feats, y, batched=False)
        np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_s),
                                   rtol=1e-5, atol=1e-6)

    def test_matches_beam_step_zero_distribution(self, rng):
        """With zeros_start the teacher-forced u=0 log-probs must equal what
        the beam decoder's first step computes (the whole point)."""
        from tpu_slu.models.slu import _decoder_step, attention_kv, seq2seq_encode

        arch, params, feats, y = self._setup(rng, zeros_start=True)
        B, U, L = np.asarray(y).shape
        # teacher-forced u=0 step log-prob of each y[:,0]
        lp_first = slu_mod.seq2seq_log_prob(
            params, arch, feats, y, num_steps=jnp.asarray(1))
        # beam machinery's u=0: zeros y_prev on the same encoder outputs
        enc_out = seq2seq_encode(params["encoder"], arch, feats)
        kv = attention_kv(params["decoder"]["attention"], enc_out)
        state0 = jnp.broadcast_to(
            params["decoder"]["initial_state"][None],
            (B,) + params["decoder"]["initial_state"].shape)
        _, logp = _decoder_step(params["decoder"], arch, kv, state0,
                                jnp.zeros((B, L), jnp.float32))
        expect = (np.asarray(logp) * np.asarray(y)[:, 0]).sum(axis=1)
        np.testing.assert_allclose(np.asarray(lp_first), expect,
                                   rtol=1e-5, atol=1e-6)

    def test_config_roundtrip(self, tmp_path):
        from tests import fixtures
        from tpu_slu import read_config

        cfg_path = fixtures.write_cfg(
            str(tmp_path / "exp.cfg"), folder=str(tmp_path / "exp"),
            slu_path=str(tmp_path), seq2seq=True,
        )
        config = read_config(cfg_path)
        assert config.seq2seq_zeros_start is False  # parity default
        text = open(cfg_path).read().replace(
            "[intent_module]", "[intent_module]\nseq2seq_zeros_start=True")
        with open(cfg_path, "w") as f:
            f.write(text)
        config = read_config(cfg_path)
        assert config.seq2seq_zeros_start is True
        arch = Seq2SeqArch.from_config(config, sos=0, num_labels=5)
        assert arch.zeros_start is True
