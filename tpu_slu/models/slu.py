"""End-to-end SLU model: encoder + fixed-slot intent head OR seq2seq decoder.

Rebuild of the reference ``Model`` (reference ``models.py:653-875``) plus its
seq2seq submodules (``Seq2SeqEncoder``/``Attention``/``DecoderRNN``/
``Seq2SeqDecoder``, ``models.py:381-651``) as pure functions over param
pytrees, with a stateful :class:`Model` facade preserving the reference API:
``forward(x, y_intent)``, ``predict_intents(x)``, ``decode_intents(x)``,
``freeze_all_layers()``, ``unfreeze_one_layer()``, ``print_frozen()``,
``one_hot_to_string(x, S)``.

Freezing is functional: instead of flipping ``requires_grad`` the facade
derives a 0/1 *trainable mask* pytree from the ULMFiT unfreezing schedule
(reference ``models.py:754-795``), which the trainer applies inside the
(single, never-recompiled) jitted train step.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpu_slu import ops
from tpu_slu.models import encoder as enc
from tpu_slu.models.encoder import EncoderArch, LayerSpec, _linear_init, _rnn_block_specs
from tpu_slu.ops.attention import attend_kv, attention_init, attention_kv
from tpu_slu.ops.beam import beam_search

PARAM_KINDS = ("sinc", "conv", "gru")


# ---------------------------------------------------------------------------
# Fixed-slot intent head
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class IntentArch:
    """Fixed-intent head: bi-GRU stack -> Linear -> max-over-time.

    Mirrors reference models.py:683-717; ``linear_index`` is the ModuleList
    position of the final classifier for checkpoint key mapping.
    """

    layers: tuple[LayerSpec, ...]
    linear_index: int
    feat_dim: int
    values_per_slot: tuple[int, ...]

    @staticmethod
    def from_config(config, in_dim: int) -> "IntentArch":
        specs, i, out_dim = _rnn_block_specs(
            "intent", 0, in_dim,
            config.intent_rnn_num_hidden, config.intent_rnn_drop,
            config.intent_downsample_type, config.intent_downsample_len,
            config.intent_rnn_bidirectional,
        )
        return IntentArch(
            layers=tuple(specs),
            linear_index=i,
            feat_dim=out_dim,
            values_per_slot=tuple(config.require("values_per_slot")),
        )


def init_intent_params(key, arch: IntentArch) -> dict:
    params: dict[str, Any] = {}
    gru_specs = [s for s in arch.layers if s.kind == "gru"]
    keys = jax.random.split(key, len(gru_specs) + 1)
    for k, spec in zip(keys[:-1], gru_specs):
        in_dim, hidden, bidir = spec.h
        params[str(spec.index)] = ops.gru_init(k, in_dim, hidden, bidir)
    params[str(arch.linear_index)] = _linear_init(
        keys[-1], arch.feat_dim, sum(arch.values_per_slot)
    )
    return params


def intent_logits(params, arch: IntentArch, feats, *, train=False, rng=None, gru_impl="scan",
                  frame_mask=None, n_frames=None):
    """feats: (B, T, C) encoder features -> (B, sum(values_per_slot)) logits.

    ``frame_mask`` (B, T_out) marks frames that come from real audio; padded
    frames are excluded from the max-over-time pool. (The reference lets
    batch padding leak into its FinalPool, models.py:116-123 — with bucket
    padding that leak would be larger, so masking is on by default and
    disabled via config ``mask_padding=False`` for strict emulation.)

    ``n_frames`` (B,) per-example valid feature frames selects the
    *length-exact* path: the head's GRUs/downsamples compute as if each
    example were cropped to its own length, and the final pool covers valid
    frames only (clamped to >= 1 so all-padding batch-fill rows stay finite).
    """
    out, _, n = enc._apply_stack(
        params, arch.layers, feats, train=train, rng=rng, gru_impl=gru_impl, n=n_frames
    )
    if isinstance(out, enc.PartsTM):  # shared-kernel chain: finalize streams
        out = enc._parts_to_btc(out)
    lin = params[str(arch.linear_index)]
    out = out @ lin["w"] + lin["b"]
    if n is not None:
        n = jnp.clip(n, 1, out.shape[1])
        frame_mask = jnp.arange(out.shape[1])[None, :] < n[:, None]
    if frame_mask is not None:
        out = jnp.where(frame_mask[:, :, None], out, -jnp.inf)
    return jnp.max(out, axis=1)  # FinalPool: max over time (models.py:116-123)


def frame_mask_from_lengths(encoder_arch, lengths, t_frames, intent_arch=None):
    """(B,) waveform sample counts -> (B, t_frames) bool valid-frame mask.

    Uses the exact layer-chain length arithmetic; clamps to >= 1 valid frame
    so all-padding rows (batch fill, weight 0) stay finite through the pool.
    """
    n = encoder_arch.num_frames(jnp.maximum(lengths, 1))
    if intent_arch is not None:
        n = enc.frames_through(intent_arch.layers, n)
    n = jnp.clip(n, 1, t_frames)
    return jnp.arange(t_frames)[None, :] < n[:, None]


def intent_loss_acc(logits, y_intent, values_per_slot, weights=None):
    """Per-slot CE summed + all-slots-correct accuracy (models.py:811-821).

    ``weights`` (B,) marks real vs batch-padding examples (see loader.py);
    losses/metrics are weighted means over real examples.
    """
    w = jnp.ones((logits.shape[0],), jnp.float32) if weights is None else weights
    denom = jnp.maximum(w.sum(), 1.0)
    loss = 0.0
    correct = None
    start = 0
    for slot, n in enumerate(values_per_slot):
        sub = logits[:, start : start + n]
        logp = jax.nn.log_softmax(sub, axis=-1)
        nll = -jnp.take_along_axis(logp, y_intent[:, slot : slot + 1], axis=1)[:, 0]
        loss = loss + (nll * w).sum() / denom
        ok = jnp.argmax(sub, axis=1) == y_intent[:, slot]
        correct = ok if correct is None else (correct & ok)
        start += n
    acc = (correct.astype(jnp.float32) * w).sum() / denom
    return loss, acc


def intent_predictions(logits, values_per_slot):
    """Per-slot argmax -> (B, num_slots) int32."""
    preds = []
    start = 0
    for n in values_per_slot:
        preds.append(jnp.argmax(logits[:, start : start + n], axis=1))
        start += n
    return jnp.stack(preds, axis=1)


# ---------------------------------------------------------------------------
# Seq2seq head (reference models.py:381-651)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Seq2SeqArch:
    num_labels: int
    num_encoder_layers: int
    encoder_dim: int
    num_decoder_layers: int
    decoder_dim: int
    key_dim: int
    value_dim: int
    sos: int
    max_decode_len: int = 200  # reference true_U, models.py:576
    # The reference hardcodes p=0.5 in Seq2SeqEncoder/DecoderRNN
    # (models.py:403,454); config extension seq2seq_dropout overrides.
    dropout: float = 0.5
    # Reference BUG preserved by default: teacher-forced training feeds a
    # one-hot SOS at u=0 (models.py:536-538) while beam inference feeds an
    # all-zeros vector (models.py:600) — the first decode step is the only
    # one whose input distribution differs between train and decode, and on
    # tasks where the first token carries real information it decodes as
    # the marginal mode (measured: the synthetic demo's action slot stayed
    # mode-collapsed across four otherwise-converging runs). Config
    # extension seq2seq_zeros_start=True trains u=0 with the same zeros
    # vector inference uses.
    zeros_start: bool = False

    @staticmethod
    def from_config(config, sos: int, num_labels: int) -> "Seq2SeqArch":
        return Seq2SeqArch(
            num_labels=num_labels,
            num_encoder_layers=config.num_intent_encoder_layers,
            encoder_dim=config.intent_encoder_dim,
            num_decoder_layers=config.num_intent_decoder_layers,
            decoder_dim=config.intent_decoder_dim,
            key_dim=config.intent_decoder_key_dim,
            value_dim=config.intent_decoder_value_dim,
            sos=sos,
            max_decode_len=getattr(config, "seq2seq_max_decode_len", 200),
            dropout=getattr(config, "seq2seq_dropout", 0.5),
            zeros_start=getattr(config, "seq2seq_zeros_start", False),
        )


def init_seq2seq_params(key, arch: Seq2SeqArch, in_dim: int) -> dict:
    k_enc, k_emb, k_att, k_rnn, k_lin, k_init = jax.random.split(key, 6)
    # Encoder: ModuleList [gru, select, dropout] per layer -> gru at 3*idx
    enc_params: dict[str, Any] = {}
    d = in_dim
    for idx in range(arch.num_encoder_layers):
        k_enc, sub = jax.random.split(k_enc)
        enc_params[str(3 * idx)] = ops.gru_init(sub, d, arch.encoder_dim, bidirectional=True)
        d = arch.encoder_dim * 2
    # DecoderRNN: ModuleList [cell, dropout] per layer -> cell at 2*idx
    rnn_params: dict[str, Any] = {}
    cell_in = arch.decoder_dim + arch.value_dim  # embedding + context
    for idx in range(arch.num_decoder_layers):
        k_rnn, sub = jax.random.split(k_rnn)
        rnn_params[str(2 * idx)] = ops.gru_init(sub, cell_in, arch.decoder_dim, False)["fwd"]
        cell_in = arch.decoder_dim
    return {
        "encoder": enc_params,
        "decoder": {
            "embed": _linear_init(k_emb, arch.num_labels, arch.decoder_dim),
            "attention": attention_init(
                k_att, arch.encoder_dim * 2, arch.decoder_dim, arch.key_dim, arch.value_dim
            ),
            "rnn": rnn_params,
            "initial_state": jax.random.normal(
                k_init, (arch.num_decoder_layers, arch.decoder_dim), jnp.float32
            ),
            "linear": _linear_init(k_lin, arch.decoder_dim, arch.num_labels),
        },
    }


def seq2seq_encode(params, arch: Seq2SeqArch, feats, *, train=False, rng=None, gru_impl="scan",
                   n_frames=None):
    """Seq2SeqEncoder: N x [bi-GRU -> dropout 0.5] (models.py:386-411).

    ``n_frames`` (B,) valid feature frames selects the length-exact GRU path
    (backward direction runs over the per-example-reversed valid prefix).
    """
    out = feats
    for idx in range(arch.num_encoder_layers):
        if n_frames is not None:
            out = ops.gru_apply_masked(params[str(3 * idx)], out, n_frames, impl=gru_impl)
        else:
            out = ops.gru_apply(params[str(3 * idx)], out, impl=gru_impl)
        if train and rng is not None and arch.dropout > 0.0:
            rng, sub = jax.random.split(rng)
            keep_p = 1.0 - arch.dropout  # bernoulli draws match the
            keep = jax.random.bernoulli(sub, keep_p, out.shape)  # 0.5 default
            out = jnp.where(keep, out / keep_p, 0.0)
    return out


def _decoder_step(dec_params, arch: Seq2SeqArch, enc_kv, state, y_prev, *, train=False, rng=None,
                  enc_mask=None):
    """One decode step: attend -> embed -> stacked GRUCells -> log-softmax.

    state: (B, num_layers, H); y_prev: (B, num_labels) one-hot (or zeros);
    ``enc_kv``: precomputed (keys, values) from :func:`attention_kv` — the
    projections are loop-invariant, so callers hoist them out of the scan.
    ``enc_mask`` (B, T) excludes padded encoder frames from attention.
    Returns (new_state, logp (B, num_labels)).
    """
    keys, values = enc_kv
    context = attend_kv(dec_params["attention"], keys, values, state[:, -1], mask=enc_mask)
    emb = y_prev @ dec_params["embed"]["w"] + dec_params["embed"]["b"]
    h_in = jnp.concatenate([emb, context], axis=1)
    new_states = []
    for li in range(arch.num_decoder_layers):
        h = ops.gru_cell_step(dec_params["rnn"][str(2 * li)], h_in, state[:, li])
        new_states.append(h)
        h_in = h
        if train and rng is not None and arch.dropout > 0.0:
            # inter-layer dropout, p=0.5 default (models.py:454)
            rng, sub = jax.random.split(rng)
            keep_p = 1.0 - arch.dropout
            keep = jax.random.bernoulli(sub, keep_p, h_in.shape)
            h_in = jnp.where(keep, h_in / keep_p, 0.0)
    new_state = jnp.stack(new_states, axis=1)
    logits = new_state[:, -1] @ dec_params["linear"]["w"] + dec_params["linear"]["b"]
    return new_state, jax.nn.log_softmax(logits, axis=1)


def seq2seq_log_prob(params, arch: Seq2SeqArch, feats, y_onehot, *, train=False, rng=None,
                     gru_impl="scan", enc_mask=None, num_steps=None, batched=True):
    """Teacher-forced log p(y|x) per example (models.py:515-556).

    y_onehot: (B, U, num_labels), EOS-padded one-hot targets. ``num_steps``
    (traced scalar) excludes decode steps u >= num_steps from the sum: the
    loader EOS-pads labels to a bucket boundary, and masking past the batch's
    true max label length keeps the loss scale exactly the reference's
    pad-to-batch-max behavior regardless of bucketing.

    ``batched=True`` (default) exploits teacher forcing: every step's
    embedding input is known up front and every step's output projection
    only depends on that step's top state, so both leave the scan — one
    (B,U,L)@(L,E) matmul before it and one (U,B,H)@(H,L) + batched
    log-softmax after it, MXU-shaped, instead of 2·U small in-scan ops
    (which the backward pass would also unroll). Only the genuinely
    sequential attention + GRUCell chain stays in the scan. Same math and
    the same per-step dropout RNG draws as the reference-shaped per-step
    path (``batched=False``, kept as the A/B control; ref models.py:515-556
    recomputes embed/projection inside its Python step loop).
    """
    enc_out = seq2seq_encode(params["encoder"], arch, feats, train=train, rng=rng, gru_impl=gru_impl)
    dec = params["decoder"]
    enc_kv = attention_kv(dec["attention"], enc_out)  # hoisted out of the scan
    B, U, L = y_onehot.shape
    state0 = jnp.broadcast_to(dec["initial_state"][None], (B,) + dec["initial_state"].shape)
    # u=0 input: one-hot SOS (reference models.py:536-538). With
    # arch.zeros_start, the zeros vector beam inference feeds instead
    # (models.py:600) — see the Seq2SeqArch field note.
    y_sos = (jnp.zeros((B, L), jnp.float32) if arch.zeros_start
             else jax.nn.one_hot(jnp.full((B,), arch.sos), L, dtype=jnp.float32))

    y_steps = jnp.swapaxes(y_onehot, 0, 1)  # (U, B, L)
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    if batched:
        # Teacher-forced inputs: step u embeds y_{u-1} (y_sos at u=0).
        y_prev = jnp.concatenate([y_sos[:, None], y_onehot[:, :-1]], axis=1)
        embs = y_prev @ dec["embed"]["w"] + dec["embed"]["b"]  # (B, U, E)
        embs = jnp.swapaxes(embs, 0, 1)  # (U, B, E)
        keys, values = enc_kv

        def body_batched(state, inp):
            emb_u, u = inp
            step_rng = jax.random.fold_in(base_rng, u) if train else None
            context = attend_kv(dec["attention"], keys, values, state[:, -1],
                                mask=enc_mask)
            h_in = jnp.concatenate([emb_u, context], axis=1)
            new_states = []
            for li in range(arch.num_decoder_layers):
                h = ops.gru_cell_step(dec["rnn"][str(2 * li)], h_in, state[:, li])
                new_states.append(h)
                h_in = h
                if train and step_rng is not None and arch.dropout > 0.0:
                    # same draws as _decoder_step
                    step_rng, sub = jax.random.split(step_rng)
                    keep_p = 1.0 - arch.dropout
                    keep = jax.random.bernoulli(sub, keep_p, h_in.shape)
                    h_in = jnp.where(keep, h_in / keep_p, 0.0)
            new_state = jnp.stack(new_states, axis=1)
            return new_state, new_state[:, -1]

        _, tops = jax.lax.scan(body_batched, state0, (embs, jnp.arange(U)))
        logits = tops @ dec["linear"]["w"] + dec["linear"]["b"]  # (U, B, L)
        step_lp = (jax.nn.log_softmax(logits, axis=2) * y_steps).sum(axis=2)
        if num_steps is not None:
            step_lp = jnp.where(jnp.arange(U)[:, None] < num_steps, step_lp, 0.0)
        return step_lp.sum(axis=0)

    def body(carry, inp):
        state, y_prev, acc = carry
        y_u, u = inp
        step_rng = jax.random.fold_in(base_rng, u) if train else None
        state, logp = _decoder_step(
            dec, arch, enc_kv, state, y_prev, train=train, rng=step_rng, enc_mask=enc_mask
        )
        step_lp = (logp * y_u).sum(axis=1)
        if num_steps is not None:
            step_lp = jnp.where(u < num_steps, step_lp, 0.0)
        acc = acc + step_lp
        return (state, y_u, acc), None

    (_, _, log_p), _ = jax.lax.scan(
        body, (state0, y_sos, jnp.zeros((B,), jnp.float32)), (y_steps, jnp.arange(U))
    )
    return log_p


def seq2seq_beam_infer(params, arch: Seq2SeqArch, feats, beam_width: int = 4, *, gru_impl="scan",
                       enc_mask=None, n_frames=None):
    """Beam-search decode. Returns (scores (beam, B), tokens (beam, B, U)).

    On TPU with lane-aligned decoder dims the whole search runs as ONE fused
    Pallas kernel (``ops/pallas_beam.py``: weights, beam states, top-k and
    hypothesis reordering all VMEM-resident) — same search semantics as the
    XLA scan below, parity-pinned by tests/test_pallas_beam.py. Opt out with
    ``TPU_SLU_BEAM_FUSED=0``.
    """
    enc_out = seq2seq_encode(
        params["encoder"], arch, feats, train=False, gru_impl=gru_impl, n_frames=n_frames
    )
    dec = params["decoder"]
    enc_kv = attention_kv(dec["attention"], enc_out)  # hoisted out of the decode loop
    B = feats.shape[0]

    from tpu_slu.ops.pallas_beam import beam_decode_pallas, beam_pallas_enabled

    if beam_pallas_enabled(arch, B, n_enc_frames=enc_out.shape[1],
                           beam_width=beam_width):
        return beam_decode_pallas(
            dec, arch, enc_kv[0], enc_kv[1], beam_width, arch.max_decode_len,
            enc_mask=enc_mask,
        )

    state0 = jnp.broadcast_to(dec["initial_state"][None], (B,) + dec["initial_state"].shape)

    def step_fn(state, y_prev):
        return _decoder_step(dec, arch, enc_kv, state, y_prev, train=False, enc_mask=enc_mask)

    return beam_search(
        step_fn, state0, B, arch.num_labels, arch.max_decode_len, beam_width
    )


# ---------------------------------------------------------------------------
# ULMFiT unfreezing schedule -> trainable masks
# ---------------------------------------------------------------------------


def _walk_unfrozen(arch: EncoderArch, unfreezing_type: int, count: int) -> set:
    """Set of (group, index) param layers unfrozen after the reference's walk
    from the end of word_layers backwards (models.py:754-795) has unfrozen
    ``count`` trainable layers."""
    unfrozen: set = set()
    if unfreezing_type == 0 or count <= 0:
        return unfrozen
    trainable = 0
    for spec in reversed(arch.word_layers):
        if spec.kind in PARAM_KINDS:
            unfrozen.add(("word_layers", spec.index))
            trainable += 1
            if trainable == count:
                return unfrozen
    if unfreezing_type == 2:
        for spec in reversed(arch.phoneme_layers):
            if spec.kind in PARAM_KINDS:
                unfrozen.add(("phoneme_layers", spec.index))
                trainable += 1
                if trainable == count:
                    return unfrozen
    return unfrozen


def _num_walkable(arch: EncoderArch, unfreezing_type: int) -> int:
    n = sum(1 for s in arch.word_layers if s.kind in PARAM_KINDS)
    if unfreezing_type == 2:
        n += sum(1 for s in arch.phoneme_layers if s.kind in PARAM_KINDS)
    return n


def encoder_trainable_mask(params_encoder, arch: EncoderArch, frozen: bool,
                           unfreezing_type: int, unfrozen_count: int):
    """0/1 mask pytree over the *encoder* params.

    ``phoneme_linear``/``word_linear`` live outside the frozen ModuleLists in
    the reference (``freeze_all_layers`` models.py:738-742 only touches
    phoneme_layers/word_layers) so they are always trainable.
    """
    if not frozen:
        return jax.tree.map(lambda _: 1.0, params_encoder)
    unfrozen = _walk_unfrozen(arch, unfreezing_type, unfrozen_count)
    mask = {}
    for group in ("phoneme_layers", "word_layers"):
        mask[group] = {}
        for idx, sub in params_encoder[group].items():
            val = 1.0 if (group, int(idx)) in unfrozen else 0.0
            mask[group][idx] = jax.tree.map(lambda _: val, sub)
    for lin in ("phoneme_linear", "word_linear"):
        mask[lin] = jax.tree.map(lambda _: 1.0, params_encoder[lin])
    return mask


# ---------------------------------------------------------------------------
# Facade
# ---------------------------------------------------------------------------


class Model:
    """End-to-end SLU model facade (reference ``Model``, models.py:653-875)."""

    def __init__(self, config, seed: int | None = None, load_pretrained: bool = True):
        self.config = config
        self.Sy_intent = config.require("Sy_intent")
        self.seq2seq = config.seq2seq
        self.unfreezing_type = config.unfreezing_type
        self.unfreezing_index = config.starting_unfreezing_index
        self._unfrozen_count = 0
        self._frozen_base = config.pretraining_type != 0

        self.encoder_arch = EncoderArch.from_config(config)
        key = jax.random.PRNGKey(config.seed if seed is None else seed)
        k_enc, k_head = jax.random.split(key)
        encoder_params = enc.init_encoder_params(k_enc, self.encoder_arch)

        in_dim = self.encoder_arch.word_feat_dim
        if not self.seq2seq:
            self.intent_arch = IntentArch.from_config(config, in_dim)
            self.values_per_slot = self.intent_arch.values_per_slot
            self.num_values_total = sum(self.values_per_slot)
            head_params = {"intent_layers": init_intent_params(k_head, self.intent_arch)}
        else:
            self.SOS = self.Sy_intent.index("<sos>")
            self.num_labels = len(self.Sy_intent)
            self.seq2seq_arch = Seq2SeqArch.from_config(config, self.SOS, self.num_labels)
            head_params = init_seq2seq_params(k_head, self.seq2seq_arch, in_dim)

        self.params = {"pretrained_model": encoder_params, **head_params}

        # Load the pre-trained encoder (reference models.py:661-667): native
        # .npz checkpoint preferred, PyTorch .pth supported.
        # ``load_pretrained=False`` skips it (e.g. when a full SLU checkpoint
        # will be restored on top anyway).
        if config.pretraining_type != 0 and load_pretrained:
            from tpu_slu.training import checkpoint as ckpt

            pre_dir = os.path.join(config.folder, "pretraining")
            npz = os.path.join(pre_dir, "model_state.npz")
            orbax_dir = os.path.join(pre_dir, "model_state.orbax")
            pth = os.path.join(pre_dir, "model_state.pth")
            if os.path.isfile(npz):
                self.params["pretrained_model"] = ckpt.load_pytree(
                    npz, self.params["pretrained_model"]
                )
            elif os.path.isdir(orbax_dir):
                self.params["pretrained_model"] = ckpt.load_pytree_orbax(
                    orbax_dir, self.params["pretrained_model"]
                )
            elif os.path.isfile(pth):
                from tpu_slu.models.torch_import import import_pretrained_state_dict

                self.params["pretrained_model"] = import_pretrained_state_dict(
                    pth, self.encoder_arch
                )
            else:
                raise FileNotFoundError(
                    f"pretraining_type={config.pretraining_type} but no checkpoint at "
                    f"{npz}, {orbax_dir} or {pth}; run --pretrain first or set "
                    "pretraining_type=0"
                )

        self._build_jits()

    # -- jitted pure cores --------------------------------------------------

    def _build_jits(self):
        from tpu_slu.ops.gru import resolve_gru_impl

        earch = self.encoder_arch
        impl = resolve_gru_impl(self.config)
        # Optional knob: a different forward time block for inference-only
        # traces (config infer_time_block). A/B on hardware showed no stable
        # win over the training-tuned default, so it stays at TIME_BLOCK.
        infer_tb = getattr(self.config, "infer_time_block", None)
        impl_infer = f"pallas:{infer_tb}" if (impl == "pallas" and infer_tb) else impl

        mask_padding = getattr(self.config, "mask_padding", True)
        # Train-mode facade forward: the reference's Model.forward applies
        # dropout under model.train() (ref models.py:797-828); a manual-loop
        # user porting that over this facade gets the same semantics via
        # forward(..., training=True). RNG is derived in-jit from a step
        # index (same pattern as the Trainer).
        base_rng = jax.random.key(
            self.config.seed, impl=getattr(self.config, "prng_impl", "rbg")
        )

        if not self.seq2seq:
            iarch = self.intent_arch

            def fwd(params, x, y_intent):
                feats = enc.encoder_features(params["pretrained_model"], earch, x, gru_impl=impl)
                logits = intent_logits(params["intent_layers"], iarch, feats, gru_impl=impl)
                return intent_loss_acc(logits, y_intent, iarch.values_per_slot)

            def fwd_train(params, x, y_intent, step):
                rng = jax.random.fold_in(base_rng, step)
                r1, r2 = jax.random.split(rng)
                feats = enc.encoder_features(
                    params["pretrained_model"], earch, x, train=True, rng=r1,
                    gru_impl=impl,
                )
                logits = intent_logits(
                    params["intent_layers"], iarch, feats, train=True, rng=r2,
                    gru_impl=impl,
                )
                return intent_loss_acc(logits, y_intent, iarch.values_per_slot)

            def predict(params, x, lengths):
                feats = enc.encoder_features(
                    params["pretrained_model"], earch, x, gru_impl=impl_infer
                )
                fm = None
                if mask_padding:
                    t_out = enc.frames_through(iarch.layers, feats.shape[1])
                    fm = frame_mask_from_lengths(earch, lengths, t_out, iarch)
                logits = intent_logits(
                    params["intent_layers"], iarch, feats, gru_impl=impl_infer, frame_mask=fm
                )
                return logits, intent_predictions(logits, iarch.values_per_slot)

            def predict_exact(params, x, lengths):
                # Length-exact path: per-example results are bit-equal to
                # running each example at its exact shape (see
                # encoder_features lengths= docs).
                feats = enc.encoder_features(
                    params["pretrained_model"], earch, x, gru_impl=impl_infer, lengths=lengths
                )
                logits = intent_logits(
                    params["intent_layers"], iarch, feats, gru_impl=impl_infer,
                    n_frames=earch.num_frames(lengths),
                )
                return logits, intent_predictions(logits, iarch.values_per_slot)

            self._jit_forward = jax.jit(fwd)
            self._jit_forward_train = jax.jit(fwd_train)
            self._jit_predict = jax.jit(predict)
            self._jit_predict_exact = jax.jit(predict_exact)
        else:
            sarch = self.seq2seq_arch

            def fwd(params, x, y_onehot):
                feats = enc.encoder_features(params["pretrained_model"], earch, x, gru_impl=impl)
                log_p = seq2seq_log_prob(params, sarch, feats, y_onehot, gru_impl=impl)
                return -log_p.mean(), jnp.zeros((), jnp.float32)

            def fwd_train(params, x, y_onehot, step):
                rng = jax.random.fold_in(base_rng, step)
                r1, r2 = jax.random.split(rng)
                feats = enc.encoder_features(
                    params["pretrained_model"], earch, x, train=True, rng=r1,
                    gru_impl=impl,
                )
                log_p = seq2seq_log_prob(
                    params, sarch, feats, y_onehot, train=True, rng=r2, gru_impl=impl
                )
                return -log_p.mean(), jnp.zeros((), jnp.float32)

            def infer(params, x, lengths, beam_width):
                feats = enc.encoder_features(
                    params["pretrained_model"], earch, x, gru_impl=impl_infer
                )
                enc_mask = (
                    frame_mask_from_lengths(earch, lengths, feats.shape[1])
                    if mask_padding else None
                )
                return seq2seq_beam_infer(
                    params, sarch, feats, beam_width, gru_impl=impl_infer, enc_mask=enc_mask
                )

            def infer_exact(params, x, lengths, beam_width):
                feats = enc.encoder_features(
                    params["pretrained_model"], earch, x, gru_impl=impl_infer, lengths=lengths
                )
                n = earch.num_frames(lengths)
                enc_mask = frame_mask_from_lengths(earch, lengths, feats.shape[1])
                return seq2seq_beam_infer(
                    params, sarch, feats, beam_width, gru_impl=impl_infer,
                    enc_mask=enc_mask, n_frames=n,
                )

            self._jit_forward = jax.jit(fwd)
            self._jit_forward_train = jax.jit(fwd_train)
            self._jit_infer = jax.jit(infer, static_argnums=3)
            self._jit_infer_exact = jax.jit(infer_exact, static_argnums=3)

    # -- reference API --------------------------------------------------------

    def forward(self, x, y_intent, training: bool = False):
        """(loss, acc) for a batch — reference ``Model.forward``
        (models.py:797-828). ``training=True`` applies dropout (the
        reference's ``model.train()`` mode); default eval mode does not.
        The Trainer's own loss closures always train with dropout — this
        flag exists for manual-loop users of the facade."""
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y_intent, jnp.float32 if self.seq2seq else jnp.int32)
        if training:
            self._forward_step = getattr(self, "_forward_step", 0) + 1
            return self._jit_forward_train(
                self.params, x, y, np.int32(self._forward_step)
            )
        return self._jit_forward(self.params, x, y)

    __call__ = forward

    def predict_intents(self, x, bucket: bool = False, beam_width: int = 4, lengths=None):
        """Waveform(s) -> predictions.

        Default is bit-exact reference behavior (one compiled shape per input
        length). Two padding-aware modes share the *length-exact* compiled
        path (per-example results bit-equal to exact-shape runs — padding
        never leaks into convs, pools, GRU directions, or attention):

        * ``lengths=`` (B,) true sample counts for an already-padded batch
          (e.g. a loader bucket batch; ``Trainer.test`` passes ``batch["len"]``).
        * ``bucket=True`` zero-pads raw input(s) up to a 0.5 s bucket boundary
          so arbitrary-length wavs reuse a handful of compiled shapes
          (production serving mode).
        """
        x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        exact = lengths is not None
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
        else:
            lengths = jnp.asarray(lengths, jnp.int32)
        if bucket:
            from tpu_slu.data.loader import pad_to_bucket

            t_pad = pad_to_bucket(x.shape[1], 8000)
            if t_pad != x.shape[1]:
                x = np.pad(x, ((0, 0), (0, t_pad - x.shape[1])))
            exact = True
        if exact and not getattr(self.config, "mask_padding", True):
            exact = False  # strict reference emulation: let padding leak
        x = jnp.asarray(x)
        if not self.seq2seq:
            fn = self._jit_predict_exact if exact else self._jit_predict
            return fn(self.params, x, lengths)
        # beam_width=4 matches the reference default (models.py:850);
        # beam_width=1 is greedy decoding.
        fn = self._jit_infer_exact if exact else self._jit_infer
        return fn(self.params, x, lengths, beam_width)

    def decode_intents(self, x, bucket: bool = False, lengths=None):
        """Waveform(s) -> intent strings (reference models.py:853-874).

        ``lengths=`` (B,) true sample counts enables the length-exact path
        for padded batches (see ``predict_intents``).
        """
        _, predicted = self.predict_intents(x, bucket=bucket, lengths=lengths)
        if not self.seq2seq:
            predicted = np.asarray(predicted)
            intents = []
            for prediction in predicted:
                intent = []
                for idx, slot in enumerate(self.Sy_intent):
                    for value in self.Sy_intent[slot]:
                        if prediction[idx] == self.Sy_intent[slot][value]:
                            intent.append(value)
                intents.append(intent)
            return intents
        tokens = np.asarray(predicted)  # (beam, batch, U)
        return [self.ids_to_string(tokens[0, i], self.Sy_intent) for i in range(tokens.shape[1])]

    @staticmethod
    def ids_to_string(ids, S):
        """Token ids -> string with the reference's strip quirk
        (``.lstrip("<sos>").rstrip("<eos>")`` strips by *character set*,
        models.py:730-736) preserved for output parity."""
        return "".join(S[int(c)] for c in ids).lstrip("<sos>").rstrip("<eos>")

    def one_hot_to_string(self, one_hot_seq, S):
        ids = np.asarray(one_hot_seq).argmax(axis=-1)
        return self.ids_to_string(ids, S)

    # -- freezing -------------------------------------------------------------

    def freeze_all_layers(self):
        self._frozen_base = True
        self._unfrozen_count = 0

    def unfreeze_one_layer(self):
        """Advance the ULMFiT schedule one epoch (models.py:754-795)."""
        if self.unfreezing_type == 0:
            return
        total = _num_walkable(self.encoder_arch, self.unfreezing_type)
        self._unfrozen_count = min(self.unfreezing_index, total)
        if self.unfreezing_index <= total:
            self.unfreezing_index += 1

    def trainable_mask(self):
        """0/1 pytree matching ``self.params``: 1 = trainable now."""
        enc_mask = encoder_trainable_mask(
            self.params["pretrained_model"], self.encoder_arch,
            self._frozen_base, self.unfreezing_type, self._unfrozen_count,
        )
        mask = {"pretrained_model": enc_mask}
        for k, v in self.params.items():
            if k != "pretrained_model":
                mask[k] = jax.tree.map(lambda _: 1.0, v)
        return mask

    def print_frozen(self):
        unfrozen = _walk_unfrozen(self.encoder_arch, self.unfreezing_type, self._unfrozen_count)
        for group in ("phoneme_layers", "word_layers"):
            for spec in getattr(self.encoder_arch, group):
                if spec.kind in PARAM_KINDS:
                    state = (
                        "unfrozen"
                        if (not self._frozen_base or (group, spec.index) in unfrozen)
                        else "frozen"
                    )
                    print(f"{spec.name}: {state}")

    # -- checkpoint I/O ---------------------------------------------------------

    def load_torch_state_dict(self, path_or_state):
        from tpu_slu.models.torch_import import import_model_state_dict

        self.params = import_model_state_dict(
            path_or_state,
            self.encoder_arch,
            intent_arch=None if self.seq2seq else self.intent_arch,
            seq2seq_arch=self.seq2seq_arch if self.seq2seq else None,
        )
        return self

    def vocab_dict(self) -> dict:
        """JSON-serializable inference vocab (enables dataset-free decode)."""
        return {
            "seq2seq": self.seq2seq,
            "Sy_intent": self.Sy_intent,
            "values_per_slot": None if self.seq2seq else list(self.values_per_slot),
            "num_phonemes": self.encoder_arch.num_phonemes,
        }

    @staticmethod
    def attach_vocab(config, vocab: dict):
        """Apply a saved vocab dict to a config (instead of get_SLU_datasets)."""
        config.Sy_intent = vocab["Sy_intent"]
        config.num_phonemes = vocab["num_phonemes"]
        if not vocab["seq2seq"]:
            config.values_per_slot = vocab["values_per_slot"]
        return config

    def load_native_checkpoint(self, path):
        from tpu_slu.training import checkpoint as ckpt

        self.params = ckpt.load_pytree(path, self.params)
        return self

    def eval(self):  # reference API no-ops under the functional design
        return self

    def train(self):
        return self
