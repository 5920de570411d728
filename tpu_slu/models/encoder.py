"""ASR pre-training encoder: SincNet/conv front-end + hierarchical bi-GRUs.

Rebuild of the reference ``PretrainedModel`` (reference ``models.py:170-361``)
as a declarative :class:`EncoderArch` + pure ``init``/``apply`` functions.

The architecture is a flat list of layer specs whose ``index`` fields mirror
the reference's ``torch.nn.ModuleList`` construction order exactly
(``models.py:180-286``), so PyTorch ``model_state.pth`` keys such as
``phoneme_layers.14.weight_ih_l0`` map directly onto our param tree
(``params["phoneme_layers"]["14"]["fwd"]["w_ih"]``). See SURVEY.md §2 for the
full key layout.

Default-config stack (no_unfreezing.cfg): sinc(1→80, k401, s80) + |·| + pool2;
conv(80→60, k5) ×2; two bi-GRU(→2×128) + avg-pool-2 stages → 25 Hz phoneme
frames; two more bi-GRU + avg-pool-2 stages → 6.25 Hz word frames. ~3.66 M
params.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpu_slu import ops
from tpu_slu.ops.sinc import mel_init, sinc_conv


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    kind: str  # sinc|conv|abs|pool|act|dropout|ncl2nlc|gru|select|downsample
    index: int  # ModuleList position (torch checkpoint key index)
    name: str
    h: tuple  # static hyperparameters, kind-specific


def _conv_block_specs(config, start: int) -> tuple[list[LayerSpec], int]:
    """Front-end conv stack specs, reference models.py:180-225."""
    specs: list[LayerSpec] = []
    i = start
    n_conv = len(config.cnn_N_filt)
    for idx in range(n_conv):
        if idx == 0:
            if config.use_sincnet:
                specs.append(
                    LayerSpec(
                        "sinc", i, f"sinc{idx}",
                        (config.cnn_N_filt[idx], config.cnn_len_filt[idx], config.fs,
                         config.cnn_stride[idx], config.cnn_len_filt[idx] // 2),
                    )
                )
            else:
                specs.append(
                    LayerSpec(
                        "conv", i, f"conv{idx}",
                        (1, config.cnn_N_filt[idx], config.cnn_len_filt[idx],
                         config.cnn_stride[idx], config.cnn_len_filt[idx] // 2),
                    )
                )
            i += 1
            specs.append(LayerSpec("abs", i, f"abs{idx}", ()))
            i += 1
        else:
            specs.append(
                LayerSpec(
                    "conv", i, f"conv{idx}",
                    (config.cnn_N_filt[idx - 1], config.cnn_N_filt[idx],
                     config.cnn_len_filt[idx], config.cnn_stride[idx],
                     config.cnn_len_filt[idx] // 2),
                )
            )
            i += 1
        specs.append(LayerSpec("pool", i, f"pool{idx}", (config.cnn_max_pool_len[idx],)))
        i += 1
        specs.append(LayerSpec("act", i, f"act{idx}", (config.cnn_act[idx],)))
        i += 1
        specs.append(LayerSpec("dropout", i, f"dropout{idx}", (config.cnn_drop[idx],)))
        i += 1
    return specs, i


def _rnn_block_specs(
    prefix: str, start: int, in_dim: int, hiddens, drops, ds_types, ds_lens, bidirectional
) -> tuple[list[LayerSpec], int, int]:
    """bi-GRU -> select -> dropout -> downsample blocks, models.py:230-285."""
    specs: list[LayerSpec] = []
    i = start
    out_dim = in_dim
    for idx, hidden in enumerate(hiddens):
        specs.append(LayerSpec("gru", i, f"{prefix}_rnn{idx}", (out_dim, hidden, bidirectional)))
        i += 1
        out_dim = hidden * (2 if bidirectional else 1)
        specs.append(LayerSpec("select", i, f"{prefix}_rnn_select{idx}", ()))
        i += 1
        specs.append(LayerSpec("dropout", i, f"{prefix}_dropout{idx}", (drops[idx],)))
        i += 1
        specs.append(LayerSpec("downsample", i, f"{prefix}_downsample{idx}", (ds_types[idx], ds_lens[idx])))
        i += 1
    return specs, i, out_dim


@dataclasses.dataclass(frozen=True)
class EncoderArch:
    """Static architecture description derived from a Config."""

    phoneme_layers: tuple[LayerSpec, ...]
    word_layers: tuple[LayerSpec, ...]
    phoneme_feat_dim: int  # output dim after phoneme_layers
    word_feat_dim: int  # output dim after word_layers
    num_phonemes: int
    vocabulary_size: int
    pretraining_type: int

    @staticmethod
    def from_config(config) -> "EncoderArch":
        conv_specs, i = _conv_block_specs(config, 0)
        conv_specs.append(LayerSpec("ncl2nlc", i, "ncl2nlc", ()))
        i += 1
        rnn_specs, i, phone_dim = _rnn_block_specs(
            "phone", i, config.cnn_N_filt[-1],
            config.phone_rnn_num_hidden, config.phone_rnn_drop,
            config.phone_downsample_type, config.phone_downsample_len,
            config.phone_rnn_bidirectional,
        )
        word_specs, _, word_dim = _rnn_block_specs(
            "word", 0, phone_dim,
            config.word_rnn_num_hidden, config.word_rnn_drop,
            config.word_downsample_type, config.word_downsample_len,
            config.word_rnn_bidirectional,
        )
        return EncoderArch(
            phoneme_layers=tuple(conv_specs + rnn_specs),
            word_layers=tuple(word_specs),
            phoneme_feat_dim=phone_dim,
            word_feat_dim=word_dim,
            num_phonemes=int(config.require("num_phonemes")),
            vocabulary_size=config.vocabulary_size,
            pretraining_type=config.pretraining_type,
        )

    def param_layer_specs(self):
        """(group, spec) for every spec that owns parameters, in order."""
        for group, specs in (("phoneme_layers", self.phoneme_layers), ("word_layers", self.word_layers)):
            for s in specs:
                if s.kind in ("sinc", "conv", "gru"):
                    yield group, s

    def num_frames(self, t, upto: str = "word"):
        """Exact output frame count for a waveform of ``t`` samples.

        Walks the layer chain's length arithmetic (conv floor, ceil-mode
        pools, ceil downsamples). ``t`` may be a traced integer array, so
        ceil-divisions use arithmetic, not Python math.
        """
        specs = self.phoneme_layers if upto == "phoneme" else (
            self.phoneme_layers + self.word_layers
        )
        return frames_through(specs, t)


def frames_through(specs, t):
    """Length arithmetic for a LayerSpec chain (traced-friendly)."""
    for spec in specs:
        if spec.kind in ("sinc", "conv"):
            if spec.kind == "sinc":
                _, k, _, stride, pad = spec.h
            else:
                _, _, k, stride, pad = spec.h
            t = (t + 2 * pad - k) // stride + 1
        elif spec.kind == "pool":
            t = -(-t // spec.h[0])
        elif spec.kind == "downsample":
            method, factor = spec.h
            if factor > 1:
                t = -(-t // factor)
    return t


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _linear_init(key, in_dim: int, out_dim: int):
    """torch Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for w and b."""
    bound = 1.0 / np.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def _conv_init(key, spec: LayerSpec):
    cin, cout, k, _, _ = spec.h
    bound = 1.0 / np.sqrt(cin * k)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (cout, cin, k), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _layer_init(key, spec: LayerSpec):
    if spec.kind == "sinc":
        n_filt, _, fs, _, _ = spec.h
        b1, band = mel_init(n_filt, fs)
        return {"filt_b1": jnp.asarray(b1), "filt_band": jnp.asarray(band)}
    if spec.kind == "conv":
        return _conv_init(key, spec)
    if spec.kind == "gru":
        in_dim, hidden, bidir = spec.h
        return ops.gru_init(key, in_dim, hidden, bidir)
    raise ValueError(spec.kind)


def init_encoder_params(key, arch: EncoderArch) -> dict:
    params: dict[str, Any] = {"phoneme_layers": {}, "word_layers": {}}
    param_specs = list(arch.param_layer_specs())
    keys = jax.random.split(key, len(param_specs) + 2)
    for k, (group, spec) in zip(keys[:-2], param_specs):
        params[group][str(spec.index)] = _layer_init(k, spec)
    params["phoneme_linear"] = _linear_init(keys[-2], arch.phoneme_feat_dim, arch.num_phonemes)
    params["word_linear"] = _linear_init(keys[-1], arch.word_feat_dim, arch.vocabulary_size)
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _zero_time_tail(out, n, time_axis: int):
    """Zero frames >= n_i along ``time_axis``. n: (B,) per-example counts."""
    t = jnp.arange(out.shape[time_axis])
    if time_axis == 2 or time_axis == -1:
        mask = (t[None, :] < n[:, None])[:, None, :]
    else:  # time_axis == 1
        mask = (t[None, :] < n[:, None])[:, :, None]
    return jnp.where(mask, out, 0.0)


class PartsTM(tuple):
    """Marker type: TIME-MAJOR (T, B, C) part streams between chained
    bidirectional GRU layers (the shared-stream Pallas path). The h_f/h_b
    halves of each layer stay separate arrays — the channel concat between
    stacked GRU layers never materializes in HBM (ops/pallas_gru.py)."""


def _parts_to_btc(parts: PartsTM):
    """Finalize part streams to a single batch-major (B, T, C) array."""
    h = parts[0] if len(parts) == 1 else jnp.concatenate(tuple(parts), axis=-1)
    return jnp.swapaxes(h, 0, 1)


def _downsample_tm(x, method: str, factor: int):
    """``ops.downsample`` semantics on a TIME-MAJOR (T, B, C) array.

    Leading-axis reshape pooling (layout-safe on TPU — never splits the
    minor-most lane dim); torch ceil-mode divisor for avg partial windows.
    """
    if factor == 1:
        return x
    if method == "none":
        return x[::factor]
    t = x.shape[0]
    pad = (-t) % factor
    if method == "max":
        xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)), constant_values=-jnp.inf)
        return xp.reshape(-1, factor, *x.shape[1:]).max(axis=1)
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    sums = xp.reshape(-1, factor, *x.shape[1:]).sum(axis=1)
    if pad == 0:
        return sums / factor
    counts = jnp.full((sums.shape[0], 1, 1), float(factor), x.dtype)
    counts = counts.at[-1].set(float(factor - pad))
    return sums / counts


def _apply_stack(group_params, specs, out, *, train: bool, rng, gru_impl: str,
                 compute_dtype=None, n=None):
    """Run a LayerSpec stack. Conv specs take (B, C, T); RNN specs (B, T, C).

    ``compute_dtype`` (e.g. jnp.bfloat16) casts GRU-layer inputs so the
    Pallas kernels stream half-width gate tensors — the dominant HBM traffic.
    Hidden-state recurrence and losses stay float32.

    ``n`` (B,) int32 enables the *length-exact* path: every op computes as if
    each example were cropped to its own valid extent (samples entering the
    conv stack, frames afterwards) — conv tails zeroed, ceil pools use the
    per-example torch partial-window divisor, bi-GRUs run the backward
    direction over the per-example-reversed prefix. Returns (out, rng, n_out)
    with ``n_out`` the per-example valid frame count of ``out`` (None when
    ``n`` is None).
    """
    masked = n is not None
    from tpu_slu.ops.gru import _pallas_active

    # Shared-stream chain (ops/pallas_gru.py): unmasked bidirectional GRU
    # stacks thread TIME-MAJOR part streams between layers — no flips, no
    # channel concats, and in eval mode the following downsample fuses into
    # the kernel so outputs are written at the pooled rate.
    # "pallas-nochain" selects the processing-order kernels without the
    # chain (A/B escape hatch, tools/bench_ab.py).
    chain = (not masked) and _pallas_active(gru_impl) and "nochain" not in gru_impl
    parts = out if isinstance(out, PartsTM) else None
    if parts is not None:
        out = None
    specs = list(specs)
    idx = 0
    nhc = False  # conv stack running channels-last (fused front-end path)
    while idx < len(specs):
        spec = specs[idx]
        use_chain = (
            chain
            and spec.kind == "gru"
            and "bwd" in group_params[str(spec.index)]
        )
        if parts is not None and not use_chain:
            out = _parts_to_btc(parts)
            parts = None
        idx += 1
        if (
            chain and not train and spec.kind == "sinc"
            and os.environ.get("TPU_SLU_FUSED_FRONTEND") == "1"
            and spec.h[3] > 1 and spec.h[1] > spec.h[3]
            and [s.kind for s in specs[idx:idx + 4]]
            == ["abs", "pool", "act", "dropout"]
        ):
            # fused sinc front end (ops/pallas_frontend.py): conv + |.| +
            # ceil max-pool + act in one kernel, POOLED channels-last
            # output — the full-rate (B, F, t_out) tensor never hits HBM.
            # dropout is an eval no-op here (this path is eval-only).
            # OPT-IN ONLY: measured 2.3x SLOWER than the XLA composition on
            # the flagship shape (0.307 vs 0.134 ms best, B=128 — the
            # K=stride=80 contraction caps MXU utilization at ~39% and the
            # halo double-stream doubles input reads; docs/KERNELS.md).
            from tpu_slu.ops.pallas_frontend import sinc_frontend_fused

            p = group_params[str(spec.index)]
            _, filt_dim, fs, strd, pad = spec.h
            pool_k = specs[idx + 1].h[0]
            act_name = specs[idx + 2].h[0]
            idx += 4
            out = sinc_frontend_fused(
                p["filt_b1"], p["filt_band"], out[:, 0, :],
                filt_dim=filt_dim, fs=fs, stride=strd, padding=pad,
                pool=pool_k, act=act_name,
            )
            nhc = True
            continue
        if use_chain:
            from tpu_slu.ops.pallas_gru import bigru_apply_shared

            if parts is None:
                parts = PartsTM((jnp.swapaxes(out, 0, 1),))  # (B,T,C)->(T,B,C)
            if compute_dtype is not None:
                parts = PartsTM(p.astype(compute_dtype) for p in parts)
            # rnn blocks are always [gru, select, dropout, downsample]
            # (_rnn_block_specs); consume the trailing three here so the
            # downsample can fuse into the kernel
            nxt = specs[idx:idx + 3]
            if [s.kind for s in nxt] == ["select", "dropout", "downsample"]:
                drop_p = nxt[1].h[0]
                ds_method, ds_len = nxt[2].h
                idx += 3
            else:  # defensive: bare gru
                drop_p, ds_method, ds_len = 0.0, "none", 1
            tb = int(gru_impl.split(":", 1)[1]) if ":" in gru_impl else None
            if train:
                # Fused train path (round 4): dropout (full rate, reference
                # order) + the ceil avg-pool run in the kernel epilogue, so
                # the layer writes pooled streams and its h_prev residuals
                # instead of full-rate outputs plus an XLA shift/dropout/
                # pool chain. TPU_SLU_TRAIN_FUSED_POOL=0 opts out.
                want_pool = (
                    ds_len > 1 and ds_method == "avg"
                    and os.environ.get("TPU_SLU_TRAIN_FUSED_POOL", "1") != "0"
                )
                seed = None
                if want_pool and rng is not None:
                    rng, sub = jax.random.split(rng)
                    seed = jax.random.bits(sub, (1,), jnp.uint32)
                elif want_pool and drop_p == 0.0:  # train w/o rng: no dropout
                    seed = jnp.zeros((1,), jnp.uint32)
            else:
                want_pool = ds_len > 1 and ds_method in ("avg", "max")
                seed = None
            h_f, h_b, pooled = bigru_apply_shared(
                group_params[str(spec.index)], tuple(parts), time_block=tb,
                train=train, pool=ds_len if want_pool else 1,
                pool_method=ds_method,
                drop_p=drop_p if train else 0.0, drop_seed=seed,
            )
            new_parts = [h_f, h_b]
            if train and drop_p > 0.0 and not pooled:
                rng, sub = jax.random.split(rng)
                hdim = h_f.shape[-1]
                keep = jax.random.bernoulli(
                    sub, 1.0 - drop_p, (*h_f.shape[:2], 2 * hdim)
                )
                new_parts = [
                    jnp.where(keep[..., :hdim], h_f / (1.0 - drop_p), 0.0),
                    jnp.where(keep[..., hdim:], h_b / (1.0 - drop_p), 0.0),
                ]
            if not pooled and ds_len > 1:
                new_parts = [_downsample_tm(p, ds_method, ds_len) for p in new_parts]
            parts = PartsTM(new_parts)
            continue
        if spec.kind == "sinc":
            p = group_params[str(spec.index)]
            _, filt_dim, fs, stride, pad = spec.h
            out = sinc_conv(p["filt_b1"], p["filt_band"], out, filt_dim, fs, stride, pad)
            if masked:
                n = (n + 2 * pad - filt_dim) // stride + 1
                out = _zero_time_tail(out, n, 2)
        elif spec.kind == "conv":
            p = group_params[str(spec.index)]
            _, _, k, stride, pad = spec.h
            if nhc:
                out = ops.conv1d_nhc(out, p["w"], p["b"], stride=stride, padding=pad)
            else:
                out = ops.conv1d(out, p["w"], p["b"], stride=stride, padding=pad)
            if masked:
                n = (n + 2 * pad - k) // stride + 1
                out = _zero_time_tail(out, n, 2)
        elif spec.kind == "abs":
            out = jnp.abs(out)
        elif spec.kind == "pool":
            if masked and spec.h[0] > 1:
                out = ops.masked_max_pool1d_ceil(out, spec.h[0], n)
                n = -(-n // spec.h[0])
            elif nhc:
                out = ops.max_pool1d_ceil_nhc(out, spec.h[0])
            else:
                out = ops.max_pool1d_ceil(out, spec.h[0])
        elif spec.kind == "act":
            out = ops.leaky_relu(out, 0.2) if spec.h[0] == "leaky_relu" else jax.nn.relu(out)
        elif spec.kind == "dropout":
            p_drop = spec.h[0]
            if train and p_drop > 0.0:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - p_drop, out.shape)
                out = jnp.where(keep, out / (1.0 - p_drop), 0.0)
        elif spec.kind == "ncl2nlc":
            if chain:
                # feed the chain directly in one transpose to time-major
                # (T, B, C) — from (B, T, C) when the fused front end ran
                # channels-last, from (B, C, T) otherwise (finalized back
                # if the next GRU can't chain)
                perm = (1, 0, 2) if nhc else (2, 0, 1)
                parts = PartsTM((jnp.transpose(out, perm),))
                out = None
                nhc = False
            elif nhc:
                nhc = False  # already (B, T, C)
            else:
                out = jnp.swapaxes(out, 1, 2)  # (B, C, T) -> (B, T, C)
        elif spec.kind == "gru":
            if compute_dtype is not None:
                out = out.astype(compute_dtype)
            if masked:
                out = ops.gru_apply_masked(group_params[str(spec.index)], out, n, impl=gru_impl)
            else:
                out = ops.gru_apply(group_params[str(spec.index)], out, impl=gru_impl)
        elif spec.kind == "select":
            pass  # gru_apply already returns the output sequence
        elif spec.kind == "downsample":
            method, factor = spec.h
            if masked and factor > 1:
                if method == "none":
                    out = out[:, ::factor]
                else:
                    xt = jnp.swapaxes(out, 1, 2)
                    pooled = (
                        ops.masked_max_pool1d_ceil(xt, factor, n)
                        if method == "max"
                        else ops.masked_avg_pool1d_ceil(xt, factor, n)
                    )
                    out = jnp.swapaxes(pooled, 1, 2)
                n = -(-n // factor)
            else:
                out = ops.downsample(out, method, factor, time_axis=1)
        else:
            raise ValueError(spec.kind)
    return (parts if parts is not None else out), rng, n


def encoder_phoneme_features(params, arch: EncoderArch, x, *, train=False, rng=None, gru_impl="scan",
                     compute_dtype=None, lengths=None):
    """x: (B, T) waveform -> (B, T/phone_ds, phoneme_feat_dim) @25 Hz."""
    out = x[:, None, :]
    out, _, _ = _apply_stack(
        params["phoneme_layers"], arch.phoneme_layers, out, train=train, rng=rng,
        gru_impl=gru_impl, compute_dtype=compute_dtype, n=lengths,
    )
    return _parts_to_btc(out) if isinstance(out, PartsTM) else out


def encoder_features(params, arch: EncoderArch, x, *, train=False, rng=None, gru_impl="scan",
                     compute_dtype=None, lengths=None):
    """Full encoder: (B, T) waveform -> (B, T/word_ds, word_feat_dim) @6.25 Hz.

    Equivalent of reference ``PretrainedModel.compute_features`` (models.py:349-361).
    ``lengths`` (B,) waveform sample counts selects the length-exact path: the
    returned features match, frame for frame, what each example would produce
    at its exact shape (padding never leaks into convs, pools, or either GRU
    direction); frames past each example's valid count are zero.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    out = x[:, None, :]
    # PartsTM streams (the shared-kernel chain) pass between the two stacks
    # without materializing the channel concat.
    out, rng, n = _apply_stack(
        params["phoneme_layers"], arch.phoneme_layers, out, train=train, rng=rng,
        gru_impl=gru_impl, compute_dtype=compute_dtype, n=lengths,
    )
    out, _, _ = _apply_stack(
        params["word_layers"], arch.word_layers, out, train=train, rng=rng,
        gru_impl=gru_impl, compute_dtype=compute_dtype, n=n,
    )
    return _parts_to_btc(out) if isinstance(out, PartsTM) else out


def encoder_posteriors(params, arch: EncoderArch, x, *, gru_impl="scan", lengths=None):
    """(phoneme_logits, word_logits) — reference ``compute_posteriors`` (models.py:333-347)."""
    out = x[:, None, :]
    out, _, n = _apply_stack(
        params["phoneme_layers"], arch.phoneme_layers, out, train=False, rng=None,
        gru_impl=gru_impl, n=lengths,
    )
    out_btc = _parts_to_btc(out) if isinstance(out, PartsTM) else out
    phoneme_logits = out_btc @ params["phoneme_linear"]["w"] + params["phoneme_linear"]["b"]
    out, _, _ = _apply_stack(
        params["word_layers"], arch.word_layers, out, train=False, rng=None,
        gru_impl=gru_impl, n=n,
    )
    out = _parts_to_btc(out) if isinstance(out, PartsTM) else out
    word_logits = out @ params["word_linear"]["w"] + params["word_linear"]["b"]
    return phoneme_logits, word_logits


def _masked_frame_ce(logits, y, weights=None):
    """Frame-wise cross-entropy with ignore_index=-1 (reference models.py:312-314).

    logits: (B, T, C), y: (B, T) int32 with -1 = ignore. ``weights`` is an
    optional per-example (B,) float vector; weight-0 rows (multi-host wrapped
    shard duplicates, loader.py) contribute nothing to the loss, the accuracy,
    or the gradient. Returns (mean_loss, accuracy) over valid weighted frames.
    """
    valid = (y != -1).astype(jnp.float32)
    if weights is not None:
        valid = valid * weights.astype(jnp.float32)[:, None]
    y_safe = jnp.where(y != -1, y, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, y_safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1.0)
    loss = (nll * valid).sum() / denom
    pred = jnp.argmax(logits, axis=-1)
    acc = ((pred == y_safe).astype(jnp.float32) * valid).sum() / denom
    return loss, acc


def encoder_loss(params, arch: EncoderArch, x, y_phoneme, y_word, *, train=False, rng=None,
                 gru_impl="scan", compute_dtype=None, weights=None):
    """ASR pre-training losses, reference ``PretrainedModel.forward`` (models.py:291-331).

    Returns (phoneme_loss, word_loss, phoneme_acc, word_acc). Labels are
    frame-aligned at the phoneme (25 Hz) / word (6.25 Hz) rates and padded
    with -1 (ignored). When ``pretraining_type == 1`` the word branch is
    skipped (zeros returned), matching models.py:317-319. ``weights`` is an
    optional per-example (B,) vector: weight-0 rows (wrapped multi-host shard
    duplicates) drop out of the losses/accs/gradient exactly, so the
    trainer's w.sum()-weighted epoch aggregation stays unbiased.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    out = x[:, None, :]
    out, rng, _ = _apply_stack(
        params["phoneme_layers"], arch.phoneme_layers, out, train=train, rng=rng,
        gru_impl=gru_impl, compute_dtype=compute_dtype,
    )
    out_btc = _parts_to_btc(out) if isinstance(out, PartsTM) else out
    # Label streams are host-cropped to the exact frame count; guard against
    # off-by-one between conv ceil lengths and label striding by trimming.
    t = min(out_btc.shape[1], y_phoneme.shape[1])
    phoneme_logits = out_btc[:, :t] @ params["phoneme_linear"]["w"] + params["phoneme_linear"]["b"]
    phoneme_loss, phoneme_acc = _masked_frame_ce(phoneme_logits, y_phoneme[:, :t], weights)

    if arch.pretraining_type == 1:
        zero = jnp.zeros((), jnp.float32)
        return phoneme_loss, zero, phoneme_acc, zero

    out, _, _ = _apply_stack(
        params["word_layers"], arch.word_layers, out, train=train, rng=rng,
        gru_impl=gru_impl, compute_dtype=compute_dtype,
    )
    out = _parts_to_btc(out) if isinstance(out, PartsTM) else out
    t = min(out.shape[1], y_word.shape[1])
    word_logits = out[:, :t] @ params["word_linear"]["w"] + params["word_linear"]["b"]
    word_loss, word_acc = _masked_frame_ce(word_logits, y_word[:, :t], weights)
    return phoneme_loss, word_loss, phoneme_acc, word_acc


# ---------------------------------------------------------------------------
# Stateful facade
# ---------------------------------------------------------------------------


class PretrainedModel:
    """Facade with the reference ``PretrainedModel`` API (models.py:170-361).

    Holds a param pytree + static arch; all compute is jitted pure functions.
    """

    def __init__(self, config, params=None, seed: int | None = None):
        self.config = config
        if not hasattr(config, "num_phonemes"):
            # Mirror the reference default when no phonemes.txt exists yet:
            # models need *some* head size; reference would crash here, we
            # default to the canonical 42-phoneme set size.
            config.num_phonemes = 42
        self.arch = EncoderArch.from_config(config)
        key = jax.random.PRNGKey(config.seed if seed is None else seed)
        self.params = params if params is not None else init_encoder_params(key, self.arch)
        from tpu_slu.ops.gru import resolve_gru_impl

        impl = resolve_gru_impl(config)
        self._jit_features = jax.jit(
            lambda p, x: encoder_features(p, self.arch, x, gru_impl=impl)
        )
        self._jit_posteriors = jax.jit(
            lambda p, x: encoder_posteriors(p, self.arch, x, gru_impl=impl)
        )
        self._jit_loss = jax.jit(
            lambda p, x, yp, yw: encoder_loss(p, self.arch, x, yp, yw, train=False, gru_impl=impl)
        )

    def compute_features(self, x):
        return self._jit_features(self.params, jnp.asarray(x, jnp.float32))

    def compute_posteriors(self, x):
        return self._jit_posteriors(self.params, jnp.asarray(x, jnp.float32))

    def forward(self, x, y_phoneme, y_word):
        return self._jit_loss(
            self.params,
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y_phoneme, jnp.int32),
            jnp.asarray(y_word, jnp.int32),
        )

    __call__ = forward

    def load_torch_state_dict(self, path_or_state):
        from tpu_slu.models.torch_import import import_pretrained_state_dict

        self.params = import_pretrained_state_dict(path_or_state, self.arch)
        return self
