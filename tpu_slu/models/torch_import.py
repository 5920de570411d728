"""Import reference PyTorch ``model_state.pth`` checkpoints into param pytrees.

The reference stores plain ``state_dict`` files (reference ``training.py:35-39``)
whose keys are ModuleList-indexed, e.g. ``phoneme_layers.14.weight_ih_l0`` or
``pretrained_model.word_layers.0.weight_hh_l0_reverse`` (full layout documented
in SURVEY.md §2). Our param pytrees mirror those indices, so the mapping is
mechanical:

* GRU/GRUCell matrices are transposed to (in, 3H) for right-multiplication,
* Linear weights are transposed to (in, out),
* Conv1d kernels keep torch's (out, in, k) layout,
* Sinc params (float64 in torch) are cast to float32.

Also provides the reverse export so our checkpoints can be loaded by the
reference implementation.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _load_state(path_or_state) -> dict:
    if isinstance(path_or_state, dict):
        state = path_or_state
    else:
        from tpu_slu.models import pth_reader

        state = None
        if pth_reader.is_torch_zip(path_or_state):
            try:
                # Torch-free fast path: a TPU host needs no torch install to
                # read reference checkpoints (flat tensor dicts).
                state = pth_reader.load_state_dict(path_or_state)
            except Exception:
                state = None  # exotic pickle/storage: let torch handle it
        if state is None:
            import torch

            state = torch.load(path_or_state, map_location="cpu")
    out = {}
    for k, v in state.items():
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _gru_from_torch(state: dict, prefix: str, bidirectional: bool, cell: bool = False) -> dict:
    """torch GRU (suffix ``_l0``) or GRUCell (no suffix) params -> ours."""
    sfx = "" if cell else "_l0"

    def direction(rev: str) -> dict:
        return {
            "w_ih": jnp.asarray(state[f"{prefix}.weight_ih{sfx}{rev}"].T, jnp.float32),
            "w_hh": jnp.asarray(state[f"{prefix}.weight_hh{sfx}{rev}"].T, jnp.float32),
            "b_ih": jnp.asarray(state[f"{prefix}.bias_ih{sfx}{rev}"], jnp.float32),
            "b_hh": jnp.asarray(state[f"{prefix}.bias_hh{sfx}{rev}"], jnp.float32),
        }

    if cell:
        return direction("")
    params = {"fwd": direction("")}
    if bidirectional:
        params["bwd"] = direction("_reverse")
    return params


def _linear_from_torch(state: dict, prefix: str) -> dict:
    return {
        "w": jnp.asarray(state[f"{prefix}.weight"].T, jnp.float32),
        "b": jnp.asarray(state[f"{prefix}.bias"], jnp.float32),
    }


def _encoder_from_torch(state: dict, arch, prefix: str = "") -> dict:
    params: dict = {"phoneme_layers": {}, "word_layers": {}}
    for group, spec in arch.param_layer_specs():
        key = f"{prefix}{group}.{spec.index}"
        if spec.kind == "sinc":
            params[group][str(spec.index)] = {
                "filt_b1": jnp.asarray(state[f"{key}.filt_b1"], jnp.float32),
                "filt_band": jnp.asarray(state[f"{key}.filt_band"], jnp.float32),
            }
        elif spec.kind == "conv":
            params[group][str(spec.index)] = {
                "w": jnp.asarray(state[f"{key}.weight"], jnp.float32),
                "b": jnp.asarray(state[f"{key}.bias"], jnp.float32),
            }
        elif spec.kind == "gru":
            bidir = spec.h[2]
            params[group][str(spec.index)] = _gru_from_torch(state, key, bidir)
    params["phoneme_linear"] = _linear_from_torch(state, f"{prefix}phoneme_linear")
    params["word_linear"] = _linear_from_torch(state, f"{prefix}word_linear")
    return params


def import_pretrained_state_dict(path_or_state, arch) -> dict:
    """PretrainedModel checkpoint (pretraining/model_state.pth) -> param pytree."""
    return _encoder_from_torch(_load_state(path_or_state), arch)


def import_model_state_dict(path_or_state, encoder_arch, intent_arch=None, seq2seq_arch=None):
    """SLU Model checkpoint (training/model_state.pth) -> param pytree."""
    state = _load_state(path_or_state)
    params = {"pretrained_model": _encoder_from_torch(state, encoder_arch, "pretrained_model.")}

    if intent_arch is not None:
        head: dict = {}
        for spec in intent_arch.layers:
            if spec.kind == "gru":
                head[str(spec.index)] = _gru_from_torch(
                    state, f"intent_layers.{spec.index}", spec.h[2]
                )
        head[str(intent_arch.linear_index)] = _linear_from_torch(
            state, f"intent_layers.{intent_arch.linear_index}"
        )
        params["intent_layers"] = head

    if seq2seq_arch is not None:
        enc_params: dict = {}
        for idx in range(seq2seq_arch.num_encoder_layers):
            enc_params[str(3 * idx)] = _gru_from_torch(
                state, f"encoder.layers.{3 * idx}", bidirectional=True
            )
        rnn_params: dict = {}
        for idx in range(seq2seq_arch.num_decoder_layers):
            rnn_params[str(2 * idx)] = _gru_from_torch(
                state, f"decoder.rnn.layers.{2 * idx}", False, cell=True
            )
        params["encoder"] = enc_params
        params["decoder"] = {
            "embed": _linear_from_torch(state, "decoder.embed"),
            "attention": {
                "key": _linear_from_torch(state, "decoder.attention.key_linear"),
                "query": _linear_from_torch(state, "decoder.attention.query_linear"),
                "value": _linear_from_torch(state, "decoder.attention.value_linear"),
            },
            "rnn": rnn_params,
            "initial_state": jnp.asarray(state["decoder.initial_state"], jnp.float32),
            "linear": _linear_from_torch(state, "decoder.linear"),
        }
    return params


# ---------------------------------------------------------------------------
# Export (our params -> a reference-loadable state_dict)
# ---------------------------------------------------------------------------


def _gru_to_torch(out: dict, prefix: str, p: dict, cell: bool = False):
    import torch

    sfx = "" if cell else "_l0"
    dirs = [("", p)] if cell else [("", p["fwd"])] + ([("_reverse", p["bwd"])] if "bwd" in p else [])
    for rev, d in dirs:
        out[f"{prefix}.weight_ih{sfx}{rev}"] = torch.from_numpy(np.asarray(d["w_ih"]).T.copy())
        out[f"{prefix}.weight_hh{sfx}{rev}"] = torch.from_numpy(np.asarray(d["w_hh"]).T.copy())
        out[f"{prefix}.bias_ih{sfx}{rev}"] = torch.from_numpy(np.asarray(d["b_ih"]).copy())
        out[f"{prefix}.bias_hh{sfx}{rev}"] = torch.from_numpy(np.asarray(d["b_hh"]).copy())


def _linear_to_torch(out: dict, prefix: str, p: dict):
    import torch

    out[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["w"]).T.copy())
    out[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())


def export_model_state_dict(params, encoder_arch, intent_arch=None, seq2seq_arch=None) -> dict:
    """Full SLU Model params -> a reference-loadable ``state_dict``.

    Enables the reverse deployment path: train with this framework on TPU,
    ``torch.save`` the result, and load it into the reference PyTorch
    implementation (verified in tests/test_reference_parity.py).
    """
    import torch

    out = export_pretrained_state_dict(
        params["pretrained_model"], encoder_arch, prefix="pretrained_model."
    )
    if intent_arch is not None:
        for spec in intent_arch.layers:
            if spec.kind == "gru":
                _gru_to_torch(
                    out, f"intent_layers.{spec.index}", params["intent_layers"][str(spec.index)]
                )
        _linear_to_torch(
            out,
            f"intent_layers.{intent_arch.linear_index}",
            params["intent_layers"][str(intent_arch.linear_index)],
        )
    if seq2seq_arch is not None:
        for idx in range(seq2seq_arch.num_encoder_layers):
            _gru_to_torch(out, f"encoder.layers.{3 * idx}", params["encoder"][str(3 * idx)])
        dec = params["decoder"]
        _linear_to_torch(out, "decoder.embed", dec["embed"])
        _linear_to_torch(out, "decoder.attention.key_linear", dec["attention"]["key"])
        _linear_to_torch(out, "decoder.attention.query_linear", dec["attention"]["query"])
        _linear_to_torch(out, "decoder.attention.value_linear", dec["attention"]["value"])
        for idx in range(seq2seq_arch.num_decoder_layers):
            _gru_to_torch(out, f"decoder.rnn.layers.{2 * idx}", dec["rnn"][str(2 * idx)], cell=True)
        out["decoder.initial_state"] = torch.from_numpy(np.asarray(dec["initial_state"]).copy())
        _linear_to_torch(out, "decoder.linear", dec["linear"])
    return out


def export_pretrained_state_dict(params, arch, prefix: str = "") -> dict:
    """Param pytree -> torch state_dict keyed like the reference PretrainedModel."""
    import torch

    out: dict = {}
    for group, spec in arch.param_layer_specs():
        key = f"{prefix}{group}.{spec.index}"
        p = params[group][str(spec.index)]
        if spec.kind == "sinc":
            out[f"{key}.filt_b1"] = torch.from_numpy(np.asarray(p["filt_b1"]).copy())
            out[f"{key}.filt_band"] = torch.from_numpy(np.asarray(p["filt_band"]).copy())
        elif spec.kind == "conv":
            out[f"{key}.weight"] = torch.from_numpy(np.asarray(p["w"]).copy())
            out[f"{key}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())
        elif spec.kind == "gru":
            _gru_to_torch(out, key, p)
    _linear_to_torch(out, f"{prefix}phoneme_linear", params["phoneme_linear"])
    _linear_to_torch(out, f"{prefix}word_linear", params["word_linear"])
    return out
