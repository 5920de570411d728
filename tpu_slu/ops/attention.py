"""Single-query scaled dot-product attention for the seq2seq intent decoder.

Equivalent of the reference ``Attention`` module (reference ``models.py:413-436``):
linear K/Q/V projections, softmax over the time axis, context = weighted sum
of values. One query per decode step (the decoder's top-layer hidden state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_init(key, encoder_dim: int, decoder_dim: int, key_dim: int, value_dim: int):
    from tpu_slu.models.encoder import _linear_init

    kk, kq, kv = jax.random.split(key, 3)
    return {
        "key": _linear_init(kk, encoder_dim, key_dim),
        "query": _linear_init(kq, decoder_dim, key_dim),
        "value": _linear_init(kv, encoder_dim, value_dim),
    }


def attention_kv(params, encoder_states):
    """Project encoder states to (keys (B,T,K), values (B,T,Vd)) ONCE.

    The K/V projections depend only on the encoder output, which is fixed
    across all decode steps — hoisting them out of the decode scan removes
    the dominant matmul from every step (the reference recomputes them per
    step inside Attention.forward, models.py:425-427).
    """
    keys = encoder_states @ params["key"]["w"] + params["key"]["b"]
    values = encoder_states @ params["value"]["w"] + params["value"]["b"]
    return keys, values


def attend_kv(params, keys, values, decoder_state, mask=None):
    """One attention read over precomputed K/V. decoder_state (B, D) -> (B, Vd).

    ``mask`` (B, T) True for valid frames; padded frames get -inf scores.
    """
    query = decoder_state @ params["query"]["w"] + params["query"]["b"]  # (B, K)
    key_dim = keys.shape[-1]
    scores = jnp.einsum("btk,bk->bt", keys, query) / jnp.sqrt(jnp.float32(key_dim))
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=1)
    return jnp.einsum("bt,btv->bv", weights, values)


def attend(params, encoder_states, decoder_state, mask=None):
    """encoder_states: (B, T, E); decoder_state: (B, D) -> context (B, V).

    Convenience compose of :func:`attention_kv` + :func:`attend_kv` for
    single calls; loops should hoist ``attention_kv`` instead.
    """
    keys, values = attention_kv(params, encoder_states)
    return attend_kv(params, keys, values, decoder_state, mask=mask)
