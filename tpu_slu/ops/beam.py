"""Batched beam search as a single jitted ``lax.scan``.

TPU-native rewrite of the reference's Python-loop beam search (reference
``models.py:558-651``): the beam dimension is an array axis (vmapped decoder
step), the B×B extension sort becomes one ``lax.top_k`` over beam×vocab, and
hypothesis bookkeeping is gather/dynamic-update instead of clone loops. Fixed
decode length ``U`` (the reference uses true_U=200, models.py:576) keeps all
shapes static under jit.

Same search math as the reference, including its quirks we preserve for
parity: the first decode step feeds an all-zeros "previous token" vector (not
one-hot SOS, models.py:600), and there is no EOS early-exit — trailing EOS
is stripped at string conversion time.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def beam_search(
    step_fn: Callable,
    init_state,
    batch_size: int,
    vocab_size: int,
    max_len: int,
    beam_width: int,
):
    """Run beam search.

    step_fn(state, y_prev_onehot) -> (new_state, logp) for one hypothesis
    batch: state pytree with leading (batch,) axes, y_prev_onehot (batch, V),
    logp (batch, V). It is vmapped over the beam axis internally.

    Returns (scores, tokens): (beam, batch) log-prob scores sorted best-first
    and (beam, batch, max_len) int32 token ids.
    """
    B = beam_width
    V = vocab_size

    beam_step = jax.vmap(step_fn)  # over the beam axis

    tokens0 = jnp.zeros((B, batch_size, max_len), jnp.int32)
    scores0 = jnp.zeros((B, batch_size), jnp.float32)
    states0 = jax.tree.map(lambda s: jnp.broadcast_to(s[None], (B,) + s.shape), init_state)

    def body(carry, u):
        tokens, scores, states = carry
        # Previous token (zeros vector at u == 0, reference models.py:600)
        prev_ids = lax.dynamic_index_in_dim(tokens, jnp.maximum(u - 1, 0), axis=2, keepdims=False)
        y_prev = jax.nn.one_hot(prev_ids, V, dtype=jnp.float32)  # (B, batch, V)
        y_prev = jnp.where(u == 0, jnp.zeros_like(y_prev), y_prev)

        new_states, logp = beam_step(states, y_prev)  # logp: (B, batch, V)

        ext = scores[:, :, None] + logp  # (B, batch, V)
        # At u == 0 all beams are identical; keep only beam 0's extensions
        # (the reference's `if u == 0: break`, models.py:636).
        beam_ids = lax.broadcasted_iota(jnp.int32, (B, batch_size, V), 0)
        ext = jnp.where((u == 0) & (beam_ids > 0), -jnp.inf, ext)

        flat = jnp.transpose(ext, (1, 0, 2)).reshape(batch_size, B * V)
        top_scores, top_idx = lax.top_k(flat, B)  # (batch, B)
        origin = (top_idx // V).T  # (B, batch) which hypothesis each came from
        new_tok = (top_idx % V).T  # (B, batch)

        def gather_beam(arr):  # (B, batch, ...) gathered by origin per batch col
            moved = jnp.moveaxis(arr, 1, 0)  # (batch, B, ...)
            picked = jnp.take_along_axis(
                moved,
                origin.T.reshape(batch_size, B, *([1] * (arr.ndim - 2))),
                axis=1,
            )
            return jnp.moveaxis(picked, 0, 1)

        tokens = gather_beam(tokens)
        tokens = lax.dynamic_update_index_in_dim(tokens, new_tok, u, axis=2)
        states = jax.tree.map(gather_beam, new_states)
        scores = top_scores.T
        return (tokens, scores, states), None

    (tokens, scores, _), _ = lax.scan(
        body, (tokens0, scores0, states0), jnp.arange(max_len)
    )
    return scores, tokens
