"""GRU layers as ``lax.scan`` recurrences (with a Pallas fused-cell fast path).

Replaces the cuDNN GRU kernels the reference inherits from
``torch.nn.GRU``/``GRUCell`` (reference ``models.py:232,262,448``). The gate
math is bit-compatible with PyTorch's formulation so imported
``model_state.pth`` checkpoints reproduce activations:

    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

with gate order (r, z, n) along the stacked 3H axis and PyTorch's two-bias
formulation kept separate.

TPU execution shape: the input projection for the *whole* sequence is one
large (B*T, D)x(D, 3H) matmul (MXU-friendly), and only the (B, H)x(H, 3H)
hidden recurrence runs inside the scan. Weights are stored pre-transposed
(D, 3H) for right-multiplication.
"""

from __future__ import annotations

from typing import TypedDict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class GRUDirParams(TypedDict):
    w_ih: jax.Array  # (D, 3H)
    w_hh: jax.Array  # (H, 3H)
    b_ih: jax.Array  # (3H,)
    b_hh: jax.Array  # (3H,)


class GRUParams(TypedDict, total=False):
    fwd: GRUDirParams
    bwd: GRUDirParams  # present iff bidirectional


def gru_init(key, input_dim: int, hidden: int, bidirectional: bool) -> GRUParams:
    """torch-style init: all weights/biases ~ U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / np.sqrt(hidden)
    dirs = ["fwd", "bwd"] if bidirectional else ["fwd"]
    keys = jax.random.split(key, 4 * len(dirs))
    params: GRUParams = {}
    for d_idx, d in enumerate(dirs):
        k = keys[4 * d_idx : 4 * d_idx + 4]
        params[d] = {
            "w_ih": jax.random.uniform(k[0], (input_dim, 3 * hidden), jnp.float32, -bound, bound),
            "w_hh": jax.random.uniform(k[1], (hidden, 3 * hidden), jnp.float32, -bound, bound),
            "b_ih": jax.random.uniform(k[2], (3 * hidden,), jnp.float32, -bound, bound),
            "b_hh": jax.random.uniform(k[3], (3 * hidden,), jnp.float32, -bound, bound),
        }
    return params


def gru_cell_step(params: GRUDirParams, x, h):
    """One GRUCell update. x: (B, D), h: (B, H) -> h': (B, H)."""
    gi = jnp.dot(x, params["w_ih"], preferred_element_type=jnp.float32) + params["b_ih"]
    gh = jnp.dot(h, params["w_hh"], preferred_element_type=jnp.float32) + params["b_hh"]
    return _gate_update(gi, gh, h)


def _gate_update(gi, gh, h):
    hidden = h.shape[-1]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    del hidden
    return (1.0 - z) * n + z * h


# unroll > 2 explodes HLO size and can push remote-TPU compile times from
# seconds to minutes at long T; per-step work is tiny either way and the
# Pallas kernel is the real fast path.
def _gru_scan(params: GRUDirParams, x, reverse: bool, unroll: int = 2):
    """Unidirectional GRU over x (B, T, D) -> (B, T, H). h0 = 0 (torch default)."""
    x = x.astype(jnp.float32)  # the scan is the f32 reference path
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    # Whole-sequence input projection: one MXU matmul instead of T small ones.
    gi = (
        jnp.dot(x, params["w_ih"], preferred_element_type=jnp.float32)
        + params["b_ih"]
    )  # (B, T, 3H)
    gi = jnp.swapaxes(gi, 0, 1)  # (T, B, 3H) time-major for scan

    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def step(h, gi_t):
        gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
        h_new = _gate_update(gi_t, gh, h)
        return h_new, h_new

    h0 = jnp.zeros((B, H), x.dtype)
    _, ys = lax.scan(step, h0, gi, reverse=reverse, unroll=unroll)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def resolve_gru_impl(config=None) -> str:
    """Map a config's ``gru_impl`` ("auto"/"scan"/"pallas") to a concrete impl."""
    choice = getattr(config, "gru_impl", "auto") if config is not None else "auto"
    if choice == "auto":
        from tpu_slu.ops.pallas_gru import gru_pallas_available

        return "pallas" if gru_pallas_available() else "scan"
    return choice


def _pallas_active(impl: str) -> bool:
    """True when ``impl`` requests Pallas and the kernels can run here."""
    if not impl.startswith("pallas"):
        return False
    import os

    from tpu_slu.ops.pallas_gru import gru_pallas_available

    return gru_pallas_available() or bool(os.environ.get("TPU_SLU_PALLAS_INTERPRET"))


def reverse_padded(x, n):
    """Per-example time reversal of the valid prefix. x: (B, T, C), n: (B,).

    Row i becomes [x[i, n_i-1], ..., x[i, 0], 0, 0, ...] — the packed-sequence
    reversal that makes a *forward* scan over the result equal a backward scan
    over the exact-shape (T = n_i) input.
    """
    t = jnp.arange(x.shape[1])
    idx = jnp.clip(n[:, None] - 1 - t[None, :], 0, x.shape[1] - 1)  # (B, T)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    return jnp.where((t[None, :] < n[:, None])[:, :, None], out, 0.0)


def gru_apply_masked(params: GRUParams, x, n, impl: str = "scan"):
    """Length-aware GRU: bit-equal to ``gru_apply`` on each example cropped
    to its own length n_i, with frames >= n_i zeroed in the output.

    The forward direction is already exact for valid frames (h0 = 0, padding
    sits after the valid prefix); the backward direction runs the bwd-params
    cell *forward* over the per-example-reversed prefix (``reverse_padded``),
    so any impl — scan or the Pallas kernels — stays usable and exact.
    Under Pallas, both directions ride the joint bidirectional kernel (the
    reversed prefix *is* the backward direction's processing order), halving
    the recurrence count vs two unidirectional launches.
    """
    t = jnp.arange(x.shape[1])
    valid = (t[None, :] < n[:, None])[:, :, None]
    if "bwd" in params and _pallas_active(impl):
        from tpu_slu.ops.pallas_gru import bigru_apply_pallas_streams

        tb = int(impl.split(":", 1)[1]) if ":" in impl else None
        out_f, out_b = bigru_apply_pallas_streams(
            params, x, reverse_padded(x, n), time_block=tb
        )
        out_f = jnp.where(valid, out_f, 0.0)
        return jnp.concatenate([out_f, reverse_padded(out_b, n)], axis=-1)
    out_f = jnp.where(valid, gru_apply({"fwd": params["fwd"]}, x, impl=impl), 0.0)
    if "bwd" not in params:
        return out_f
    out_b = gru_apply({"fwd": params["bwd"]}, reverse_padded(x, n), impl=impl)
    out_b = reverse_padded(out_b, n)
    return jnp.concatenate([out_f, out_b], axis=-1)


def gru_apply(params: GRUParams, x, impl: str = "scan"):
    """GRU over a batch of sequences. x: (B, T, D) -> (B, T, H or 2H).

    ``impl``: "scan" (pure XLA) or "pallas" (fused VMEM-resident cell; falls
    back to scan on non-TPU backends). "pallas:N" overrides the forward time
    block to N (e.g. "pallas:64" for inference-only traces).
    """
    if _pallas_active(impl):
        from tpu_slu.ops.pallas_gru import gru_apply_pallas

        tb = int(impl.split(":", 1)[1]) if ":" in impl else None
        return gru_apply_pallas(params, x, time_block=tb)
    out_f = _gru_scan(params["fwd"], x, reverse=False)
    if "bwd" not in params:
        return out_f
    out_b = _gru_scan(params["bwd"], x, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1)

