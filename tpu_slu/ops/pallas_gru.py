"""Fused Pallas GRU cell (TPU): hidden state resident in VMEM across time.

The scan-based GRU in ``ops/gru.py`` launches one tiny (B,H)x(H,3H) matmul
per step with the hidden state round-tripping through HBM. This kernel keeps
``h`` and ``W_hh`` in VMEM for the whole sequence and streams the precomputed
input-gate tensor block-by-block over a sequential time grid (Pallas
double-buffers the block DMAs automatically) — the memory-bandwidth-optimal
shape for the reference's hot loop A (SURVEY.md §3: 4-5 stacked bi-GRUs
dominate runtime).

Layout: input gates (T, B, 3H) time-major; grid over time blocks of
``TIME_BLOCK`` steps; inner ``fori_loop`` walks steps within a block. The
backward direction reuses the same kernel on a time-flipped gate tensor
(flip is a cheap XLA copy), so trailing padding never precedes real steps
and no in-kernel masking is needed.

Used on the inference/eval path; training uses the scan implementation until
the custom-VJP backward kernel lands (autodiff does not see through
``pallas_call`` without one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_BLOCK = 8


def gru_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _gru_kernel(gi_ref, w_hh_ref, b_hh_ref, out_ref, h_ref):
    """One time-block: gi_ref (TB, B, 3H), h scratch (B, H), out (TB, B, H)."""

    # Zero-init h at the first grid step (scratch persists across the grid).
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    def step(u, h):
        gi = gi_ref[u]  # (B, 3H)
        gh = (
            jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32)
            + b_hh_ref[0]
        )
        H = h.shape[-1]
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        out_ref[u] = h_new
        return h_new

    h_ref[:] = jax.lax.fori_loop(0, gi_ref.shape[0], step, h_ref[:])


@functools.partial(jax.jit, static_argnames=("hidden",))
def _gru_time_major(gi, w_hh, b_hh, hidden: int):
    """gi: (Tp, B, 3H) padded time-major input gates -> (Tp, B, H)."""
    Tp, B, threeH = gi.shape
    num_blocks = Tp // TIME_BLOCK
    return pl.pallas_call(
        _gru_kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((TIME_BLOCK, B, threeH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_hh full
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_hh (1, 3H)
        ],
        out_specs=pl.BlockSpec((TIME_BLOCK, B, hidden), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, hidden), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, hidden), jnp.float32)],
    )(gi, w_hh, b_hh)


def _run_direction(params_dir, x, reverse: bool):
    B, T, _ = x.shape
    H = params_dir["w_hh"].shape[0]
    gi = (
        jnp.dot(x, params_dir["w_ih"], preferred_element_type=jnp.float32)
        + params_dir["b_ih"]
    )  # (B, T, 3H) — one large MXU matmul
    gi = jnp.swapaxes(gi, 0, 1)  # (T, B, 3H)
    if reverse:
        gi = jnp.flip(gi, axis=0)
    Tp = -(-T // TIME_BLOCK) * TIME_BLOCK
    if Tp != T:
        gi = jnp.pad(gi, ((0, Tp - T), (0, 0), (0, 0)))
    out = _gru_time_major(gi, params_dir["w_hh"], params_dir["b_hh"][None, :], H)
    out = out[:T]
    if reverse:
        out = jnp.flip(out, axis=0)
    return jnp.swapaxes(out, 0, 1)  # (B, T, H)


def gru_apply_pallas(params, x):
    """Bidirectional (or uni) GRU via the fused kernel. x: (B, T, D)."""
    out_f = _run_direction(params["fwd"], x, reverse=False)
    if "bwd" not in params:
        return out_f
    out_b = _run_direction(params["bwd"], x, reverse=True)
    return jnp.concatenate([out_f, out_b], axis=-1)
