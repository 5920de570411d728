"""Fused Pallas GRU (TPU): VMEM-resident recurrence, forward + custom VJP.

The scan-based GRU in ``ops/gru.py`` launches one tiny (B,H)x(H,3H) matmul
per step with the hidden state round-tripping through HBM. These kernels keep
``h`` and ``W_hh`` in VMEM for the whole sequence and stream the precomputed
input-gate tensor block-by-block over a sequential time grid (Pallas
double-buffers the block DMAs automatically) — the memory-bandwidth-optimal
shape for the reference's hot loop A (SURVEY.md §3: 4-5 stacked bi-GRUs
dominate runtime). Measured 2x on the full encoder forward vs the scan.

Structure:

* ``_gru_seq(gi, w_hh, b_hh)`` — the custom-VJP core over *processing-order*
  time-major gates (Tp, B, 3H), Tp padded to TIME_BLOCK. Direction reversal
  and padding live outside in differentiable XLA ops (flip/pad/slice), so one
  kernel pair serves both directions.
* Backward recomputes the hidden-side gate pre-activations from the saved
  output sequence (one extra matmul per step) instead of storing per-gate
  residuals — residual memory is just the forward output.
* Zero-padding analysis: the padded region has gi = 0, dY = 0, and h_prev
  explicitly zeroed, which makes every padded step's contribution exactly 0
  (dh stays 0 through the padded prefix of the reversed walk) — no masking
  needed.
* dW_hh / db_hh accumulate into fixed-index output blocks revisited across
  sequential grid steps.

Gate math matches PyTorch exactly (see ops/gru.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_BLOCK = 16


def gru_pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    # Interpret mode lets the same kernels run (slowly) on CPU for tests.
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(gi_ref, w_hh_ref, b_hh_ref, out_ref, h_ref):
    """One time-block: gi (TB, B, 3H) -> h outputs (TB, B, H)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    def step(u, h):
        gi = gi_ref[u]  # (B, 3H)
        gh = jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32) + b_hh_ref[0]
        H = h.shape[-1]
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        out_ref[u] = h_new
        return h_new

    h_ref[:] = jax.lax.fori_loop(0, gi_ref.shape[0], step, h_ref[:])


def _fwd_call(gi, w_hh, b_hh):
    Tp, B, threeH = gi.shape
    H = threeH // 3
    return pl.pallas_call(
        _fwd_kernel,
        grid=(Tp // TIME_BLOCK,),
        in_specs=[
            pl.BlockSpec((TIME_BLOCK, B, threeH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TIME_BLOCK, B, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(gi, w_hh, b_hh)


# ---------------------------------------------------------------------------
# Backward kernel (processes the time-reversed sequence "forward")
# ---------------------------------------------------------------------------


def _bwd_kernel(gi_ref, hprev_ref, dy_ref, w_hh_ref, w_hh_t_ref, b_hh_ref,
                dgi_ref, dw_ref, db_ref, dh_ref):
    """One reversed time-block.

    Inputs are time-flipped: index u walks original steps backwards.
    dh scratch carries dL/dh_{t-1}; dW/db accumulate in fixed output blocks.
    """

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    def step(u, carry):
        dh_in = carry
        gi = gi_ref[u]
        h_prev = hprev_ref[u]
        dh = dh_in + dy_ref[u]
        gh = jnp.dot(h_prev, w_hh_ref[:], preferred_element_type=jnp.float32) + b_hh_ref[0]
        H = h_prev.shape[-1]
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
        gh_n = gh[:, 2 * H :]
        n = jnp.tanh(gi[:, 2 * H :] + r * gh_n)

        dn = dh * (1.0 - z)
        dz = dh * (h_prev - n)
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * gh_n
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)

        dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)  # (B, 3H)
        dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        dgi_ref[u] = dgi

        dw_ref[:] += jnp.dot(h_prev.T, dgh, preferred_element_type=jnp.float32)
        db_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)

        dh_out = (
            jnp.dot(dgh, w_hh_t_ref[:], preferred_element_type=jnp.float32) + dh * z
        )
        return dh_out

    dh_ref[:] = jax.lax.fori_loop(0, gi_ref.shape[0], step, dh_ref[:])


def _bwd_call(gi_f, hprev_f, dy_f, w_hh, b_hh):
    Tp, B, threeH = gi_f.shape
    H = threeH // 3
    dgi_f, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid=(Tp // TIME_BLOCK,),
        in_specs=[
            pl.BlockSpec((TIME_BLOCK, B, threeH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TIME_BLOCK, B, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TIME_BLOCK, B, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_hh^T
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_hh (1, 3H)
        ],
        out_specs=[
            pl.BlockSpec((TIME_BLOCK, B, threeH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, threeH), jnp.float32),
            jax.ShapeDtypeStruct((H, threeH), jnp.float32),
            jax.ShapeDtypeStruct((1, threeH), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(gi_f, hprev_f, dy_f, w_hh, w_hh.T, b_hh)
    return dgi_f, dw, db


# ---------------------------------------------------------------------------
# Fused bidirectional kernels
#
# A bidirectional layer as two pallas_calls runs the directions sequentially
# (one TPU core, no stream overlap), paying the serial per-step latency twice.
# These kernels interleave forward step t and backward step T-1-t in the SAME
# grid iteration: the two directions' matmuls are independent and pipeline
# back-to-back through the MXU, nearly halving recurrence-bound wall time.
# Both directions' gate streams arrive pre-flipped to processing order, so
# the step loop is identical for both.
# ---------------------------------------------------------------------------

BWD_TIME_BLOCK = 8  # the joint backward kernel streams 8 block operands


def _bidir_fwd_kernel(gif_ref, gib_ref, wf_ref, bf_ref, wb_ref, bb_ref,
                      outf_ref, outb_ref, hf_ref, hb_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        hf_ref[:] = jnp.zeros_like(hf_ref)
        hb_ref[:] = jnp.zeros_like(hb_ref)

    def one(gi, h, w_ref, b_ref):
        gi = gi.astype(jnp.float32)
        gh = (
            jnp.dot(h.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
            + b_ref[0].astype(jnp.float32)
        )
        H = h.shape[-1]
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
        return (1.0 - z) * n + z * h

    def step(u, carry):
        hf, hb = carry
        hf = one(gif_ref[u], hf, wf_ref, bf_ref)
        hb = one(gib_ref[u], hb, wb_ref, bb_ref)
        outf_ref[u] = hf.astype(outf_ref.dtype)
        outb_ref[u] = hb.astype(outb_ref.dtype)
        return hf, hb

    hf, hb = jax.lax.fori_loop(0, gif_ref.shape[0], step, (hf_ref[:], hb_ref[:]))
    hf_ref[:] = hf
    hb_ref[:] = hb


def _bidir_fwd_call(gi_f, gi_b, w_f, b_f, w_b, b_b, tb=None):
    Tp, B, threeH = gi_f.shape
    H = threeH // 3
    tb = tb or TIME_BLOCK
    dt = gi_f.dtype  # bf16 gate streams halve the dominant HBM traffic
    stream = lambda i: (i, 0, 0)  # noqa: E731
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bidir_fwd_kernel,
        grid=(Tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, B, threeH), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, threeH), stream, memory_space=pltpu.VMEM),
            full, full, full, full,
        ],
        out_specs=[
            pl.BlockSpec((tb, B, H), stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, B, H), stream, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), dt),
            jax.ShapeDtypeStruct((Tp, B, H), dt),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32), pltpu.VMEM((B, H), jnp.float32)],
        interpret=_interpret(),
    )(gi_f, gi_b, w_f.astype(dt), b_f, w_b.astype(dt), b_b)


def _bidir_bwd_kernel(gif_ref, gib_ref, hpf_ref, hpb_ref, dyf_ref, dyb_ref,
                      wf_ref, wft_ref, bf_ref, wb_ref, wbt_ref, bb_ref,
                      dgif_ref, dgib_ref, dwf_ref, dbf_ref, dwb_ref, dbb_ref,
                      dhf_ref, dhb_ref, gatesf_ref, gatesb_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (dhf_ref, dhb_ref, dwf_ref, dbf_ref, dwb_ref, dbb_ref):
            ref[:] = jnp.zeros_like(ref)

    TB, B, H = hpf_ref.shape

    # Block prologue: everything that depends only on the *streamed* inputs
    # (not on the sequentially-carried dh) hoists out of the step loop — the
    # hidden-side gate recomputation becomes ONE (TB*B, H)x(H, 3H) MXU matmul
    # per block instead of TB serial (B, H) matmuls on the critical path, and
    # the r/z/n activations vectorize over the whole block. The step loop is
    # left with a single critical-path matmul (the dh chain through W^T).
    def precompute(gi_ref, hp_ref, w_ref, b_ref, gates_ref):
        hp = hp_ref[:].astype(jnp.float32).reshape(TB * B, H)
        gh = (
            jnp.dot(hp.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
            + b_ref[0].astype(jnp.float32)
        )
        gi = gi_ref[:].astype(jnp.float32).reshape(TB * B, 3 * H)
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H : 2 * H] + gh[:, H : 2 * H])
        gh_n = gh[:, 2 * H :]
        n = jnp.tanh(gi[:, 2 * H :] + r * gh_n)
        # pre-fold the constant factor the step loop would otherwise redo:
        # dr_pre = dn_pre * (gh_n * r * (1 - r)), stored in slot 0
        gates_ref[:] = jnp.concatenate(
            [gh_n * r * (1.0 - r), z, n, r], axis=1
        ).reshape(TB, B, 4 * H)

    precompute(gif_ref, hpf_ref, wf_ref, bf_ref, gatesf_ref)
    precompute(gib_ref, hpb_ref, wb_ref, bb_ref, gatesb_ref)

    def one(u, dh_in, hp_ref, dy_ref, gates_ref, wt_ref, dw_ref, db_ref):
        h_prev = hp_ref[u].astype(jnp.float32)
        dh = dh_in + dy_ref[u].astype(jnp.float32)
        g = gates_ref[u]
        rfac = g[:, :H]
        z = g[:, H : 2 * H]
        n = g[:, 2 * H : 3 * H]
        r = g[:, 3 * H :]
        dn_pre = dh * (1.0 - z) * (1.0 - n * n)
        dz_pre = dh * (h_prev - n) * z * (1.0 - z)
        dr_pre = dn_pre * rfac
        dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)
        dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        dw_ref[:] += jnp.dot(h_prev.T, dgh, preferred_element_type=jnp.float32)
        db_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)
        dh_out = (
            jnp.dot(dgh.astype(wt_ref.dtype), wt_ref[:], preferred_element_type=jnp.float32)
            + dh * z
        )
        return dgi, dh_out

    def step(u, carry):
        dhf, dhb = carry
        dgif, dhf = one(u, dhf, hpf_ref, dyf_ref, gatesf_ref, wft_ref, dwf_ref, dbf_ref)
        dgib, dhb = one(u, dhb, hpb_ref, dyb_ref, gatesb_ref, wbt_ref, dwb_ref, dbb_ref)
        dgif_ref[u] = dgif.astype(dgif_ref.dtype)
        dgib_ref[u] = dgib.astype(dgib_ref.dtype)
        return dhf, dhb

    dhf, dhb = jax.lax.fori_loop(0, gif_ref.shape[0], step, (dhf_ref[:], dhb_ref[:]))
    dhf_ref[:] = dhf
    dhb_ref[:] = dhb


def _bidir_bwd_call(gi_f, gi_b, hp_f, hp_b, dy_f, dy_b, w_f, b_f, w_b, b_b):
    Tp, B, threeH = gi_f.shape
    H = threeH // 3
    dt = gi_f.dtype
    TB = BWD_TIME_BLOCK
    stream3 = pl.BlockSpec((TB, B, threeH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    stream1 = pl.BlockSpec((TB, B, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    fixed_w = pl.BlockSpec((H, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fixed_b = pl.BlockSpec((1, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bidir_bwd_kernel,
        grid=(Tp // TB,),
        in_specs=[stream3, stream3, stream1, stream1, stream1, stream1,
                  full, full, full, full, full, full],
        out_specs=[stream3, stream3, fixed_w, fixed_b, fixed_w, fixed_b],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, threeH), dt),
            jax.ShapeDtypeStruct((Tp, B, threeH), dt),
            jax.ShapeDtypeStruct((H, threeH), jnp.float32),
            jax.ShapeDtypeStruct((1, threeH), jnp.float32),
            jax.ShapeDtypeStruct((H, threeH), jnp.float32),
            jax.ShapeDtypeStruct((1, threeH), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((TB, B, 4 * H), jnp.float32),
            pltpu.VMEM((TB, B, 4 * H), jnp.float32),
        ],
        interpret=_interpret(),
    )(gi_f, gi_b, hp_f, hp_b, dy_f, dy_b,
      w_f.astype(dt), w_f.T.astype(dt), b_f, w_b.astype(dt), w_b.T.astype(dt), b_b)


_BIGRU_CACHE: dict = {}


def _bigru_seq_for(tb: int):
    """Block-size-keyed joint-bidirectional GRU with custom VJP.

    The forward block size is a trace-time constant: training uses
    TIME_BLOCK (tuned with the backward kernel in mind), inference-only
    traces can use a larger block (fewer grid iterations; the backward
    kernel keeps its own BWD_TIME_BLOCK regardless).
    """
    if tb in _BIGRU_CACHE:
        return _BIGRU_CACHE[tb]

    @jax.custom_vjp
    def _bigru_seq(gi_f, gi_b, w_f, b_f, w_b, b_b):
        """Joint bidirectional GRU over processing-order gate streams.

        gi_f: forward gates (Tp, B, 3H); gi_b: backward gates, ALREADY
        time-flipped to processing order. Returns (h_f, h_b) in processing
        order.
        """
        return tuple(_bidir_fwd_call(gi_f, gi_b, w_f, b_f[None, :], w_b, b_b[None, :], tb))

    def _bigru_seq_fwd(gi_f, gi_b, w_f, b_f, w_b, b_b):
        h_f, h_b = _bidir_fwd_call(gi_f, gi_b, w_f, b_f[None, :], w_b, b_b[None, :], tb)
        return (h_f, h_b), (gi_f, gi_b, h_f, h_b, w_f, b_f, w_b, b_b)

    def _bigru_seq_bwd(res, dY):
        gi_f, gi_b, h_f, h_b, w_f, b_f, w_b, b_b = res
        dy_f, dy_b = dY
        Tp, B, _ = gi_f.shape
        H = h_f.shape[-1]
        zero = jnp.zeros((1, B, H), h_f.dtype)
        hp_f = jnp.concatenate([zero, h_f[:-1]], axis=0)
        hp_b = jnp.concatenate([zero, h_b[:-1]], axis=0)
        flip = lambda a: jnp.flip(a, axis=0)  # noqa: E731
        dgi_f, dgi_b, dw_f, db_f, dw_b, db_b = _bidir_bwd_call(
            flip(gi_f), flip(gi_b), flip(hp_f), flip(hp_b), flip(dy_f), flip(dy_b),
            w_f, b_f[None, :], w_b, b_b[None, :],
        )
        return flip(dgi_f), flip(dgi_b), dw_f, db_f[0], dw_b, db_b[0]

    _bigru_seq.defvjp(_bigru_seq_fwd, _bigru_seq_bwd)
    _BIGRU_CACHE[tb] = _bigru_seq
    return _bigru_seq


# ---------------------------------------------------------------------------
# Differentiable core
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gru_seq(gi, w_hh, b_hh):
    """Processing-order GRU: gi (Tp, B, 3H) -> h (Tp, B, H). h0 = 0."""
    return _fwd_call(gi, w_hh, b_hh[None, :])


def _gru_seq_fwd(gi, w_hh, b_hh):
    h_seq = _fwd_call(gi, w_hh, b_hh[None, :])
    return h_seq, (gi, h_seq, w_hh, b_hh)


def _gru_seq_bwd(res, dY):
    gi, h_seq, w_hh, b_hh = res
    Tp, B, _ = gi.shape
    H = h_seq.shape[-1]
    # h_{t-1} stream with the padded tail zeroed (see module docstring).
    hprev = jnp.concatenate([jnp.zeros((1, B, H), h_seq.dtype), h_seq[:-1]], axis=0)
    gi_f = jnp.flip(gi, axis=0)
    hprev_f = jnp.flip(hprev, axis=0)
    dy_f = jnp.flip(dY, axis=0)
    dgi_f, dw, db = _bwd_call(gi_f, hprev_f, dy_f, w_hh, b_hh[None, :])
    # cotangent dtype must match the (possibly bf16) primal gate stream
    return jnp.flip(dgi_f, axis=0).astype(gi.dtype), dw, db[0]


_gru_seq.defvjp(_gru_seq_fwd, _gru_seq_bwd)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def _run_direction(params_dir, x, reverse: bool):
    B, T, _ = x.shape
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
    out = _gru_seq(gi, params_dir["w_hh"], params_dir["b_hh"])
    out = out[:T]
    if reverse:
        out = jnp.flip(out, axis=0)
    return jnp.swapaxes(out, 0, 1)  # (B, T, H)


def _gates(params_dir, x):
    """(B, T, D) -> time-major input gates (T, B, 3H), one MXU matmul.

    The gate stream inherits x's dtype: with bfloat16 activations the MXU
    still accumulates in f32 but the stored stream (the kernels' dominant
    HBM traffic) is half-width. Params stay f32 masters (grads accumulate
    back through the casts).
    """
    dt = x.dtype
    gi = (
        jnp.dot(x, params_dir["w_ih"].astype(dt), preferred_element_type=dt)
        + params_dir["b_ih"].astype(dt)
    )
    return jnp.swapaxes(gi, 0, 1)


def _bigru_streams(params, gi_f, gi_b, tb: int):
    """Joint kernel over two *processing-order* gate streams (T, B, 3H).

    Returns (h_f, h_b), each (B, T, H) in its stream's own processing order.
    Callers own any time reversal (plain flip for the standard bidirectional
    layer, per-example ``reverse_padded`` for the length-masked path).
    """
    # padded length must satisfy both the fwd block and the bwd kernel block
    quant = max(tb, BWD_TIME_BLOCK)
    T = gi_f.shape[0]
    Tp = -(-T // quant) * quant
    if Tp != T:
        pad = ((0, Tp - T), (0, 0), (0, 0))
        gi_f = jnp.pad(gi_f, pad)
        gi_b = jnp.pad(gi_b, pad)
    h_f, h_b = _bigru_seq_for(tb)(
        gi_f, gi_b,
        params["fwd"]["w_hh"], params["fwd"]["b_hh"],
        params["bwd"]["w_hh"], params["bwd"]["b_hh"],
    )
    return jnp.swapaxes(h_f[:T], 0, 1), jnp.swapaxes(h_b[:T], 0, 1)


def gru_apply_pallas(params, x, time_block: int | None = None):
    """Bidirectional (or uni) GRU via the fused kernels. x: (B, T, D).

    Differentiable: gradients flow through the custom-VJP backward kernels.
    Bidirectional layers use the joint kernel (both directions stepped in the
    same grid iteration). ``time_block`` overrides the forward grid block
    (e.g. 64 for inference-only traces).
    """
    if "bwd" not in params:
        return _run_direction(params["fwd"], x, reverse=False)
    tb = time_block or TIME_BLOCK
    gi_f = _gates(params["fwd"], x)
    gi_b = jnp.flip(_gates(params["bwd"], x), axis=0)  # processing order
    out_f, h_b = _bigru_streams(params, gi_f, gi_b, tb)
    out_b = jnp.flip(h_b, axis=1)
    return jnp.concatenate([out_f, out_b], axis=-1)


def bigru_apply_pallas_streams(params, x_fwd, x_bwd, time_block: int | None = None):
    """Joint bidirectional kernel over two pre-arranged input streams.

    ``x_fwd``/``x_bwd``: (B, T, D), each already in its direction's
    *processing order* (the masked path passes the per-example-reversed
    prefix as ``x_bwd``). Returns (out_f, out_b), both (B, T, H), in
    processing order — the caller undoes the reversal.
    """
    tb = time_block or TIME_BLOCK
    gi_f = _gates(params["fwd"], x_fwd)
    gi_b = _gates(params["bwd"], x_bwd)
    return _bigru_streams(params, gi_f, gi_b, tb)
