"""Fused Pallas GRU (TPU): VMEM-resident recurrence, forward + custom VJP.

The scan-based GRU in ``ops/gru.py`` launches one tiny (B,H)x(H,3H) matmul
per step with the hidden state round-tripping through HBM. These kernels keep
``h`` and ALL four weight matrices in VMEM for the whole sequence, stream the
raw (T, B, D) layer inputs block-by-block over a sequential time grid (Pallas
double-buffers the block DMAs automatically), and compute the input-gate
projection ``gi = x @ W_ih + b_ih`` INSIDE the kernel as one batched MXU
matmul per block — the (T, B, 3H) gate tensors never touch HBM. This is the
memory-optimal shape for the reference's hot loop A (SURVEY.md §3: 4-5
stacked bi-GRUs dominate runtime): 4.1x on the full train step vs the scan.

Structure (see docs/KERNELS.md for the full design + measured tuning):

* ``_bigru_seq_for`` / ``_gru1_seq_for`` — block-size-keyed custom-VJP cores
  over *processing-order* time-major inputs (Tp, B, D), Tp padded to the
  block quantum. Direction arrangement (flip / per-example reversal) and
  padding live outside in differentiable XLA ops, so one kernel pair serves
  any direction arrangement.
* Backward kernels recompute gi and the hidden-side pre-activations in a
  batched per-block prologue (residual memory is just the forward output),
  run only the dh chain serially, and fold dX/dW_ih/dW_hh/biases into a
  batched per-block epilogue — a single matmul on the critical path.
* Zero-padding analysis: padded steps sit at the END of processing order
  with dY = 0, so dh stays 0 through the padded prefix of the reversed walk
  and every padded step's contribution is exactly 0 (the garbage gates
  computed from gi = b_ih there are multiplied by zeros) — no masking needed.
* dW / db accumulate into fixed-index output blocks revisited across
  sequential grid steps.

Gate math matches PyTorch exactly (see ops/gru.py).
"""

from __future__ import annotations

import functools
import math

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


def _mxu_bf16() -> bool:
    """bf16 MXU multiplies (f32 accumulation) on TPU.

    The v5e MXU natively multiplies bf16; f32 operands cost multiple passes
    (~half throughput). The flagship encoder forward is MXU-THROUGHPUT-bound
    at B>=128 (52 GFLOP vs a 259 MB minimum-traffic model = 203 flops/byte,
    far above the f32 ridge point — measured: the fwd sits exactly at the
    true-f32 wall, hbm_roofline_frac 0.59-0.61 regardless of traffic cuts).
    Casting matmul OPERANDS to bf16 while keeping f32 VMEM streams, f32
    accumulation and f32 gate math matches XLA's own historical default
    precision for f32 dots on TPU and doubles the MXU rate. Interpret mode
    (CPU tests) stays exact-f32 so parity vs the scan impl is bit-meaningful;
    set TPU_SLU_MXU_F32=1 to force multi-pass f32 on hardware too.
    """
    import os

    if os.environ.get("TPU_SLU_MXU_F32"):
        return False
    return not _interpret()


def _mxu(a, b):
    """In-kernel matmul at the policy precision (see _mxu_bf16)."""
    if _mxu_bf16():
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _sigmoid(x):
    """sigmoid via the tanh identity: 0.5 + 0.5*tanh(x/2).

    Mathematically identical to jax.nn.sigmoid; on the v5e VPU the single
    tanh measures ~10% faster per GRU layer than the exp-based logistic
    lowering (same-process A/B, both step-loop and batched-prologue sites).
    The backward kernels RECOMPUTE the forward's gates, so every kernel
    must use the same formula."""
    return 0.5 + 0.5 * jnp.tanh(0.5 * x)


def _vmem_params():
    """Raise Mosaic's scoped-VMEM limit (default 16 MB) for these kernels.

    The shared bidirectional backward kernel's working set (double-buffered
    part/h_prev/dY streams + gates and dgi scratch) measures 16.08 MB at
    the flagship tb=16/B=64/H=128/D=256 shape — right AT the default limit,
    so whether a given jit compiled depended on surrounding-program
    scheduling noise: the ASR pretraining step OOM'd at some bucket lengths
    (T≈1400 samples -> Tp=176 word-layer blocks) while the identical kernel
    standalone, and the same train step at other bucket lengths, compiled
    fine. 32 MB gives deterministic headroom; v5e VMEM is 128 MB and the
    limit only bounds the allocator — it reserves nothing, and generated
    code is unchanged (verified: same train_step_ms in bench after the
    change).
    """
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _step_unroll(tb: int) -> int:
    """Unroll factor for the serial step loops. Mosaic supports 1 or full
    unroll only; full unroll hands the scheduler every step of both
    directions at once and measured 14-31% faster per layer (B=128, v5e).
    Guarded to small blocks so the 64-step inference block doesn't bloat;
    TPU_SLU_GRU_UNROLL=1 opts out."""
    import os

    if os.environ.get("TPU_SLU_GRU_UNROLL") == "1":
        return 1
    return tb if tb <= 16 else 1


# ---------------------------------------------------------------------------
# Fused unidirectional kernels (same design as the joint kernels below,
# minus the second direction; used for non-bidirectional layers)
# ---------------------------------------------------------------------------


def _fused1_fwd_kernel(x_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                       out_ref, h_ref, gi_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    TB, B, D = x_ref.shape
    H = h_ref.shape[-1]
    gi_ref[:] = (
        _mxu(x_ref[:].reshape(TB * B, D), wih_ref[:])
        + bih_ref[0].astype(jnp.float32)
    ).reshape(TB, B, 3 * H)

    def step(u, h):
        gi = gi_ref[u]
        gh = (
            _mxu(h.astype(whh_ref.dtype), whh_ref[:])
            + bhh_ref[0].astype(jnp.float32)
        )
        rz = _sigmoid(gi[:, : 2 * H] + gh[:, : 2 * H])
        r, z = rz[:, :H], rz[:, H:]
        n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = n + z * (h - n)
        out_ref[u] = h_new.astype(out_ref.dtype)
        return h_new

    h_ref[:] = jax.lax.fori_loop(0, TB, step, h_ref[:], unroll=_step_unroll(TB))


def _fused1_fwd_call(x, wih, bih, whh, bhh, tb: int):
    Tp, B, D = x.shape
    H = whh.shape[0]
    dt = x.dtype
    stream_x = pl.BlockSpec((tb, B, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    stream_h = pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fused1_fwd_kernel,
        grid=(Tp // tb,),
        in_specs=[stream_x] + [full] * 4,
        out_specs=stream_h,
        out_shape=jax.ShapeDtypeStruct((Tp, B, H), dt),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((tb, B, 3 * H), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(x, wih.astype(dt), bih[None, :], whh.astype(dt), bhh[None, :])


def _fused1_bwd_kernel(x_ref, hp_ref, dy_ref,
                       wih_ref, wiht_ref, bih_ref, whh_ref, whht_ref, bhh_ref,
                       dx_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref,
                       dh_ref, gates_ref, dgi_ref):
    """Unidirectional version of ``_fused_bwd_kernel`` (see its docstring)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (dh_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref):
            ref[:] = jnp.zeros_like(ref)

    TB, B, D = x_ref.shape
    H = hp_ref.shape[-1]

    gi = (
        _mxu(x_ref[:].reshape(TB * B, D), wih_ref[:])
        + bih_ref[0].astype(jnp.float32)
    )
    hp = hp_ref[:].astype(jnp.float32).reshape(TB * B, H)
    gh = (
        _mxu(hp.astype(whh_ref.dtype), whh_ref[:])
        + bhh_ref[0].astype(jnp.float32)
    )
    rz = _sigmoid(gi[:, : 2 * H] + gh[:, : 2 * H])
    r, z = rz[:, :H], rz[:, H:]
    gh_n = gh[:, 2 * H :]
    n = jnp.tanh(gi[:, 2 * H :] + r * gh_n)
    gates_ref[:] = jnp.concatenate(
        [gh_n * r * (1.0 - r), z, n, r], axis=1
    ).reshape(TB, B, 4 * H)

    def step(u, dh_in):
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
        dgi_ref[u] = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        return (
            _mxu(dgh.astype(whht_ref.dtype), whht_ref[:])
            + dh * z
        )

    dh_ref[:] = jax.lax.fori_loop(0, TB, step, dh_ref[:], unroll=_step_unroll(TB))

    dgi = dgi_ref[:].reshape(TB * B, 3 * H)
    x = x_ref[:].reshape(TB * B, D)
    r_all = gates_ref[:].reshape(TB * B, 4 * H)[:, 3 * H :]
    dgh_all = jnp.concatenate([dgi[:, : 2 * H], dgi[:, 2 * H :] * r_all], axis=1)
    dx_ref[:] = _mxu(dgi.astype(wiht_ref.dtype), wiht_ref[:]).reshape(TB, B, D).astype(dx_ref.dtype)
    dwih_ref[:] += _mxu(x.T.astype(jnp.float32), dgi)
    dbih_ref[:] += jnp.sum(dgi, axis=0, keepdims=True)
    dwhh_ref[:] += _mxu(hp.T, dgh_all)
    dbhh_ref[:] += jnp.sum(dgh_all, axis=0, keepdims=True)


def _fused1_bwd_call(x, hp, dy, wih, bih, whh, bhh, tb: int):
    Tp, B, D = x.shape
    H = whh.shape[0]
    threeH = 3 * H
    dt = x.dtype
    stream_x = pl.BlockSpec((tb, B, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    stream_h = pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    fixed_ih = pl.BlockSpec((D, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fixed_hh = pl.BlockSpec((H, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fixed_b = pl.BlockSpec((1, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fused1_bwd_kernel,
        grid=(Tp // tb,),
        in_specs=[stream_x, stream_h, stream_h] + [full] * 6,
        out_specs=[stream_x, fixed_ih, fixed_b, fixed_hh, fixed_b],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, D), dt),
            jax.ShapeDtypeStruct((D, threeH), jnp.float32),
            jax.ShapeDtypeStruct((1, threeH), jnp.float32),
            jax.ShapeDtypeStruct((H, threeH), jnp.float32),
            jax.ShapeDtypeStruct((1, threeH), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((tb, B, 4 * H), jnp.float32),
            pltpu.VMEM((tb, B, 3 * H), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(x, hp, dy,
      wih.astype(dt), wih.T.astype(dt), bih[None, :],
      whh.astype(dt), whh.T.astype(dt), bhh[None, :])


# ---------------------------------------------------------------------------
# Fully-fused joint bidirectional kernels
#
# A bidirectional layer as two pallas_calls runs the directions sequentially
# (one TPU core, no stream overlap), paying the serial per-step latency twice.
# These kernels interleave forward step t and backward step T-1-t in the SAME
# grid iteration: the two directions' matmuls are independent and pipeline
# back-to-back through the MXU, nearly halving recurrence-bound wall time.
#
# The input-gate projection gi = x @ W_ih + b_ih is computed INSIDE the
# kernels, one batched (TB*B, D)x(D, 3H) MXU matmul per block: the (T, B, 3H)
# gate streams — the dominant HBM traffic of the gate-stream formulation —
# never touch HBM. The kernels stream the raw (T, B, D) layer inputs instead
# (D < 3H for every layer of the flagship topology), and the backward kernel
# additionally folds the dX = dgi @ W_ih^T and dW_ih = x^T dgi matmuls into a
# per-block epilogue, so its only streamed output is dX (D-wide, not 3H).
# Each direction receives its inputs pre-arranged in its own processing order
# (a plain time flip for the standard layer, the per-example reversed prefix
# for the length-masked path), so the step loop is identical for both.
# ---------------------------------------------------------------------------

# 16 since the projection fusion: the backward kernel no longer streams the
# 3H gate tensors, so the larger block fits scoped VMEM at B=64 and measured
# best in the same-process (fwd, bwd) block sweep ((16,16) 2.59 ms vs (16,8)
# 2.91, (32,8) 2.72, (32,16) 2.75); _auto_tb still halves it past B=64.
BWD_TIME_BLOCK = 16


def _auto_tb(base: int, batch: int) -> int:
    """Halve the time block as the batch grows past 64 so per-block VMEM
    footprint (streams + gate scratch scale with tb*B) stays under the
    scoped-VMEM budget; stays a power of two so fwd/bwd grids co-divide."""
    while batch > 64 and base > 2:
        base //= 2
        batch //= 2
    return base


def _fused_fwd_kernel(xf_ref, xb_ref,
                      wihf_ref, bihf_ref, whhf_ref, bhhf_ref,
                      wihb_ref, bihb_ref, whhb_ref, bhhb_ref,
                      outf_ref, outb_ref,
                      hf_ref, hb_ref, gif_ref, gib_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        hf_ref[:] = jnp.zeros_like(hf_ref)
        hb_ref[:] = jnp.zeros_like(hb_ref)

    TB, B, D = xf_ref.shape
    H = hf_ref.shape[-1]

    def project(x_ref, wih_ref, bih_ref, gi_ref):
        # whole-block input projection: one MXU matmul, result stays in VMEM
        x = x_ref[:].reshape(TB * B, D)
        gi_ref[:] = (
            _mxu(x, wih_ref[:])
            + bih_ref[0].astype(jnp.float32)
        ).reshape(TB, B, 3 * H)

    project(xf_ref, wihf_ref, bihf_ref, gif_ref)
    project(xb_ref, wihb_ref, bihb_ref, gib_ref)

    def one(gi, h, w_ref, b_ref):
        gh = (
            _mxu(h.astype(w_ref.dtype), w_ref[:])
            + b_ref[0].astype(jnp.float32)
        )
        rz = _sigmoid(gi[:, : 2 * H] + gh[:, : 2 * H])
        r, z = rz[:, :H], rz[:, H:]
        n = jnp.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
        return n + z * (h - n)

    def step(u, carry):
        hf, hb = carry
        hf = one(gif_ref[u], hf, whhf_ref, bhhf_ref)
        hb = one(gib_ref[u], hb, whhb_ref, bhhb_ref)
        outf_ref[u] = hf.astype(outf_ref.dtype)
        outb_ref[u] = hb.astype(outb_ref.dtype)
        return hf, hb

    hf, hb = jax.lax.fori_loop(0, TB, step, (hf_ref[:], hb_ref[:]), unroll=_step_unroll(TB))
    hf_ref[:] = hf
    hb_ref[:] = hb


def _fused_fwd_call(x_f, x_b, wih_f, bih_f, whh_f, bhh_f,
                    wih_b, bih_b, whh_b, bhh_b, tb: int):
    Tp, B, D = x_f.shape
    H = whh_f.shape[0]
    dt = x_f.dtype  # bf16 inputs halve the dominant HBM traffic
    stream_x = pl.BlockSpec((tb, B, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    stream_h = pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fused_fwd_kernel,
        grid=(Tp // tb,),
        in_specs=[stream_x, stream_x] + [full] * 8,
        out_specs=[stream_h, stream_h],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), dt),
            jax.ShapeDtypeStruct((Tp, B, H), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((tb, B, 3 * H), jnp.float32),
            pltpu.VMEM((tb, B, 3 * H), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(x_f, x_b,
      wih_f.astype(dt), bih_f[None, :], whh_f.astype(dt), bhh_f[None, :],
      wih_b.astype(dt), bih_b[None, :], whh_b.astype(dt), bhh_b[None, :])


def _fused_bwd_kernel(xf_ref, xb_ref, hpf_ref, hpb_ref, dyf_ref, dyb_ref,
                      wihf_ref, wihtf_ref, bihf_ref, whhf_ref, whhtf_ref, bhhf_ref,
                      wihb_ref, wihtb_ref, bihb_ref, whhb_ref, whhtb_ref, bhhb_ref,
                      dxf_ref, dxb_ref,
                      dwihf_ref, dbihf_ref, dwhhf_ref, dbhhf_ref,
                      dwihb_ref, dbihb_ref, dwhhb_ref, dbhhb_ref,
                      dhf_ref, dhb_ref, gatesf_ref, gatesb_ref, dgif_ref, dgib_ref):
    """One reversed time-block, both directions.

    Inputs arrive time-flipped (index u walks each direction's processing
    order backwards). Per-direction structure:

    * prologue (batched, off the critical path): recompute gi and gh with one
      (TB*B, ·)x(·, 3H) matmul each, evaluate r/z/n for the whole block into
      VMEM scratch.
    * step loop (sequential): only the dh chain — elementwise gate grads plus
      a single (B, 3H)x(3H, H) matmul through W_hh^T. dgi goes to scratch.
    * epilogue (batched): dX = dgi @ W_ih^T streamed out; dW_ih += x^T dgi,
      dW_hh += hp^T dgh, and the bias sums accumulate into fixed blocks.

    Zero-padding analysis: padded steps sit at the *end* of processing order,
    i.e. at the *start* of this reversed walk, with dy = 0 — dh stays 0, so
    every padded step's dgi/dgh contribution is exactly 0 (the garbage gate
    values computed from gi = b_ih there are multiplied by zeros).
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (dhf_ref, dhb_ref, dwihf_ref, dbihf_ref, dwhhf_ref, dbhhf_ref,
                    dwihb_ref, dbihb_ref, dwhhb_ref, dbhhb_ref):
            ref[:] = jnp.zeros_like(ref)

    TB, B, D = xf_ref.shape
    H = hpf_ref.shape[-1]

    def precompute(x_ref, hp_ref, wih_ref, bih_ref, whh_ref, bhh_ref, gates_ref):
        x = x_ref[:].reshape(TB * B, D)
        gi = (
            _mxu(x, wih_ref[:])
            + bih_ref[0].astype(jnp.float32)
        )
        hp = hp_ref[:].astype(jnp.float32).reshape(TB * B, H)
        gh = (
            _mxu(hp.astype(whh_ref.dtype), whh_ref[:])
            + bhh_ref[0].astype(jnp.float32)
        )
        rz = _sigmoid(gi[:, : 2 * H] + gh[:, : 2 * H])
        r, z = rz[:, :H], rz[:, H:]
        gh_n = gh[:, 2 * H :]
        n = jnp.tanh(gi[:, 2 * H :] + r * gh_n)
        # slot 0 pre-folds dr_pre = dn_pre * (gh_n * r * (1 - r))
        gates_ref[:] = jnp.concatenate(
            [gh_n * r * (1.0 - r), z, n, r], axis=1
        ).reshape(TB, B, 4 * H)

    precompute(xf_ref, hpf_ref, wihf_ref, bihf_ref, whhf_ref, bhhf_ref, gatesf_ref)
    precompute(xb_ref, hpb_ref, wihb_ref, bihb_ref, whhb_ref, bhhb_ref, gatesb_ref)

    def one(u, dh_in, hp_ref, dy_ref, gates_ref, whht_ref, dgi_ref):
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
        dgi_ref[u] = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        dh_out = (
            _mxu(dgh.astype(whht_ref.dtype), whht_ref[:])
            + dh * z
        )
        return dh_out

    def step(u, carry):
        dhf, dhb = carry
        dhf = one(u, dhf, hpf_ref, dyf_ref, gatesf_ref, whhtf_ref, dgif_ref)
        dhb = one(u, dhb, hpb_ref, dyb_ref, gatesb_ref, whhtb_ref, dgib_ref)
        return dhf, dhb

    dhf, dhb = jax.lax.fori_loop(0, TB, step, (dhf_ref[:], dhb_ref[:]), unroll=_step_unroll(TB))
    dhf_ref[:] = dhf
    dhb_ref[:] = dhb

    def epilogue(x_ref, hp_ref, gates_ref, dgi_ref, wiht_ref,
                 dx_ref, dwih_ref, dbih_ref, dwhh_ref, dbhh_ref):
        dgi = dgi_ref[:].reshape(TB * B, 3 * H)
        x = x_ref[:].reshape(TB * B, D)
        hp = hp_ref[:].astype(jnp.float32).reshape(TB * B, H)
        r = gates_ref[:].reshape(TB * B, 4 * H)[:, 3 * H :]
        # dgh differs from dgi only in the n slot (scaled by r)
        dgh = jnp.concatenate([dgi[:, : 2 * H], dgi[:, 2 * H :] * r], axis=1)
        dx_ref[:] = _mxu(dgi.astype(wiht_ref.dtype), wiht_ref[:]).reshape(TB, B, D).astype(dx_ref.dtype)
        dwih_ref[:] += _mxu(x.T.astype(jnp.float32), dgi)
        dbih_ref[:] += jnp.sum(dgi, axis=0, keepdims=True)
        dwhh_ref[:] += _mxu(hp.T, dgh)
        dbhh_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)

    epilogue(xf_ref, hpf_ref, gatesf_ref, dgif_ref, wihtf_ref,
             dxf_ref, dwihf_ref, dbihf_ref, dwhhf_ref, dbhhf_ref)
    epilogue(xb_ref, hpb_ref, gatesb_ref, dgib_ref, wihtb_ref,
             dxb_ref, dwihb_ref, dbihb_ref, dwhhb_ref, dbhhb_ref)


def _fused_bwd_call(x_f, x_b, hp_f, hp_b, dy_f, dy_b,
                    wih_f, bih_f, whh_f, bhh_f,
                    wih_b, bih_b, whh_b, bhh_b, tb: int):
    Tp, B, D = x_f.shape
    H = whh_f.shape[0]
    threeH = 3 * H
    dt = x_f.dtype
    stream_x = pl.BlockSpec((tb, B, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    stream_h = pl.BlockSpec((tb, B, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    fixed_ih = pl.BlockSpec((D, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fixed_hh = pl.BlockSpec((H, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fixed_b = pl.BlockSpec((1, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grads_shape = [
        jax.ShapeDtypeStruct((D, threeH), jnp.float32),
        jax.ShapeDtypeStruct((1, threeH), jnp.float32),
        jax.ShapeDtypeStruct((H, threeH), jnp.float32),
        jax.ShapeDtypeStruct((1, threeH), jnp.float32),
    ]
    return pl.pallas_call(
        _fused_bwd_kernel,
        grid=(Tp // tb,),
        in_specs=[stream_x, stream_x, stream_h, stream_h, stream_h, stream_h]
                 + [full] * 12,
        out_specs=[stream_x, stream_x,
                   fixed_ih, fixed_b, fixed_hh, fixed_b,
                   fixed_ih, fixed_b, fixed_hh, fixed_b],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, D), dt),
            jax.ShapeDtypeStruct((Tp, B, D), dt),
        ] + grads_shape + grads_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((tb, B, 4 * H), jnp.float32),
            pltpu.VMEM((tb, B, 4 * H), jnp.float32),
            pltpu.VMEM((tb, B, 3 * H), jnp.float32),
            pltpu.VMEM((tb, B, 3 * H), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(x_f, x_b, hp_f, hp_b, dy_f, dy_b,
      wih_f.astype(dt), wih_f.T.astype(dt), bih_f[None, :],
      whh_f.astype(dt), whh_f.T.astype(dt), bhh_f[None, :],
      wih_b.astype(dt), wih_b.T.astype(dt), bih_b[None, :],
      whh_b.astype(dt), whh_b.T.astype(dt), bhh_b[None, :])


_BIGRU_CACHE: dict = {}


def _bigru_seq_for(tb_fwd: int, tb_bwd: int):
    """Block-size-keyed fused joint-bidirectional GRU with custom VJP.

    Block sizes are trace-time constants: training uses (TIME_BLOCK,
    BWD_TIME_BLOCK) scaled down by ``_auto_tb`` for large batches;
    inference-only traces can use a larger forward block (fewer grid
    iterations; the backward block is independent).
    """
    key = (tb_fwd, tb_bwd)
    if key in _BIGRU_CACHE:
        return _BIGRU_CACHE[key]

    @jax.custom_vjp
    def _bigru_seq(x_f, x_b, wih_f, bih_f, whh_f, bhh_f, wih_b, bih_b, whh_b, bhh_b):
        """Joint bidirectional GRU over processing-order input streams.

        x_f: forward-direction inputs (Tp, B, D); x_b: backward-direction
        inputs, ALREADY arranged in that direction's processing order.
        Returns (h_f, h_b) in processing order.
        """
        return tuple(_fused_fwd_call(
            x_f, x_b, wih_f, bih_f, whh_f, bhh_f, wih_b, bih_b, whh_b, bhh_b, tb_fwd
        ))

    def _fwd(x_f, x_b, wih_f, bih_f, whh_f, bhh_f, wih_b, bih_b, whh_b, bhh_b):
        h_f, h_b = _fused_fwd_call(
            x_f, x_b, wih_f, bih_f, whh_f, bhh_f, wih_b, bih_b, whh_b, bhh_b, tb_fwd
        )
        return (h_f, h_b), (x_f, x_b, h_f, h_b,
                            wih_f, bih_f, whh_f, bhh_f, wih_b, bih_b, whh_b, bhh_b)

    def _bwd(res, dY):
        (x_f, x_b, h_f, h_b,
         wih_f, bih_f, whh_f, bhh_f, wih_b, bih_b, whh_b, bhh_b) = res
        dy_f, dy_b = dY
        Tp, B, _ = x_f.shape
        H = h_f.shape[-1]
        zero = jnp.zeros((1, B, H), h_f.dtype)
        hp_f = jnp.concatenate([zero, h_f[:-1]], axis=0)
        hp_b = jnp.concatenate([zero, h_b[:-1]], axis=0)
        flip = lambda a: jnp.flip(a, axis=0)  # noqa: E731
        (dx_f, dx_b, dwih_f, dbih_f, dwhh_f, dbhh_f,
         dwih_b, dbih_b, dwhh_b, dbhh_b) = _fused_bwd_call(
            flip(x_f), flip(x_b), flip(hp_f), flip(hp_b), flip(dy_f), flip(dy_b),
            wih_f, bih_f, whh_f, bhh_f, wih_b, bih_b, whh_b, bhh_b, tb_bwd,
        )
        return (flip(dx_f), flip(dx_b),
                dwih_f, dbih_f[0], dwhh_f, dbhh_f[0],
                dwih_b, dbih_b[0], dwhh_b, dbhh_b[0])

    _bigru_seq.defvjp(_fwd, _bwd)
    _BIGRU_CACHE[key] = _bigru_seq
    return _bigru_seq


# ---------------------------------------------------------------------------
# Differentiable core
# ---------------------------------------------------------------------------


def _gru1_seq_for(tb_fwd: int, tb_bwd: int):
    key = ("uni", tb_fwd, tb_bwd)
    if key in _BIGRU_CACHE:
        return _BIGRU_CACHE[key]

    @jax.custom_vjp
    def _gru1_seq(x, wih, bih, whh, bhh):
        """Processing-order fused GRU: x (Tp, B, D) -> h (Tp, B, H). h0 = 0."""
        return _fused1_fwd_call(x, wih, bih, whh, bhh, tb_fwd)

    def _fwd(x, wih, bih, whh, bhh):
        h_seq = _fused1_fwd_call(x, wih, bih, whh, bhh, tb_fwd)
        return h_seq, (x, h_seq, wih, bih, whh, bhh)

    def _bwd(res, dY):
        x, h_seq, wih, bih, whh, bhh = res
        Tp, B, _ = x.shape
        H = h_seq.shape[-1]
        hprev = jnp.concatenate([jnp.zeros((1, B, H), h_seq.dtype), h_seq[:-1]], axis=0)
        flip = lambda a: jnp.flip(a, axis=0)  # noqa: E731
        dx, dwih, dbih, dwhh, dbhh = _fused1_bwd_call(
            flip(x), flip(hprev), flip(dY), wih, bih, whh, bhh, tb_bwd
        )
        return flip(dx), dwih, dbih[0], dwhh, dbhh[0]

    _gru1_seq.defvjp(_fwd, _bwd)
    _BIGRU_CACHE[key] = _gru1_seq
    return _gru1_seq


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def _run_direction(params_dir, x, reverse: bool, tb: int | None = None):
    B, T, _ = x.shape
    tb_f = tb or (64 if B <= 8 else _auto_tb(TIME_BLOCK, B))
    tb_b = _auto_tb(BWD_TIME_BLOCK, B)
    xs = jnp.swapaxes(x, 0, 1)  # (T, B, D)
    if reverse:
        xs = jnp.flip(xs, axis=0)
    # lcm, not max: a user override like "pallas:24" must still give a padded
    # length both grids divide, or the backward grid's floor division would
    # silently skip trailing time steps in the gradient.
    quant = math.lcm(tb_f, tb_b)
    Tp = -(-T // quant) * quant
    if Tp != T:
        xs = jnp.pad(xs, ((0, Tp - T), (0, 0), (0, 0)))
    out = _gru1_seq_for(tb_f, tb_b)(
        xs, params_dir["w_ih"], params_dir["b_ih"],
        params_dir["w_hh"], params_dir["b_hh"],
    )
    out = out[:T]
    if reverse:
        out = jnp.flip(out, axis=0)
    return jnp.swapaxes(out, 0, 1)  # (B, T, H)


def _bigru_streams(params, x_f_bt, x_b_bt, tb: int | None):
    """Fused joint kernel over two *processing-order* input streams (B, T, D).

    Returns (h_f, h_b), each (B, T, H) in its stream's own processing order.
    Callers own any time reversal (plain flip for the standard bidirectional
    layer, per-example ``reverse_padded`` for the length-masked path).
    """
    B, T, _ = x_f_bt.shape
    # Tiny batches (single-utterance decode) use a larger forward block:
    # per-block VMEM is no constraint there, and fewer grid iterations
    # amortize the in-kernel input projection that small batches can't.
    tb_f = tb or (64 if B <= 8 else _auto_tb(TIME_BLOCK, B))
    tb_b = _auto_tb(BWD_TIME_BLOCK, B)
    x_f = jnp.swapaxes(x_f_bt, 0, 1)
    x_b = jnp.swapaxes(x_b_bt, 0, 1)
    # padded length must satisfy both grids — lcm so arbitrary user block
    # overrides stay exact (see _run_direction); padding sits at the tail of
    # each direction's processing order, so the h0 = 0 carry enters the valid
    # region untouched
    quant = math.lcm(tb_f, tb_b)
    Tp = -(-T // quant) * quant
    if Tp != T:
        pad = ((0, Tp - T), (0, 0), (0, 0))
        x_f = jnp.pad(x_f, pad)
        x_b = jnp.pad(x_b, pad)
    f, b = params["fwd"], params["bwd"]
    h_f, h_b = _bigru_seq_for(tb_f, tb_b)(
        x_f, x_b,
        f["w_ih"], f["b_ih"], f["w_hh"], f["b_hh"],
        b["w_ih"], b["b_ih"], b["w_hh"], b["b_hh"],
    )
    return jnp.swapaxes(h_f[:T], 0, 1), jnp.swapaxes(h_b[:T], 0, 1)


def gru_apply_pallas(params, x, time_block: int | None = None):
    """Bidirectional (or uni) GRU via the fused kernels. x: (B, T, D).

    Differentiable: gradients flow through the custom-VJP backward kernels.
    Bidirectional layers use the fully-fused joint kernel (both directions
    stepped in the same grid iteration, input projection in-kernel).
    ``time_block`` overrides the forward grid block (e.g. 64 for
    inference-only traces).
    """
    if "bwd" not in params:
        return _run_direction(params["fwd"], x, reverse=False, tb=time_block)
    out_f, h_b = _bigru_streams(params, x, jnp.flip(x, axis=1), time_block)
    out_b = jnp.flip(h_b, axis=1)
    return jnp.concatenate([out_f, out_b], axis=-1)


def bigru_apply_pallas_streams(params, x_fwd, x_bwd, time_block: int | None = None):
    """Joint bidirectional kernel over two pre-arranged input streams.

    ``x_fwd``/``x_bwd``: (B, T, D), each already in its direction's
    *processing order* (the masked path passes the per-example-reversed
    prefix as ``x_bwd``). Returns (out_f, out_b), both (B, T, H), in
    processing order — the caller undoes the reversal.
    """
    return _bigru_streams(params, x_fwd, x_bwd, time_block)


# ---------------------------------------------------------------------------
# Shared-stream joint bidirectional kernels (round 3)
#
# The joint kernels above take each direction's input pre-arranged in its
# own processing order, which costs a materialized jnp.flip copy of the
# layer input (and of dy/hp in the backward pass) plus an unflip of the
# backward outputs — pure HBM traffic the roofline byte model charges
# nowhere. These kernels read ONE natural-time-order stream for both
# directions instead: grid step i streams block i (forward direction) and
# block N-1-i (backward direction) of the *same* array, the backward
# direction walks its block's rows in reverse, and writes its outputs back
# at natural time positions. No flips exist anywhere in the pipeline.
#
# Streams are TIME-MAJOR (T, B, D): pallas BlockSpecs slice, they do not
# transpose, so the (tb, B, D) VMEM blocks the step loop wants must be
# contiguous in HBM. The encoder keeps layer streams time-major end-to-end
# (one transpose at the conv->RNN boundary, one at the stack end).
#
# The layer input arrives as a TUPLE of part streams (the previous layer's
# h_f, h_b, never concatenated): the channel concat the old path
# materialized between every pair of GRU layers is gone; gi = [x1|x2]@W_ih
# happens in VMEM.
#
# Padding (Tp > T, pad rows at the natural end): the forward direction
# walks pads last (outputs sliced off); the backward direction walks them
# FIRST, so its hidden carry is held at zero until the walk enters the
# valid region (one select per step; T is a trace-time constant).
#
# Eval mode fuses the following avg/max ceil-mode downsample into the
# kernel epilogue: outputs are written at the POOLED rate — the byte
# model's "producer writes once, already pooled" floor.
# ---------------------------------------------------------------------------


def _mk_shared_fwd_kernel(n_parts: int, tb: int, T: int, pool: int, method: str,
                          H: int):
    """Generate the shared-stream forward kernel body (static closure)."""

    def kernel(*refs):
        xn = refs[:n_parts]                      # natural block i (fwd dir)
        xr = refs[n_parts:2 * n_parts]           # block N-1-i (bwd dir source)
        (wihf, bihf, whhf, bhhf,
         wihb, bihb, whhb, bhhb) = refs[2 * n_parts:2 * n_parts + 8]
        outf_ref, outb_ref = refs[2 * n_parts + 8:2 * n_parts + 10]
        scratch = refs[2 * n_parts + 10:]
        hf_ref, hb_ref, gif_ref, gib_ref = scratch[:4]
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        B = hf_ref.shape[0]

        @pl.when(i == 0)
        def _():
            hf_ref[:] = jnp.zeros_like(hf_ref)
            hb_ref[:] = jnp.zeros_like(hb_ref)

        def project(x_refs, wih_ref, bih_ref, gi_ref):
            # one batched MXU matmul per block; parts concatenate in VMEM
            xs = [r[:].reshape(tb * B, r.shape[-1]) for r in x_refs]
            x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)
            gi_ref[:] = (
                _mxu(x.astype(wih_ref.dtype), wih_ref[:])
                + bih_ref[0].astype(jnp.float32)
            ).reshape(tb, B, 3 * H)

        project(xn, wihf, bihf, gif_ref)
        project(xr, wihb, bihb, gib_ref)

        def one(gi, h, w_ref, b_ref):
            gh = (
                _mxu(h.astype(w_ref.dtype), w_ref[:])
                + b_ref[0].astype(jnp.float32)
            )
            rz = _sigmoid(gi[:, :2 * H] + gh[:, :2 * H])
            r, z = rz[:, :H], rz[:, H:]
            n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
            return n + z * (h - n)

        t0_rev = (nb - 1 - i) * tb  # global t of row 0 of the bwd-dir block
        if pool == 1:
            bf_ref, bb_ref = outf_ref, outb_ref
        else:
            bf_ref, bb_ref = scratch[4:6]

        def step(u, carry):
            hf, hb = carry
            hf = one(gif_ref[u], hf, whhf, bhhf)
            rb = tb - 1 - u  # bwd dir walks its block's rows in reverse
            hb_new = one(gib_ref[rb], hb, whhb, bhhb)
            # hold the carry at zero through the pad rows the bwd dir walks
            # first; their output rows get the carried zero
            hb = jnp.where(t0_rev + rb < T, hb_new, hb)
            bf_ref[u] = hf.astype(bf_ref.dtype)
            bb_ref[rb] = hb.astype(bb_ref.dtype)
            return hf, hb

        hf, hb = jax.lax.fori_loop(
            0, tb, step, (hf_ref[:], hb_ref[:]), unroll=_step_unroll(tb)
        )
        hf_ref[:] = hf
        hb_ref[:] = hb

        if pool > 1:
            # fused ceil-mode pool: outputs written at the pooled rate.
            # Windows never straddle blocks (pool | tb). torch semantics:
            # avg divides a trailing partial window by its in-range count;
            # max treats out-of-range rows as -inf (ops/conv.py).
            iota = jax.lax.broadcasted_iota(jnp.int32, (tb, 1, 1), 0)
            vf = (i * tb + iota) < T
            vb = (t0_rev + iota) < T

            def pooled(blk_ref, valid, out_ref):
                h = blk_ref[:]
                if method == "max":
                    hm = jnp.where(valid, h, -jnp.inf)
                    out = hm.reshape(tb // pool, pool, B, H).max(axis=1)
                else:
                    hm = jnp.where(valid, h, 0.0)
                    cnt = valid.astype(jnp.float32).reshape(
                        tb // pool, pool, 1, 1
                    ).sum(axis=1)
                    out = hm.reshape(tb // pool, pool, B, H).sum(axis=1) / (
                        jnp.maximum(cnt, 1.0)
                    )
                out_ref[:] = out.astype(out_ref.dtype)

            pooled(bf_ref, vf, outf_ref)
            pooled(bb_ref, vb, outb_ref)

    return kernel


def _rowstack() -> bool:
    """Row-stacked gate chain (opt-in experiment, TPU_SLU_GRU_ROWSTACK=1):
    both directions' gates live in one (2B, 3H) array — rows 0:B forward,
    B:2B backward — so the per-step elementwise chain runs ONCE over both
    directions (~13 vector ops/step instead of ~26), with the per-direction
    recurrent matmuls kept separate (no block-diagonal flop doubling).

    Measured a WASH on the whole encoder forward (two 8-round same-process
    A/Bs at B=128: 0.462 vs 0.477 then 0.524 vs 0.506 best ms — sign flips
    between runs, medians equal). The op-count saving is cancelled by lost
    ILP: the split kernels' two independent per-direction chains already
    saturate the VPU pipeline, so halving the op count while serializing
    into one chain buys nothing. The stages are recurrence-LATENCY-bound
    (docs/KERNELS.md), which neither fewer-wider ops nor more chains move."""
    import os

    return os.environ.get("TPU_SLU_GRU_ROWSTACK") == "1"


def _mk_shared_fwd_kernel_rs(n_parts: int, tb: int, T: int, pool: int,
                             method: str, H: int):
    """Row-stacked variant of the shared-stream forward kernel (_rowstack).

    Same streams/grid/outputs as _mk_shared_fwd_kernel; differences:
    - gi scratch is ONE (tb, 2B, 3H) block: forward rows 0:B in natural
      block-row order, backward rows B:2B pre-reversed at projection time so
      step u reads row u for BOTH directions.
    - bhh's r|z columns are folded into bih at trace time (the rz gate is
      sigmoid(gi + gh) with both biases additive); only bhh's n column
      (multiplied by r) survives as a per-step (2B, H) add.
    - The hidden carry is one (2B, H) array; the pad-hold select masks the
      backward half by row index.
    """

    def kernel(*refs):
        xn = refs[:n_parts]
        xr = refs[n_parts:2 * n_parts]
        (wihf, bihf, whhf, bnf,
         wihb, bihb, whhb, bnb) = refs[2 * n_parts:2 * n_parts + 8]
        outf_ref, outb_ref = refs[2 * n_parts + 8:2 * n_parts + 10]
        scratch = refs[2 * n_parts + 10:]
        h2_ref, gi2_ref = scratch[:2]
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        B = h2_ref.shape[0] // 2

        @pl.when(i == 0)
        def _():
            h2_ref[:] = jnp.zeros_like(h2_ref)

        def cat(x_refs):
            xs = [r[:].reshape(tb * B, r.shape[-1]) for r in x_refs]
            return xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)

        # block-level projections: natural rows for fwd, row-reversed for bwd
        gi2_ref[:, :B, :] = (
            _mxu(cat(xn).astype(wihf.dtype), wihf[:])
            + bihf[0].astype(jnp.float32)
        ).reshape(tb, B, 3 * H)
        # row-reversed block write (static unroll: Mosaic has no rev lowering)
        gib = (
            _mxu(cat(xr).astype(wihb.dtype), wihb[:])
            + bihb[0].astype(jnp.float32)
        ).reshape(tb, B, 3 * H)
        for u in range(tb):
            gi2_ref[u, B:, :] = gib[tb - 1 - u]

        # hoisted per-row constants for the fused chain
        bn2 = jnp.concatenate(
            [
                jnp.broadcast_to(bnf[0].astype(jnp.float32), (B, H)),
                jnp.broadcast_to(bnb[0].astype(jnp.float32), (B, H)),
            ],
            axis=0,
        )
        rows_fwd = jax.lax.broadcasted_iota(jnp.int32, (2 * B, 1), 0) < B

        t0_rev = (nb - 1 - i) * tb
        if pool == 1:
            bf_ref, bb_ref = outf_ref, outb_ref
        else:
            bf_ref, bb_ref = scratch[2:4]

        def step(u, h2):
            rb = tb - 1 - u
            gh2 = jnp.concatenate(
                [
                    _mxu(h2[:B].astype(whhf.dtype), whhf[:]),
                    _mxu(h2[B:].astype(whhb.dtype), whhb[:]),
                ],
                axis=0,
            )
            gi2 = gi2_ref[u]
            rz = _sigmoid(gi2[:, : 2 * H] + gh2[:, : 2 * H])
            r, z = rz[:, :H], rz[:, H:]
            n = jnp.tanh(gi2[:, 2 * H:] + r * (gh2[:, 2 * H:] + bn2))
            h2_new = n + z * (h2 - n)
            # forward rows always advance; backward rows hold through pads
            h2 = jnp.where(
                jnp.logical_or(rows_fwd, t0_rev + rb < T), h2_new, h2
            )
            bf_ref[u] = h2[:B].astype(bf_ref.dtype)
            bb_ref[rb] = h2[B:].astype(bb_ref.dtype)
            return h2

        h2_ref[:] = jax.lax.fori_loop(
            0, tb, step, h2_ref[:], unroll=_step_unroll(tb)
        )

        if pool > 1:
            iota = jax.lax.broadcasted_iota(jnp.int32, (tb, 1, 1), 0)
            vf = (i * tb + iota) < T
            vb = (t0_rev + iota) < T

            def pooled(blk_ref, valid, out_ref):
                h = blk_ref[:]
                if method == "max":
                    hm = jnp.where(valid, h, -jnp.inf)
                    out = hm.reshape(tb // pool, pool, B, H).max(axis=1)
                else:
                    hm = jnp.where(valid, h, 0.0)
                    cnt = valid.astype(jnp.float32).reshape(
                        tb // pool, pool, 1, 1
                    ).sum(axis=1)
                    out = hm.reshape(tb // pool, pool, B, H).sum(axis=1) / (
                        jnp.maximum(cnt, 1.0)
                    )
                out_ref[:] = out.astype(out_ref.dtype)

            pooled(bf_ref, vf, outf_ref)
            pooled(bb_ref, vb, outb_ref)

    return kernel


def _shared_fwd_call(parts, wih_f, bih_f, whh_f, bhh_f,
                     wih_b, bih_b, whh_b, bhh_b, *, tb: int, T: int,
                     pool: int = 1, pool_method: str = "avg"):
    """parts: tuple of natural-order time-major (Tp, B, Dp) streams.

    Returns (h_f, h_b) in natural time order: (Tp, B, H) when pool == 1,
    (Tp//pool, B, H) when the downsample is fused.
    """
    n_parts = len(parts)
    Tp, B, _ = parts[0].shape
    H = whh_f.shape[0]
    dims = tuple(p.shape[-1] for p in parts)
    dt = parts[0].dtype
    N = Tp // tb
    assert Tp % tb == 0 and (pool == 1 or tb % pool == 0)

    def nat(d):
        return pl.BlockSpec((tb, B, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def rev(d):
        return pl.BlockSpec(
            (tb, B, d), lambda i: (N - 1 - i, 0, 0), memory_space=pltpu.VMEM
        )

    to = tb // pool
    out_f = pl.BlockSpec((to, B, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_b = pl.BlockSpec(
        (to, B, H), lambda i: (N - 1 - i, 0, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    if _rowstack():
        # fold bhh's r|z columns into bih (additive in the rz gate); bhh's n
        # column stays a per-step add inside the r* product
        bih_aug_f = bih_f + jnp.concatenate([bhh_f[: 2 * H], jnp.zeros((H,), bhh_f.dtype)])
        bih_aug_b = bih_b + jnp.concatenate([bhh_b[: 2 * H], jnp.zeros((H,), bhh_b.dtype)])
        scratch = [
            pltpu.VMEM((2 * B, H), jnp.float32),
            pltpu.VMEM((tb, 2 * B, 3 * H), jnp.float32),
        ]
        if pool > 1:
            scratch += [
                pltpu.VMEM((tb, B, H), jnp.float32),
                pltpu.VMEM((tb, B, H), jnp.float32),
            ]
        return pl.pallas_call(
            _mk_shared_fwd_kernel_rs(n_parts, tb, T, pool, pool_method, H),
            grid=(N,),
            in_specs=[nat(d) for d in dims] + [rev(d) for d in dims] + [full] * 8,
            out_specs=[out_f, out_b],
            out_shape=[jax.ShapeDtypeStruct((Tp // pool, B, H), dt)] * 2,
            scratch_shapes=scratch,
            compiler_params=_vmem_params(),
            interpret=_interpret(),
        )(*parts, *parts,
          wih_f.astype(dt), bih_aug_f[None, :], whh_f.astype(dt), bhh_f[None, 2 * H:],
          wih_b.astype(dt), bih_aug_b[None, :], whh_b.astype(dt), bhh_b[None, 2 * H:])
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((tb, B, 3 * H), jnp.float32),
        pltpu.VMEM((tb, B, 3 * H), jnp.float32),
    ]
    if pool > 1:
        scratch += [
            pltpu.VMEM((tb, B, H), jnp.float32),
            pltpu.VMEM((tb, B, H), jnp.float32),
        ]
    return pl.pallas_call(
        _mk_shared_fwd_kernel(n_parts, tb, T, pool, pool_method, H),
        grid=(N,),
        in_specs=[nat(d) for d in dims] + [rev(d) for d in dims] + [full] * 8,
        out_specs=[out_f, out_b],
        out_shape=[jax.ShapeDtypeStruct((Tp // pool, B, H), dt)] * 2,
        scratch_shapes=scratch,
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(*parts, *parts,
      wih_f.astype(dt), bih_f[None, :], whh_f.astype(dt), bhh_f[None, :],
      wih_b.astype(dt), bih_b[None, :], whh_b.astype(dt), bhh_b[None, :])


# ---------------------------------------------------------------------------
# Train-path fused dropout + ceil-avg-pool (round 4)
#
# The eval path has written pooled streams since round 3; the TRAIN path kept
# paying full-rate inter-layer traffic (VERDICT r3): the kernel wrote (T,B,H)
# per direction, XLA applied dropout and the avg ceil-pool, the backward
# re-read everything at full rate, and the hp = shift(h) residual cost one
# more full-rate read+write pass per direction. This core removes all of it
# while preserving the reference's EXACT semantics (dropout at the full
# frame rate, THEN the ceil-mode avg pool — reference models.py:230-253):
#
# * The forward kernel writes (a) the h_prev residual streams DIRECTLY
#   (h_prev is the step carry — no XLA shift pass) and (b) the
#   dropout+pooled next-layer inputs at the pooled rate. The (T, B, H)
#   layer outputs themselves never touch HBM.
# * Dropout masks are regenerated, never stored: a counter-based uint32
#   hash of the NATURAL (t, b, h) coordinates and a traced per-layer seed
#   (plain VPU ops — works in interpret mode, unlike pltpu.prng_*), so the
#   forward epilogue and the backward prologue compute bit-identical masks.
# * The backward kernel takes the POOLED cotangents and expands them
#   in-kernel: dY_full[t] = keep[t] * dY_pool[t//k] / ((1-p) * cnt(window)),
#   zeroed past T — the full-rate dY stream and the unpool pass are gone.
#
# Traffic per layer boundary (B, T, 2H streams): old = write h + read h +
# write pooled (+ mask residual) forward, read pooled + write dY_full + read
# dY_full + read h + write hp + read hp backward; new = write hp + write
# pooled forward, read hp + read pooled backward.
# ---------------------------------------------------------------------------

_DIR_SALT_F = 0x9E3779B9
_DIR_SALT_B = 0x7F4A7C15


def _keep_mask(seed, dir_salt, t0, shape, thresh):
    """Deterministic per-element dropout keep mask.

    Counter-based hash (two rounds of a murmur-style uint32 finalizer) of the
    NATURAL (t, b, h) coordinates plus a traced seed, so forward and backward
    kernels regenerate bit-identical masks with no stored residual. ``t0`` is
    the natural time of the block's row 0 (traced); ``thresh`` compares the
    top 24 hash bits against round(keep_prob * 2^24).
    """
    t = jnp.asarray(t0).astype(jnp.uint32) + jax.lax.broadcasted_iota(
        jnp.uint32, shape, 0
    )
    b = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    hh = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
    x = (
        (seed ^ jnp.uint32(dir_salt))
        + t * jnp.uint32(0x9E3779B1)
        + b * jnp.uint32(0x85EBCA77)
        + hh * jnp.uint32(0xC2B2AE3D)
    )
    for _ in range(2):
        x = x ^ (x >> jnp.uint32(16))
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> jnp.uint32(15))
        x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return (x >> jnp.uint32(8)) < jnp.uint32(thresh)


def _mk_trainpool_fwd_kernel(n_parts: int, tb: int, T: int, pool: int, H: int,
                             thresh, inv_keep: float):
    """Forward kernel of the fused train path (see the section comment)."""

    def kernel(*refs):
        seed_ref = refs[0]
        xn = refs[1:1 + n_parts]
        xr = refs[1 + n_parts:1 + 2 * n_parts]
        (wihf, bihf, whhf, bhhf,
         wihb, bihb, whhb, bhhb) = refs[1 + 2 * n_parts:9 + 2 * n_parts]
        hpf_ref, hpb_ref, pf_ref, pb_ref = refs[9 + 2 * n_parts:13 + 2 * n_parts]
        hf_ref, hb_ref, gif_ref, gib_ref, bf_ref, bb_ref = refs[13 + 2 * n_parts:]
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        B = hf_ref.shape[0]

        @pl.when(i == 0)
        def _():
            hf_ref[:] = jnp.zeros_like(hf_ref)
            hb_ref[:] = jnp.zeros_like(hb_ref)

        def project(x_refs, wih_ref, bih_ref, gi_ref):
            xs = [r[:].reshape(tb * B, r.shape[-1]) for r in x_refs]
            x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)
            gi_ref[:] = (
                _mxu(x.astype(wih_ref.dtype), wih_ref[:])
                + bih_ref[0].astype(jnp.float32)
            ).reshape(tb, B, 3 * H)

        project(xn, wihf, bihf, gif_ref)
        project(xr, wihb, bihb, gib_ref)

        def one(gi, h, w_ref, b_ref):
            gh = (
                _mxu(h.astype(w_ref.dtype), w_ref[:])
                + b_ref[0].astype(jnp.float32)
            )
            rz = _sigmoid(gi[:, :2 * H] + gh[:, :2 * H])
            r, z = rz[:, :H], rz[:, H:]
            n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
            return n + z * (h - n)

        t0f = i * tb
        t0b = (nb - 1 - i) * tb  # natural t of row 0 of the bwd-dir block

        def step(u, carry):
            hf, hb = carry
            # h_prev residuals written straight from the carries: the fwd
            # direction's previous-step h at natural row u, the bwd
            # direction's at natural row rb (= h at rb+1; held 0 past T).
            hpf_ref[u] = hf.astype(hpf_ref.dtype)
            hf = one(gif_ref[u], hf, whhf, bhhf)
            rb = tb - 1 - u
            hpb_ref[rb] = hb.astype(hpb_ref.dtype)
            hb_new = one(gib_ref[rb], hb, whhb, bhhb)
            hb = jnp.where(t0b + rb < T, hb_new, hb)
            bf_ref[u] = hf
            bb_ref[rb] = hb
            return hf, hb

        hf, hb = jax.lax.fori_loop(
            0, tb, step, (hf_ref[:], hb_ref[:]), unroll=_step_unroll(tb)
        )
        hf_ref[:] = hf
        hb_ref[:] = hb

        iota = jax.lax.broadcasted_iota(jnp.int32, (tb, 1, 1), 0)

        def emit(blk_ref, t0, dir_salt, out_ref):
            h = blk_ref[:]
            if thresh is not None:
                keep = _keep_mask(seed_ref[0], dir_salt, t0, (tb, B, H), thresh)
                h = jnp.where(keep, h * inv_keep, 0.0)
            if pool == 1:
                out_ref[:] = h.astype(out_ref.dtype)
            else:
                valid = (t0 + iota) < T
                hm = jnp.where(valid, h, 0.0)
                cnt = valid.astype(jnp.float32).reshape(
                    tb // pool, pool, 1, 1
                ).sum(axis=1)
                out = hm.reshape(tb // pool, pool, B, H).sum(axis=1) / (
                    jnp.maximum(cnt, 1.0)
                )
                out_ref[:] = out.astype(out_ref.dtype)

        emit(bf_ref, t0f, _DIR_SALT_F, pf_ref)
        emit(bb_ref, t0b, _DIR_SALT_B, pb_ref)

    return kernel


def _trainpool_fwd_call(parts, seed, wih_f, bih_f, whh_f, bhh_f,
                        wih_b, bih_b, whh_b, bhh_b, *, tb: int, T: int,
                        pool: int, drop_p: float):
    """Returns (hp_f, hp_b, pooled_f, pooled_b); see the section comment."""
    n_parts = len(parts)
    Tp, B, _ = parts[0].shape
    H = whh_f.shape[0]
    dims = tuple(p.shape[-1] for p in parts)
    dt = parts[0].dtype
    N = Tp // tb
    assert Tp % tb == 0 and tb % pool == 0
    thresh = None if drop_p <= 0.0 else int(round((1.0 - drop_p) * (1 << 24)))
    inv_keep = 1.0 / (1.0 - drop_p) if drop_p > 0.0 else 1.0

    def nat(d, blk=None):
        return pl.BlockSpec(
            (blk or tb, B, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def rev(d, blk=None):
        return pl.BlockSpec(
            (blk or tb, B, d), lambda i: (N - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    to = tb // pool
    return pl.pallas_call(
        _mk_trainpool_fwd_kernel(n_parts, tb, T, pool, H, thresh, inv_keep),
        grid=(N,),
        in_specs=[smem] + [nat(d) for d in dims] + [rev(d) for d in dims]
                 + [full] * 8,
        out_specs=[nat(H), rev(H), nat(H, to), rev(H, to)],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), dt),
            jax.ShapeDtypeStruct((Tp, B, H), dt),
            jax.ShapeDtypeStruct((Tp // pool, B, H), dt),
            jax.ShapeDtypeStruct((Tp // pool, B, H), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((tb, B, 3 * H), jnp.float32),
            pltpu.VMEM((tb, B, 3 * H), jnp.float32),
            pltpu.VMEM((tb, B, H), jnp.float32),
            pltpu.VMEM((tb, B, H), jnp.float32),
        ],
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(seed, *parts, *parts,
      wih_f.astype(dt), bih_f[None, :], whh_f.astype(dt), bhh_f[None, :],
      wih_b.astype(dt), bih_b[None, :], whh_b.astype(dt), bhh_b[None, :])


def _mk_shared_bwd_kernel(n_parts: int, tb: int, T: int, H: int, dims,
                          pool: int = 1, thresh=None, inv_keep: float = 1.0):
    """Gradient kernel: fwd-dir grad walks blocks N-1..0 (rows reversed),
    bwd-dir grad walks blocks 0..N-1 (rows natural) — both over the same
    natural-order streams, no flip copies anywhere.

    Fused-train mode (``pool > 1`` or a dropout ``thresh``): the dy refs are
    POOLED cotangent blocks; a prologue expands them to full rate in VMEM —
    dY_full[t] = keep[t] * dY_pool[t//pool] / (inv_keep^-1 * cnt(window)),
    zeroed past T — with the keep mask regenerated from the traced seed (the
    first ref) exactly as the forward epilogue generated it."""
    fused = pool > 1 or thresh is not None

    def kernel(*refs):
        k = 0
        if fused:
            seed_ref = refs[0]; k = 1
        xr = refs[k:k + n_parts]; k += n_parts   # block N-1-i (fwd-dir grad)
        xn = refs[k:k + n_parts]; k += n_parts   # block i (bwd-dir grad)
        hpf_ref, dyf_ref, hpb_ref, dyb_ref = refs[k:k + 4]; k += 4
        (wihf, wihtf, whhf, whhtf, bihf, bhhf,
         wihb, wihtb, whhb, whhtb, bihb, bhhb) = refs[k:k + 12]; k += 12
        dxf = refs[k:k + n_parts]; k += n_parts
        dxb = refs[k:k + n_parts]; k += n_parts
        (dwihf_ref, dbihf_ref, dwhhf_ref, dbhhf_ref,
         dwihb_ref, dbihb_ref, dwhhb_ref, dbhhb_ref) = refs[k:k + 8]; k += 8
        (dhf_ref, dhb_ref, gatesf_ref, gatesb_ref,
         dgif_ref, dgib_ref) = refs[k:k + 6]; k += 6
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        B = dhf_ref.shape[0]

        if fused:
            dyfx_ref, dybx_ref = refs[k:k + 2]
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (tb, 1, 1), 0)

            def expand(dyp_ref, t0, dir_salt, out_scr):
                valid = (t0 + iota_t) < T
                if pool > 1:
                    cnt = valid.astype(jnp.float32).reshape(
                        tb // pool, pool, 1, 1
                    ).sum(axis=1)
                    d = dyp_ref[:].astype(jnp.float32) / jnp.maximum(cnt, 1.0)
                    d = jnp.broadcast_to(
                        d[:, None], (tb // pool, pool, B, H)
                    ).reshape(tb, B, H)
                else:
                    d = dyp_ref[:].astype(jnp.float32)
                d = jnp.where(valid, d, 0.0)
                if thresh is not None:
                    keep = _keep_mask(seed_ref[0], dir_salt, t0, (tb, B, H), thresh)
                    d = jnp.where(keep, d * inv_keep, 0.0)
                out_scr[:] = d

            expand(dyf_ref, (nb - 1 - i) * tb, _DIR_SALT_F, dyfx_ref)
            expand(dyb_ref, i * tb, _DIR_SALT_B, dybx_ref)
            dyf_ref, dyb_ref = dyfx_ref, dybx_ref

        @pl.when(i == 0)
        def _():
            for ref in (dhf_ref, dhb_ref, dwihf_ref, dbihf_ref, dwhhf_ref,
                        dbhhf_ref, dwihb_ref, dbihb_ref, dwhhb_ref, dbhhb_ref):
                ref[:] = jnp.zeros_like(ref)

        def cat(x_refs):
            xs = [r[:].reshape(tb * B, r.shape[-1]) for r in x_refs]
            return xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)

        def precompute(x_refs, hp_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                       gates_ref):
            gi = (
                _mxu(cat(x_refs).astype(wih_ref.dtype), wih_ref[:])
                + bih_ref[0].astype(jnp.float32)
            )
            hp = hp_ref[:].astype(jnp.float32).reshape(tb * B, H)
            gh = (
                _mxu(hp.astype(whh_ref.dtype), whh_ref[:])
                + bhh_ref[0].astype(jnp.float32)
            )
            rz = _sigmoid(gi[:, :2 * H] + gh[:, :2 * H])
            r, z = rz[:, :H], rz[:, H:]
            gh_n = gh[:, 2 * H:]
            n = jnp.tanh(gi[:, 2 * H:] + r * gh_n)
            gates_ref[:] = jnp.concatenate(
                [gh_n * r * (1.0 - r), z, n, r], axis=1
            ).reshape(tb, B, 4 * H)

        precompute(xr, hpf_ref, wihf, bihf, whhf, bhhf, gatesf_ref)
        precompute(xn, hpb_ref, wihb, bihb, whhb, bhhb, gatesb_ref)

        def grads_at(u, dh_in, hp_ref, dy_ref, gates_ref):
            h_prev = hp_ref[u].astype(jnp.float32)
            dh = dh_in + dy_ref[u].astype(jnp.float32)
            g = gates_ref[u]
            rfac = g[:, :H]
            z = g[:, H:2 * H]
            n = g[:, 2 * H:3 * H]
            r = g[:, 3 * H:]
            dn_pre = dh * (1.0 - z) * (1.0 - n * n)
            dz_pre = dh * (h_prev - n) * z * (1.0 - z)
            dr_pre = dn_pre * rfac
            dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
            dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)
            return dgi, dgh, dh * z

        t0b = i * tb  # global t of row 0 of the bwd-dir-grad block

        def step(u, carry):
            dhf, dhb = carry
            # fwd-dir grad: time descending -> rows reversed. Pads come
            # first with dy = 0, so dh stays 0 through them (no mask).
            rf = tb - 1 - u
            dgi_f, dgh_f, keep_f = grads_at(rf, dhf, hpf_ref, dyf_ref, gatesf_ref)
            dgif_ref[rf] = dgi_f
            dhf = (
                _mxu(dgh_f.astype(whhtf.dtype), whhtf[:])
                + keep_f
            )
            # bwd-dir grad: time ascending, pads at the END of the walk
            # with dh possibly nonzero -> mask dgi so the batched dW/db
            # epilogue accumulates exactly zero there.
            dgi_b, dgh_b, keep_b = grads_at(u, dhb, hpb_ref, dyb_ref, gatesb_ref)
            dgib_ref[u] = jnp.where(t0b + u < T, dgi_b, 0.0)
            dhb = (
                _mxu(dgh_b.astype(whhtb.dtype), whhtb[:])
                + keep_b
            )
            return dhf, dhb

        dhf, dhb = jax.lax.fori_loop(0, tb, step, (dhf_ref[:], dhb_ref[:]), unroll=_step_unroll(tb))
        dhf_ref[:] = dhf
        dhb_ref[:] = dhb

        def epilogue(x_refs, hp_ref, gates_ref, dgi_ref, wiht_ref, dx_refs,
                     dwih_ref, dbih_ref, dwhh_ref, dbhh_ref):
            dgi = dgi_ref[:].reshape(tb * B, 3 * H)
            x = cat(x_refs)
            hp = hp_ref[:].astype(jnp.float32).reshape(tb * B, H)
            r = gates_ref[:].reshape(tb * B, 4 * H)[:, 3 * H:]
            dgh = jnp.concatenate([dgi[:, :2 * H], dgi[:, 2 * H:] * r], axis=1)
            dx = _mxu(dgi.astype(wiht_ref.dtype), wiht_ref[:])
            off = 0
            for dx_ref, d in zip(dx_refs, dims):
                dx_ref[:] = dx[:, off:off + d].reshape(tb, B, d).astype(dx_ref.dtype)
                off += d
            dwih_ref[:] += _mxu(x.T.astype(jnp.float32), dgi)
            dbih_ref[:] += jnp.sum(dgi, axis=0, keepdims=True)
            dwhh_ref[:] += _mxu(hp.T, dgh)
            dbhh_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)

        epilogue(xr, hpf_ref, gatesf_ref, dgif_ref, wihtf, dxf,
                 dwihf_ref, dbihf_ref, dwhhf_ref, dbhhf_ref)
        epilogue(xn, hpb_ref, gatesb_ref, dgib_ref, wihtb, dxb,
                 dwihb_ref, dbihb_ref, dwhhb_ref, dbhhb_ref)

    return kernel


def _shared_bwd_call(parts, hp_f, hp_b, dy_f, dy_b,
                     wih_f, bih_f, whh_f, bhh_f,
                     wih_b, bih_b, whh_b, bhh_b, *, tb: int, T: int,
                     pool: int = 1, drop_p: float = 0.0, seed=None):
    n_parts = len(parts)
    Tp, B, _ = parts[0].shape
    H = whh_f.shape[0]
    threeH = 3 * H
    dims = tuple(p.shape[-1] for p in parts)
    D = sum(dims)
    dt = parts[0].dtype
    N = Tp // tb
    thresh = None if drop_p <= 0.0 else int(round((1.0 - drop_p) * (1 << 24)))
    inv_keep = 1.0 / (1.0 - drop_p) if drop_p > 0.0 else 1.0
    fused = pool > 1 or thresh is not None
    assert tb % pool == 0

    def nat(d, blk=None):
        return pl.BlockSpec(
            (blk or tb, B, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def rev(d, blk=None):
        return pl.BlockSpec(
            (blk or tb, B, d), lambda i: (N - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    fixed_ih = pl.BlockSpec((D, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fixed_hh = pl.BlockSpec((H, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fixed_b = pl.BlockSpec((1, threeH), lambda i: (0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    grads_shape = [
        jax.ShapeDtypeStruct((D, threeH), jnp.float32),
        jax.ShapeDtypeStruct((1, threeH), jnp.float32),
        jax.ShapeDtypeStruct((H, threeH), jnp.float32),
        jax.ShapeDtypeStruct((1, threeH), jnp.float32),
    ]
    to = tb // pool
    lead = []
    dy_specs = [rev(H), nat(H)]
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((tb, B, 4 * H), jnp.float32),
        pltpu.VMEM((tb, B, 4 * H), jnp.float32),
        pltpu.VMEM((tb, B, 3 * H), jnp.float32),
        pltpu.VMEM((tb, B, 3 * H), jnp.float32),
    ]
    if fused:
        lead = [seed]
        dy_specs = [rev(H, to), nat(H, to)]
        scratch += [
            pltpu.VMEM((tb, B, H), jnp.float32),
            pltpu.VMEM((tb, B, H), jnp.float32),
        ]
    out = pl.pallas_call(
        _mk_shared_bwd_kernel(n_parts, tb, T, H, dims, pool, thresh, inv_keep),
        grid=(N,),
        in_specs=(
            ([pl.BlockSpec(memory_space=pltpu.SMEM)] if fused else [])
            + [rev(d) for d in dims] + [nat(d) for d in dims]
            + [rev(H), dy_specs[0], nat(H), dy_specs[1]]
            + [full] * 12
        ),
        out_specs=(
            [rev(d) for d in dims] + [nat(d) for d in dims]
            + [fixed_ih, fixed_b, fixed_hh, fixed_b] * 2
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((Tp, B, d), dt) for d in dims] * 2
            + grads_shape + grads_shape
        ),
        scratch_shapes=scratch,
        compiler_params=_vmem_params(),
        interpret=_interpret(),
    )(*lead, *parts, *parts, hp_f, dy_f, hp_b, dy_b,
      wih_f.astype(dt), wih_f.T.astype(dt), whh_f.astype(dt),
      whh_f.T.astype(dt), bih_f[None, :], bhh_f[None, :],
      wih_b.astype(dt), wih_b.T.astype(dt), whh_b.astype(dt),
      whh_b.T.astype(dt), bih_b[None, :], bhh_b[None, :])
    dx_f = out[:n_parts]
    dx_b = out[n_parts:2 * n_parts]
    # the two directions' input cotangents land at different grid steps;
    # XLA sums them (one fused elementwise pass)
    dxs = tuple(a + b for a, b in zip(dx_f, dx_b))
    return dxs + tuple(out[2 * n_parts:])


def _shared_train_core_for(tb_f: int, tb_b: int, T: int, dims: tuple):
    """Custom-VJP shared-stream core over padded time-major part streams."""
    key = ("shared", tb_f, tb_b, T, dims)
    if key in _BIGRU_CACHE:
        return _BIGRU_CACHE[key]
    n_parts = len(dims)

    @jax.custom_vjp
    def core(*args):
        parts = args[:n_parts]
        return tuple(_shared_fwd_call(parts, *args[n_parts:], tb=tb_f, T=T))

    def _fwd(*args):
        parts = args[:n_parts]
        h_f, h_b = _shared_fwd_call(parts, *args[n_parts:], tb=tb_f, T=T)
        return (h_f, h_b), (parts, h_f, h_b, args[n_parts:])

    def _bwd(res, dY):
        parts, h_f, h_b, weights = res
        dy_f, dy_b = dY
        Tp, B, _ = parts[0].shape
        H = h_f.shape[-1]
        zero = jnp.zeros((1, B, H), h_f.dtype)
        # previous hidden in each direction's PROCESSING order, at natural
        # time positions: fwd processed t-1 before t; bwd processed t+1.
        hp_f = jnp.concatenate([zero, h_f[:-1]], axis=0)
        hp_b = jnp.concatenate([h_b[1:], zero], axis=0)
        outs = _shared_bwd_call(
            parts, hp_f, hp_b, dy_f, dy_b, *weights, tb=tb_b, T=T
        )
        dxs = outs[:n_parts]
        (dwih_f, dbih_f, dwhh_f, dbhh_f,
         dwih_b, dbih_b, dwhh_b, dbhh_b) = outs[n_parts:]
        return dxs + (dwih_f, dbih_f[0], dwhh_f, dbhh_f[0],
                      dwih_b, dbih_b[0], dwhh_b, dbhh_b[0])

    core.defvjp(_fwd, _bwd)
    _BIGRU_CACHE[key] = core
    return core


def _masked_pool_tm(h, T: int, pool: int, method: str):
    """The fused kernel's masked ceil-pool, as differentiable XLA ops over a
    padded (Tp, B, H) stream — used only to recompute gradients through the
    pooled eval path (see _shared_pooled_core_for)."""
    Tp = h.shape[0]
    valid = (jnp.arange(Tp) < T)[:, None, None]
    if method == "max":
        hm = jnp.where(valid, h, -jnp.inf)
        return hm.reshape(Tp // pool, pool, *h.shape[1:]).max(axis=1)
    hm = jnp.where(valid, h, 0.0)
    cnt = valid.astype(jnp.float32).reshape(Tp // pool, pool, 1, 1).sum(axis=1)
    return hm.reshape(Tp // pool, pool, *h.shape[1:]).sum(axis=1) / jnp.maximum(cnt, 1.0)


def _shared_pooled_core_for(tb_f: int, tb_b: int, T: int, dims: tuple,
                            pool: int, method: str):
    """Pooled eval path with exact gradients on demand.

    The primal runs the fused-pool kernel (outputs written at the pooled
    rate — the cheap path the encoder benchmark measures). If somebody
    differentiates an eval call anyway (e.g. a user's custom loss), the
    backward RECOMPUTES the forward through the full-rate custom-VJP core
    plus a differentiable XLA replica of the kernel's masked pool — exact
    gradients at the cost of a second forward, paid only under AD.
    """
    key = ("pooled", tb_f, tb_b, T, dims, pool, method)
    if key in _BIGRU_CACHE:
        return _BIGRU_CACHE[key]
    n_parts = len(dims)

    def run(*args):
        return tuple(_shared_fwd_call(
            args[:n_parts], *args[n_parts:], tb=tb_f, T=T,
            pool=pool, pool_method=method,
        ))

    @jax.custom_vjp
    def core(*args):
        return run(*args)

    def _fwd(*args):
        return run(*args), args

    def _bwd(args, dY):
        train_core = _shared_train_core_for(tb_f, tb_b, T, dims)

        def composite(*a):
            h_f, h_b = train_core(*a)
            return _masked_pool_tm(h_f, T, pool, method), _masked_pool_tm(
                h_b, T, pool, method
            )

        _, vjp_fn = jax.vjp(composite, *args)
        return vjp_fn(dY)

    core.defvjp(_fwd, _bwd)
    _BIGRU_CACHE[key] = core
    return core


def _shared_trainpool_core_for(tb_f: int, tb_b: int, T: int, dims: tuple,
                               pool: int, drop_p: float):
    """Custom-VJP core of the fused train path (dropout + ceil-avg-pool).

    Args are ``(seed_f32, *parts, *weights)`` — the uint32 dropout seed rides
    as a bitcast float32 so the VJP can return an ordinary zero cotangent.
    Forward returns the pooled, dropped streams; residuals are the h_prev
    streams the forward kernel wrote directly (no XLA shift pass). Backward
    feeds the POOLED cotangents straight to the fused backward kernel.
    """
    key = ("trainpool", tb_f, tb_b, T, dims, pool, round(float(drop_p), 6))
    if key in _BIGRU_CACHE:
        return _BIGRU_CACHE[key]
    n_parts = len(dims)

    def run(seed_f, *args):
        seed = jax.lax.bitcast_convert_type(seed_f, jnp.uint32)
        return _trainpool_fwd_call(
            args[:n_parts], seed, *args[n_parts:],
            tb=tb_f, T=T, pool=pool, drop_p=drop_p,
        )

    @jax.custom_vjp
    def core(seed_f, *args):
        _, _, p_f, p_b = run(seed_f, *args)
        return p_f, p_b

    def _fwd(seed_f, *args):
        hp_f, hp_b, p_f, p_b = run(seed_f, *args)
        return (p_f, p_b), (seed_f, args[:n_parts], hp_f, hp_b, args[n_parts:])

    def _bwd(res, dY):
        seed_f, parts, hp_f, hp_b, weights = res
        dy_f, dy_b = dY
        seed = jax.lax.bitcast_convert_type(seed_f, jnp.uint32)
        outs = _shared_bwd_call(
            parts, hp_f, hp_b, dy_f, dy_b, *weights,
            tb=tb_b, T=T, pool=pool, drop_p=drop_p, seed=seed,
        )
        dxs = outs[:n_parts]
        (dwih_f, dbih_f, dwhh_f, dbhh_f,
         dwih_b, dbih_b, dwhh_b, dbhh_b) = outs[n_parts:]
        return (jnp.zeros_like(seed_f),) + dxs + (
            dwih_f, dbih_f[0], dwhh_f, dbhh_f[0],
            dwih_b, dbih_b[0], dwhh_b, dbhh_b[0],
        )

    core.defvjp(_fwd, _bwd)
    _BIGRU_CACHE[key] = core
    return core


def bigru_apply_shared(params, parts, *, time_block: int | None = None,
                       train: bool = False, pool: int = 1,
                       pool_method: str = "avg", drop_p: float = 0.0,
                       drop_seed=None):
    """Shared-stream joint bidirectional GRU over time-major part streams.

    ``parts``: tuple of (T, B, Dp) natural-order streams (the previous
    layer's h_f/h_b, or the single conv-stack output). Returns
    ``(h_f, h_b, pooled)`` with both outputs time-major in natural order:

    * ``train=True`` — full-rate (T, B, H) outputs through the custom-VJP
      core (gradients flow; the caller applies dropout/downsample).
    * ``train=True`` with ``pool > 1``, ``pool_method == "avg"`` and a
      ``drop_seed`` — the FUSED TRAIN PATH: dropout (rate ``drop_p``, at the
      full frame rate, exactly the reference's dropout-then-pool order) and
      the ceil-mode avg pool both run in the kernel epilogue; outputs are
      (ceil(T/pool), B, H) and ``pooled=True``. The caller must NOT apply
      dropout or downsample again. ``drop_seed``: (1,) uint32, fresh per
      layer per step (masks regenerate from it in the backward kernel).
    * ``train=False`` with ``pool > 1`` and an eligible method — the
      ceil-mode downsample fuses into the kernel epilogue and the outputs
      are (ceil(T/pool), B, H); ``pooled=True``. The pooled eval path stays
      differentiable on demand: its custom VJP recomputes the full-rate
      forward and runs the exact tb_b-grid backward kernel
      (tests/test_pallas_gru.py::test_pooled_eval_path_is_differentiable).
    """
    T, B, _ = parts[0].shape
    tb_f = time_block or (64 if B <= 8 else _auto_tb(TIME_BLOCK, B))
    tb_b = _auto_tb(BWD_TIME_BLOCK, B)
    f, b = params["fwd"], params["bwd"]
    weights = (f["w_ih"], f["b_ih"], f["w_hh"], f["b_hh"],
               b["w_ih"], b["b_ih"], b["w_hh"], b["b_hh"])
    # lcm quantization keeps the backward grid exact for any block override
    # — and the eval paths stay differentiable-on-demand, whose backward
    # runs the tb_b-grid kernel over the same padded streams.
    quant = math.lcm(tb_f, tb_b)
    Tp = -(-T // quant) * quant
    if Tp != T:
        parts = tuple(jnp.pad(p, ((0, Tp - T), (0, 0), (0, 0))) for p in parts)
    dims = tuple(p.shape[-1] for p in parts)
    if not train and pool > 1 and pool_method in ("avg", "max") and tb_f % pool == 0:
        core = _shared_pooled_core_for(tb_f, tb_b, T, dims, pool, pool_method)
        h_f, h_b = core(*parts, *weights)
        To = -(-T // pool)
        return h_f[:To], h_b[:To], True
    if (train and drop_seed is not None and pool_method == "avg"
            and (pool > 1 or drop_p > 0.0)
            and tb_f % pool == 0 and tb_b % pool == 0):
        core = _shared_trainpool_core_for(tb_f, tb_b, T, dims, pool, float(drop_p))
        seed_f = jax.lax.bitcast_convert_type(
            jnp.asarray(drop_seed, jnp.uint32).reshape(1), jnp.float32
        )
        p_f, p_b = core(seed_f, *parts, *weights)
        To = -(-T // pool)
        return p_f[:To], p_b[:To], True
    core = _shared_train_core_for(tb_f, tb_b, T, dims)
    h_f, h_b = core(*parts, *weights)
    return h_f[:T], h_b[:T], False
