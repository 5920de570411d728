"""Fused SincNet front end: framed conv + |.| + ceil max-pool in one kernel.

The XLA lowering of sinc -> abs -> pool materializes the full-rate (B, F,
t_out) conv output to HBM and reads it back for the pool (~49 MB extra per
B=128 forward that the roofline byte model charges nowhere). This kernel
computes the frame-decomposed conv (the same math as ops/conv.py
``_conv1d_framed``: out[b,t,f] = sum_j frames[b,t+j] . W'_j), takes the
magnitude, ceil-max-pools over time, and applies the activation — writing
only the POOLED, channels-last (B, t_out/pool, F) tensor.

Frame blocks need a (nseg-1)-row halo; BlockSpecs cannot overlap, so the
frames array is passed twice (block i and block i+1) and the halo rows are
stitched in VMEM — the same two-spec trick as the shared-stream GRU kernels.

Eval fast path only: the primal runs this kernel; differentiating through it
recomputes via the XLA ops (custom VJP, exact gradients at the cost of a
second forward — the same pattern as ``_shared_pooled_core_for``).

Reference scope: SincLayer + MaxPool + activation, reference
``models.py:49-110,199-220``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_slu.ops.conv import conv1d, max_pool1d_ceil
from tpu_slu.ops.pallas_gru import _interpret, _mxu
from tpu_slu.ops.sinc import sinc_filters

OUT_BLOCK = 32  # output-frame rows per grid step (pre-pool)

_CACHE: dict = {}


def _act(y, act: str):
    if act == "leaky_relu":
        return jax.nn.leaky_relu(y, 0.2)
    return jax.nn.relu(y)


def _mk_kernel(nseg: int, S: int, TBo: int, t_out: int, pool: int, act: str):
    def kernel(fa_ref, fb_ref, w_ref, out_ref):
        i = pl.program_id(0)
        B = fa_ref.shape[0]
        F = w_ref.shape[-1]
        rows = jnp.concatenate([fa_ref[:], fb_ref[:, : nseg - 1]], axis=1)
        # nseg displaced (B*TBo, S) @ (S, F) matmuls. An im2col variant that
        # stitches the overlapping windows into one K=nseg*S contraction
        # does not lower (Mosaic: lane-concat of sublane-offset slices is
        # "result/input offset mismatch on non-concat dimension").
        acc = _mxu(rows[:, 0:TBo].reshape(B * TBo, S), w_ref[0:S])
        for j in range(1, nseg):
            acc += _mxu(
                rows[:, j : j + TBo].reshape(B * TBo, S),
                w_ref[j * S : (j + 1) * S],
            )
        y = jnp.abs(acc).reshape(B, TBo, F)
        # ceil-mode max pool over time with the t_out boundary masked; the
        # post-abs activation is mathematically a no-op for (leaky_)relu but
        # applied anyway for strictness
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, TBo, 1), 1)
        y = jnp.where(i * TBo + iota < t_out, y, -jnp.inf)
        if pool > 1:
            # reshape-max, not strided slices: Mosaic lowers y[:, 0::k] to a
            # gather it does not support in 3D
            y = y.reshape(B, TBo // pool, pool, F).max(axis=2)
        out_ref[:] = _act(y, act).astype(out_ref.dtype)

    return kernel


def _fused_call(frames, w, *, nseg: int, TBo: int, t_out: int, pool: int, act: str):
    B, Tf, S = frames.shape
    F = w.shape[-1]
    N = Tf // TBo - 1  # the final block exists only as halo source
    to = TBo // pool
    return pl.pallas_call(
        _mk_kernel(nseg, S, TBo, t_out, pool, act),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((B, TBo, S), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, TBo, S), lambda i: (0, i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, to, F), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N * to, F), frames.dtype),
        interpret=_interpret(),
    )(frames, frames, w)


def _xla_reference(filt_b1, filt_band, x, filt_dim, fs, stride, padding, pool, act):
    """The exact XLA composition the kernel replaces (bwd recompute path)."""
    from tpu_slu.ops.sinc import sinc_conv

    out = jnp.abs(sinc_conv(filt_b1, filt_band, x[:, None, :], filt_dim, fs, stride, padding))
    out = max_pool1d_ceil(out, pool)                 # (B, F, t_pool)
    return _act(jnp.swapaxes(out, 1, 2), act)        # channels-last


def _core_for(filt_dim: int, fs: int, stride: int, padding: int, pool: int,
              act: str, T: int):
    key = (filt_dim, fs, stride, padding, pool, act, T)
    if key in _CACHE:
        return _CACHE[key]

    nseg = -(-filt_dim // stride)
    t_out = (T + 2 * padding - filt_dim) // stride + 1
    TBo = OUT_BLOCK
    while TBo % pool:
        TBo += 1  # pool must divide the block

    def run(filt_b1, filt_band, x):
        B = x.shape[0]
        filters = sinc_filters(filt_b1, filt_band, filt_dim, fs)  # (F, K)
        F = filters.shape[0]
        S = stride
        # w'[j*S + s, f] = filters[f, j*S + s], zero-padded past K
        wp = jnp.pad(filters, ((0, 0), (0, nseg * S - filt_dim)))
        w = wp.reshape(F, nseg * S).T  # (nseg*S, F)
        # frame view of the padded waveform; one extra block of zero rows
        # serves as the final block's halo source
        N = -(-t_out // TBo)
        need = (N + 1) * TBo * S
        right = need - (T + padding)
        xp = jnp.pad(x, ((0, 0), (padding, max(right, 0))))[:, :need]
        frames = xp.reshape(B, (N + 1) * TBo, S)
        out = _fused_call(
            frames, w, nseg=nseg, TBo=TBo, t_out=t_out, pool=pool, act=act
        )
        return out[:, : -(-t_out // pool)]

    @jax.custom_vjp
    def core(filt_b1, filt_band, x):
        return run(filt_b1, filt_band, x)

    def _fwd(filt_b1, filt_band, x):
        return run(filt_b1, filt_band, x), (filt_b1, filt_band, x)

    def _bwd(res, dY):
        filt_b1, filt_band, x = res

        def composite(b1, band, xx):
            return _xla_reference(
                b1, band, xx, filt_dim, fs, stride, padding, pool, act
            )

        _, vjp_fn = jax.vjp(composite, *res)
        return vjp_fn(dY)

    core.defvjp(_fwd, _bwd)
    _CACHE[key] = core
    return core


def sinc_frontend_fused(filt_b1, filt_band, x, *, filt_dim: int, fs: int,
                        stride: int, padding: int, pool: int,
                        act: str = "leaky_relu"):
    """x (B, T) waveform -> (B, ceil(t_out/pool), F) channels-last.

    One kernel for sinc-conv + |.| + ceil max-pool + activation. Requires
    stride > 1 (frame decomposition) — the caller gates on that.
    """
    core = _core_for(filt_dim, fs, stride, padding, pool, act, x.shape[-1])
    return core(filt_b1, filt_band, x)
