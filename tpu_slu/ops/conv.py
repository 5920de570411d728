"""1-D convolution and pooling primitives with torch-compatible semantics.

Replaces the reference's ``torch.nn.Conv1d`` / ``MaxPool1d(ceil_mode=True)`` /
``avg_pool1d(ceil_mode=True)`` building blocks (reference ``models.py:26-46,
190-207``) with XLA-native ops. All static shapes; convs lower onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# (batch, channel, time) everywhere — matches the reference's NCL layout in
# the conv front-end; the RNN stack uses (batch, time, channel).
_CONV_DIMS = ("NCH", "OIH", "NCH")


def conv1d(x, kernel, bias=None, stride: int = 1, padding: int = 0):
    """Conv1d: x (B, Cin, T), kernel (Cout, Cin, K) -> (B, Cout, T_out).

    Same shape/stride/padding semantics as torch Conv1d with symmetric
    zero-padding (reference models.py:190,200: padding = len_filt // 2).

    Strided single-channel convs with K > stride (the sinc front-end: K=401,
    stride=80) take a frame-decomposition fast path: profiling showed XLA's
    strided-window conv runs at ~11-16 TFLOP/s there (it was ~20% of the
    whole train step, forward + dW). Reshaping the input into stride-sized
    frames turns it into a *dense* stride-1 conv with ``stride`` input
    channels and ceil(K/stride) taps — a proper MXU contraction for the
    forward, dX, and dW alike. Identical math: out[b,f,t] =
    sum_{j,s} frames[b, t+j, s] * w[f, j*stride+s].
    """
    if stride > 1 and x.shape[1] == 1 and kernel.shape[2] > stride:
        return _conv1d_framed(x, kernel, bias, stride, padding)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=_CONV_DIMS,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def _conv1d_framed(x, kernel, bias, stride: int, padding: int):
    """Single-input-channel strided conv as a dense conv over frames.

    x (B, 1, T), kernel (F, 1, K), K > stride. The (T', stride) frame split
    of the padded input is a pure reshape (no copy, channels-last layout);
    the kernel reshape is tiny. Gradients flow through the same dense conv.
    """
    B, _, T = x.shape
    F, _, K = kernel.shape
    S = stride
    t_out = (T + 2 * padding - K) // S + 1
    nseg = -(-K // S)
    need = (t_out + nseg - 1) * S  # samples the frame view must cover
    right = max(0, need - (T + padding))
    xp = jnp.pad(x[:, 0, :], ((0, 0), (padding, right)))[:, :need]
    frames = xp.reshape(B, need // S, S)  # (B, T', S) — free reshape
    # w'[j, s, f] = w[f, j*S + s]  (zero-padded past K)
    wp = jnp.pad(kernel[:, 0, :], ((0, 0), (0, nseg * S - K)))
    w_hio = jnp.transpose(wp.reshape(F, nseg, S), (1, 2, 0))  # (nseg, S, F)
    out = lax.conv_general_dilated(
        frames,
        w_hio,
        window_strides=(1,),
        padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )  # (B, t_out, F)
    out = jnp.swapaxes(out, 1, 2)
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv1d_nhc(x, kernel, bias=None, stride: int = 1, padding: int = 0):
    """Conv1d on channels-LAST input: x (B, T, Cin), kernel (Cout, Cin, K).

    Same math as :func:`conv1d`; used by the fused-front-end eval path
    (ops/pallas_frontend.py) so the conv stack never transposes layouts.
    """
    w_hio = jnp.transpose(kernel, (2, 1, 0))  # (K, Cin, Cout)
    out = lax.conv_general_dilated(
        x,
        w_hio,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias[None, None, :]
    return out


def max_pool1d_ceil_nhc(x, k: int):
    """torch ceil-mode max pool over axis 1 of a channels-last (B, T, C)."""
    if k == 1:
        return x
    pad = _ceil_pool_padding(x.shape[1], k)
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, k, 1),
        window_strides=(1, k, 1),
        padding=((0, 0), (0, pad), (0, 0)),
    )


def _ceil_pool_padding(t: int, k: int) -> int:
    """End-padding so a stride-k window pool emits ceil(t/k) frames."""
    out_len = -(-t // k)  # ceil
    return out_len * k - t


def max_pool1d_ceil(x, k: int):
    """torch ``max_pool1d(kernel_size=k, ceil_mode=True)`` on (B, C, T)."""
    if k == 1:
        return x
    pad = _ceil_pool_padding(x.shape[-1], k)
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 1, k),
        window_strides=(1, 1, k),
        padding=((0, 0), (0, 0), (0, pad)),
    )


def avg_pool1d_ceil(x, k: int):
    """torch ``avg_pool1d(kernel_size=k, ceil_mode=True)`` on (B, C, T).

    torch divides trailing (ceil-mode) partial windows by the number of
    elements actually inside the input, so we divide a zero-padded window sum
    by a per-position valid count rather than by k.
    """
    if k == 1:
        return x
    t = x.shape[-1]
    pad = _ceil_pool_padding(t, k)
    sums = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, 1, k),
        window_strides=(1, 1, k),
        padding=((0, 0), (0, 0), (0, pad)),
    )
    if pad == 0:
        return sums / k
    out_len = sums.shape[-1]
    counts = jnp.full((out_len,), k, dtype=x.dtype).at[-1].set(k - pad)
    return sums / counts


def masked_max_pool1d_ceil(x, k: int, n):
    """Length-aware ceil max-pool on (B, C, T); ``n`` (B,) = valid frames.

    Bit-equal to running ``max_pool1d_ceil`` on each example cropped to its
    own length: frames >= n_i are excluded (-inf) from every window and
    output frames >= ceil(n_i/k) are zeroed.
    """
    if k == 1:
        return x
    t = jnp.arange(x.shape[-1])
    xm = jnp.where((t[None, :] < n[:, None])[:, None, :], x, -jnp.inf)
    out = max_pool1d_ceil(xm, k)
    n_out = -(-n // k)
    t_out = jnp.arange(out.shape[-1])
    return jnp.where((t_out[None, :] < n_out[:, None])[:, None, :], out, 0.0)


def masked_avg_pool1d_ceil(x, k: int, n):
    """Length-aware ceil avg-pool on (B, C, T); ``n`` (B,) = valid frames.

    Reproduces torch's partial-window divisor *per example*: each window's
    sum is divided by its overlap with [0, n_i), exactly as an exact-shape
    (T = n_i) ceil-mode avg_pool1d would.
    """
    if k == 1:
        return x
    t_in = x.shape[-1]
    t = jnp.arange(t_in)
    xm = jnp.where((t[None, :] < n[:, None])[:, None, :], x, 0.0)
    pad = _ceil_pool_padding(t_in, k)
    sums = lax.reduce_window(
        xm,
        0.0,
        lax.add,
        window_dimensions=(1, 1, k),
        window_strides=(1, 1, k),
        padding=((0, 0), (0, 0), (0, pad)),
    )
    m = jnp.arange(sums.shape[-1])
    counts = jnp.clip(n[:, None] - m[None, :] * k, 0, k)  # (B, T_out)
    return sums / jnp.maximum(counts, 1)[:, None, :].astype(x.dtype)


def downsample(x, method: str, factor: int, time_axis: int = 1):
    """Time-axis decimation (reference ``Downsample``, models.py:26-46).

    x: (B, T, C) with time_axis=1 (the only usage in the reference).
    method: "none" -> strided slice; "avg"/"max" -> pooled with ceil_mode.
    """
    if method not in ("none", "avg", "max"):
        raise ValueError(f"downsample method must be none/avg/max, got {method!r}")
    if factor == 1 and method in ("none", "avg", "max"):
        return x
    if method == "none":
        idx = [slice(None)] * x.ndim
        idx[time_axis] = slice(None, None, factor)
        return x[tuple(idx)]
    # Pool over time: move to (B, C, T)
    xt = jnp.swapaxes(x, time_axis, x.ndim - 1)
    pooled = max_pool1d_ceil(xt, factor) if method == "max" else avg_pool1d_ceil(xt, factor)
    return jnp.swapaxes(pooled, time_axis, x.ndim - 1)


def leaky_relu(x, negative_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope)
