"""SincNet learnable band-pass filterbank front-end.

TPU-first rewrite of the reference ``SincLayer`` (reference ``models.py:49-110``,
itself derived from SincNet). Numerically equivalent output, different
execution shape:

* The reference synthesizes the 80 filters in a Python loop and — due to a
  loop-placement bug — runs the full conv1d once *per filter* (80× wasted
  convs, reference ``models.py:98-108``). Here filter synthesis is one fused
  vectorized expression and the conv runs once.
* Filter synthesis is elementwise VPU work over an (N_filt, Filt_dim) array;
  the stride-80 conv lowers to an XLA conv that tiles onto the MXU.

Parameters (per the reference init, ``models.py:56-68``): ``filt_b1`` (low
cutoff) and ``filt_band`` (bandwidth), both normalized by ``fs`` and
mel-initialized.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from tpu_slu.ops.conv import conv1d


def mel_init(n_filt: int, fs: int) -> tuple[np.ndarray, np.ndarray]:
    """Mel-spaced initialization of (filt_b1, filt_band), reference models.py:56-68."""
    low_freq_mel = 80.0
    high_freq_mel = 2595.0 * np.log10(1.0 + (fs / 2.0) / 700.0)
    mel_points = np.linspace(low_freq_mel, high_freq_mel, n_filt)
    f_cos = 700.0 * (10.0 ** (mel_points / 2595.0) - 1.0)
    b1 = np.roll(f_cos, 1)
    b2 = np.roll(f_cos, -1)
    b1[0] = 30.0
    b2[-1] = (fs / 2.0) - 100.0
    freq_scale = float(fs)
    return (b1 / freq_scale).astype(np.float32), ((b2 - b1) / freq_scale).astype(np.float32)


def sinc_filters(filt_b1, filt_band, filt_dim: int, fs: int):
    """Synthesize the (N_filt, Filt_dim) hamming-windowed band-pass bank.

    Matches the reference float32 math exactly (models.py:77-106):
    cutoffs clamped via abs + 50 Hz minimums, band-pass = difference of two
    scaled sinc low-passes, peak-normalized per filter, hamming windowed with
    ``n = linspace(0, N, N)`` (note: *inclusive* endpoint, step N/(N-1) — a
    reference quirk we reproduce for checkpoint parity).
    """
    N = filt_dim
    fsf = jnp.float32(fs)
    min_freq = jnp.float32(50.0)
    min_band = jnp.float32(50.0)

    filt_b1 = filt_b1.astype(jnp.float32)
    filt_band = filt_band.astype(jnp.float32)

    beg = jnp.abs(filt_b1) + min_freq / fsf            # (F,) normalized low cutoff
    end = beg + (jnp.abs(filt_band) + min_band / fsf)  # (F,) normalized high cutoff

    # t_right = linspace(1, (N-1)/2, (N-1)/2)/fs  (seconds), models.py:82
    half = (N - 1) // 2
    t_right = (jnp.linspace(1.0, (N - 1) / 2.0, half) / fsf).astype(jnp.float32)  # (half,)

    def low_pass(cut):  # cut: (F,) normalized cutoff -> (F, N) scaled sinc
        # sinc(band, t) = sin(2*pi*band*t) / (2*pi*band*t), band in Hz
        band_hz = cut[:, None] * fsf                       # (F, 1)
        arg = 2.0 * math.pi * band_hz * t_right[None, :]   # (F, half)
        y_right = jnp.sin(arg) / arg
        y_left = y_right[:, ::-1]
        ones = jnp.ones((cut.shape[0], 1), jnp.float32)
        y = jnp.concatenate([y_left, ones, y_right], axis=1)  # (F, N)
        return 2.0 * cut[:, None] * y

    band_pass = low_pass(end) - low_pass(beg)                       # (F, N)
    band_pass = band_pass / jnp.max(band_pass, axis=1, keepdims=True)

    # Hamming window with the reference's linspace(0, N, N) grid (models.py:91-94)
    n = jnp.linspace(0.0, float(N), N).astype(jnp.float32)
    window = 0.54 - 0.46 * jnp.cos(2.0 * math.pi * n / N)
    return band_pass * window


def sinc_conv(filt_b1, filt_band, x, filt_dim: int, fs: int, stride: int, padding: int):
    """Apply the sinc filterbank to waveforms.

    x: (B, 1, T) -> (B, N_filt, T_out). One conv1d (vs. the reference's
    N_filt convs, models.py:108).
    """
    filters = sinc_filters(filt_b1, filt_band, filt_dim, fs)  # (F, N)
    kernel = filters[:, None, :]  # (O=F, I=1, K=N)
    return conv1d(x, kernel, None, stride=stride, padding=padding)
