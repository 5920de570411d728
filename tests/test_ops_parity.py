"""Numerical parity of core ops vs PyTorch (the reference's runtime, L0).

Checkpoint import (reference ``model_state.pth``) only reproduces predictions
if conv / pool / GRU / sinc numerics match PyTorch bit-for-bit-ish; these
tests pin that contract (SURVEY.md §7 hard parts a, e).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tpu_slu import ops


def t2n(t):
    return t.detach().cpu().numpy()


class TestConv1d:
    @pytest.mark.parametrize("stride,pad,k", [(1, 2, 5), (80, 200, 401), (3, 0, 7)])
    def test_matches_torch(self, rng, stride, pad, k):
        B, Cin, Cout, T = 2, 3, 4, 1000
        x = rng.standard_normal((B, Cin, T), dtype=np.float32)
        w = rng.standard_normal((Cout, Cin, k), dtype=np.float32) * 0.1
        b = rng.standard_normal((Cout,), dtype=np.float32)

        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=pad,
        )
        got = ops.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride, pad)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("stride,pad,k,t", [(80, 200, 401, 8000), (10, 15, 31, 777),
                                                (4, 0, 13, 505)])
    def test_framed_fast_path_matches_torch(self, rng, stride, pad, k, t):
        """Single-input-channel strided convs take the frame-decomposition
        path (ops/conv.py _conv1d_framed) — forward AND both gradients must
        match torch exactly (this is the sinc front-end's configuration)."""
        B, Cout = 2, 5
        x = rng.standard_normal((B, 1, t), dtype=np.float32)
        w = rng.standard_normal((Cout, 1, k), dtype=np.float32) * 0.1
        b = rng.standard_normal((Cout,), dtype=np.float32)
        co = None

        xt = torch.from_numpy(x).requires_grad_(True)
        wt = torch.from_numpy(w).requires_grad_(True)
        ref = torch.nn.functional.conv1d(xt, wt, torch.from_numpy(b),
                                         stride=stride, padding=pad)
        got = ops.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride, pad)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-4, atol=1e-5)

        co = rng.standard_normal(tuple(ref.shape), dtype=np.float32)
        ref.backward(torch.from_numpy(co))
        gx, gw = jax.grad(
            lambda x, w: jnp.sum(ops.conv1d(x, w, None, stride, pad) * jnp.asarray(co)),
            argnums=(0, 1),
        )(jnp.asarray(x), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(gx), t2n(xt.grad), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), t2n(wt.grad), rtol=1e-4, atol=1e-3)


class TestPooling:
    @pytest.mark.parametrize("t,k", [(100, 2), (101, 2), (7, 3), (8, 3), (57585 // 80, 2)])
    def test_max_pool_ceil(self, rng, t, k):
        x = rng.standard_normal((2, 5, t), dtype=np.float32)
        ref = torch.nn.functional.max_pool1d(torch.from_numpy(x), k, ceil_mode=True)
        got = ops.max_pool1d_ceil(jnp.asarray(x), k)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("t,k", [(100, 2), (101, 2), (7, 3), (8, 3), (359, 2)])
    def test_avg_pool_ceil(self, rng, t, k):
        x = rng.standard_normal((2, 5, t), dtype=np.float32)
        ref = torch.nn.functional.avg_pool1d(torch.from_numpy(x), k, ceil_mode=True)
        got = ops.avg_pool1d_ceil(jnp.asarray(x), k)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("method", ["none", "avg", "max"])
    def test_downsample_time_axis(self, rng, method):
        # (B, T, C) layout, axis=1 — the reference Downsample usage
        x = rng.standard_normal((2, 9, 4), dtype=np.float32)
        got = ops.downsample(jnp.asarray(x), method, 2, time_axis=1)
        xt = torch.from_numpy(x)
        if method == "none":
            ref = xt[:, ::2]
        elif method == "avg":
            ref = torch.nn.functional.avg_pool1d(xt.transpose(1, 2), 2, ceil_mode=True).transpose(1, 2)
        else:
            ref = torch.nn.functional.max_pool1d(xt.transpose(1, 2), 2, ceil_mode=True).transpose(1, 2)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5, atol=1e-6)


def torch_gru_params_to_jax(gru: torch.nn.GRU):
    p = {
        "fwd": {
            "w_ih": jnp.asarray(t2n(gru.weight_ih_l0).T),
            "w_hh": jnp.asarray(t2n(gru.weight_hh_l0).T),
            "b_ih": jnp.asarray(t2n(gru.bias_ih_l0)),
            "b_hh": jnp.asarray(t2n(gru.bias_hh_l0)),
        }
    }
    if gru.bidirectional:
        p["bwd"] = {
            "w_ih": jnp.asarray(t2n(gru.weight_ih_l0_reverse).T),
            "w_hh": jnp.asarray(t2n(gru.weight_hh_l0_reverse).T),
            "b_ih": jnp.asarray(t2n(gru.bias_ih_l0_reverse)),
            "b_hh": jnp.asarray(t2n(gru.bias_hh_l0_reverse)),
        }
    return p


class TestGRU:
    @pytest.mark.parametrize("bidirectional", [False, True])
    def test_matches_torch_gru(self, rng, bidirectional):
        B, T, D, H = 3, 17, 10, 8
        x = rng.standard_normal((B, T, D), dtype=np.float32)
        gru = torch.nn.GRU(D, H, batch_first=True, bidirectional=bidirectional)
        ref, _ = gru(torch.from_numpy(x))
        got = ops.gru_apply(torch_gru_params_to_jax(gru), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-4, atol=1e-5)

    def test_matches_torch_grucell(self, rng):
        B, D, H = 4, 6, 5
        x = rng.standard_normal((B, D), dtype=np.float32)
        h = rng.standard_normal((B, H), dtype=np.float32)
        cell = torch.nn.GRUCell(D, H)
        ref = cell(torch.from_numpy(x), torch.from_numpy(h))
        params = {
            "w_ih": jnp.asarray(t2n(cell.weight_ih).T),
            "w_hh": jnp.asarray(t2n(cell.weight_hh).T),
            "b_ih": jnp.asarray(t2n(cell.bias_ih)),
            "b_hh": jnp.asarray(t2n(cell.bias_hh)),
        }
        got = ops.gru_cell_step(params, jnp.asarray(x), jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-5, atol=1e-6)

    def test_long_sequence_stability(self, rng):
        # 720 steps ≈ the 25 Hz phoneme-layer rate on a 28.8 s clip
        B, T, D, H = 2, 720, 12, 16
        x = rng.standard_normal((B, T, D), dtype=np.float32)
        gru = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
        ref, _ = gru(torch.from_numpy(x))
        got = ops.gru_apply(torch_gru_params_to_jax(gru), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=1e-3, atol=1e-4)


class TestSinc:
    def _numpy_reference_filters(self, b1, band, N, fs):
        """Independent NumPy transcription of the SincNet filter math
        (reference models.py:77-106) used as the parity oracle."""
        F = b1.shape[0]
        beg = np.abs(b1) + 50.0 / fs
        end = beg + np.abs(band) + 50.0 / fs
        half = (N - 1) // 2
        t_right = np.linspace(1, (N - 1) / 2, half).astype(np.float32) / fs

        def lp(cut):
            out = np.zeros((F, N), np.float32)
            for i in range(F):
                arg = 2 * np.pi * cut[i] * fs * t_right
                y_right = np.sin(arg) / arg
                y = np.concatenate([y_right[::-1], [1.0], y_right])
                out[i] = 2 * cut[i] * y
            return out

        bp = lp(end) - lp(beg)
        bp = bp / bp.max(axis=1, keepdims=True)
        n = np.linspace(0, N, N).astype(np.float32)
        window = (0.54 - 0.46 * np.cos(2 * np.pi * n / N)).astype(np.float32)
        return bp * window

    def test_filters_match_reference_math(self):
        from tpu_slu.ops.sinc import mel_init, sinc_filters

        N_filt, N, fs = 80, 401, 16000
        b1, band = mel_init(N_filt, fs)
        ref = self._numpy_reference_filters(b1.astype(np.float64), band.astype(np.float64), N, fs)
        got = sinc_filters(jnp.asarray(b1), jnp.asarray(band), N, fs)
        np.testing.assert_allclose(np.asarray(got), ref.astype(np.float32), rtol=2e-4, atol=2e-5)

    def test_mel_init_values(self):
        from tpu_slu.ops.sinc import mel_init

        b1, band = mel_init(80, 16000)
        assert b1.shape == (80,) and band.shape == (80,)
        # First low cutoff pinned to 30 Hz, last high cutoff to fs/2 - 100
        np.testing.assert_allclose(b1[0] * 16000, 30.0, rtol=1e-6)
        np.testing.assert_allclose((b1[-1] + band[-1]) * 16000, 7900.0, rtol=1e-6)

    def test_sinc_conv_shape(self, rng):
        from tpu_slu.ops.sinc import mel_init, sinc_conv

        b1, band = mel_init(80, 16000)
        x = rng.standard_normal((2, 1, 16000), dtype=np.float32)
        out = sinc_conv(jnp.asarray(b1), jnp.asarray(band), jnp.asarray(x), 401, 16000, 80, 200)
        # torch conv1d output length: floor((T + 2*pad - K)/stride) + 1
        assert out.shape == (2, 80, (16000 + 400 - 401) // 80 + 1)
