"""Native C++ WAV decoder: build, parity vs NumPy decoder, batch API."""

import os

import numpy as np
import pytest

from tpu_slu import native
from tpu_slu.data.audio import read_wav, write_wav


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def _numpy_read(path):
    os.environ["TPU_SLU_NO_NATIVE"] = "1"
    try:
        return read_wav(path)
    finally:
        del os.environ["TPU_SLU_NO_NATIVE"]


class TestNativeDecode:
    def test_single_file_parity(self, built, tmp_path, rng):
        path = str(tmp_path / "a.wav")
        x = rng.uniform(-0.9, 0.9, 31337).astype(np.float32)
        write_wav(path, x, 16000)
        ref, ref_fs = _numpy_read(path)
        got, fs = native.read_wav_native(path)
        assert fs == ref_fs == 16000
        np.testing.assert_array_equal(got, ref)

    def test_large_file_past_header_window(self, built, tmp_path, rng):
        """Files >64 KB exercise the header-read fallback (regression: the
        data chunk size must come from the header field, not the clipped
        parse buffer)."""
        path = str(tmp_path / "big.wav")
        x = rng.uniform(-0.9, 0.9, 100000).astype(np.float32)
        write_wav(path, x, 16000)
        frames, fs = native.wav_info(path)
        assert frames == 100000 and fs == 16000
        got, _ = native.read_wav_native(path)
        ref, _ = _numpy_read(path)
        np.testing.assert_array_equal(got, ref)

    def test_wav_info(self, built, tmp_path, rng):
        path = str(tmp_path / "a.wav")
        write_wav(path, rng.uniform(-0.5, 0.5, 12000).astype(np.float32), 8000)
        frames, fs = native.wav_info(path)
        assert frames == 12000 and fs == 8000

    def test_batch_decode_pads_and_parallelizes(self, built, tmp_path, rng):
        paths = []
        waves = []
        for i in range(10):
            n = int(rng.integers(4000, 12000))
            w = rng.uniform(-0.9, 0.9, n).astype(np.float32)
            p = str(tmp_path / f"b{i}.wav")
            write_wav(p, w, 16000)
            paths.append(p)
            waves.append(w)
        t_pad = 16000
        out, lengths = native.decode_batch_native(paths, t_pad, num_threads=4)
        assert out.shape == (10, t_pad)
        for i, w in enumerate(waves):
            assert lengths[i] == len(w)
            ref, _ = _numpy_read(paths[i])
            np.testing.assert_array_equal(out[i, : len(w)], ref)
            assert (out[i, len(w):] == 0).all()

    def test_batch_decode_failure_returns_none(self, built, tmp_path, rng):
        good = str(tmp_path / "g.wav")
        write_wav(good, rng.uniform(-0.5, 0.5, 4000).astype(np.float32), 16000)
        bad = str(tmp_path / "missing.wav")
        assert native.decode_batch_native([good, bad], 8000) is None

    def test_read_wav_uses_native_path(self, built, tmp_path, rng):
        path = str(tmp_path / "c.wav")
        x = rng.uniform(-0.9, 0.9, 5000).astype(np.float32)
        write_wav(path, x, 16000)
        got, fs = read_wav(path)  # native fast path
        ref, _ = _numpy_read(path)
        np.testing.assert_array_equal(got, ref)
