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


class TestNativeRobustness:
    """Adversarial inputs must fail cleanly (return None / -1), never crash
    or write past the caller's buffer. A parser crash would abort the pytest
    process — that is the failure signal for memory-safety regressions."""

    def _raw_decode(self, built, data: bytes, tmp_path, max_out=4096):
        """Call wav_decode directly with a fixed-size buffer; return frames."""
        import ctypes

        from tpu_slu.native import get_lib

        lib = get_lib()
        path = str(tmp_path / "fuzz.wav")
        with open(path, "wb") as f:
            f.write(data)
        # canary-padded buffer: decode must never write past max_out
        buf = np.full(max_out + 64, 7777.0, np.float32)
        rate = ctypes.c_int(0)
        frames = lib.wav_decode(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_out, ctypes.byref(rate),
        )
        assert frames <= max_out
        assert (buf[max_out:] == 7777.0).all(), "decode wrote past max_out"
        # wav_info on the same bytes must not crash either
        from tpu_slu import native

        native.wav_info(path)
        return frames

    def _valid_bytes(self, rng, n=2000, fs=16000):
        import io

        path_buf = io.BytesIO()
        x = rng.uniform(-0.9, 0.9, n).astype(np.float32)
        # write via the repo's own writer to a temp file-less buffer is not
        # supported; build a canonical 16-bit PCM WAV by hand instead
        import struct

        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, fs, fs * 2, 2, 16)
        data = b"data" + struct.pack("<I", len(pcm)) + pcm
        path_buf.write(hdr + fmt + data)
        return path_buf.getvalue()

    def test_truncations(self, built, tmp_path, rng):
        blob = self._valid_bytes(rng)
        for cut in [0, 1, 4, 11, 12, 13, 20, 36, 43, 44, 45, 100, len(blob) - 1]:
            self._raw_decode(built, blob[:cut], tmp_path)

    def test_header_mutations(self, built, tmp_path, rng):
        """500 seeded random 1-4 byte mutations in the first 128 bytes."""
        blob = self._valid_bytes(rng)
        fuzz = np.random.default_rng(0)
        for _ in range(500):
            b = bytearray(blob)
            for _ in range(int(fuzz.integers(1, 5))):
                b[int(fuzz.integers(0, 128))] = int(fuzz.integers(0, 256))
            self._raw_decode(built, bytes(b), tmp_path)

    def test_lying_size_fields(self, built, tmp_path, rng):
        import struct

        blob = bytearray(self._valid_bytes(rng))
        # RIFF size = 0xFFFFFFFF
        blob[4:8] = struct.pack("<I", 0xFFFFFFFF)
        self._raw_decode(built, bytes(blob), tmp_path)
        # data chunk claims 4 GB: decode clips to the actual payload
        blob = bytearray(self._valid_bytes(rng))
        blob[40:44] = struct.pack("<I", 0xFFFFFFF0)
        frames = self._raw_decode(built, bytes(blob), tmp_path)
        assert frames <= 4096
        # fmt chunk claims huge size (walks pos past the data chunk)
        blob = bytearray(self._valid_bytes(rng))
        blob[16:20] = struct.pack("<I", 0x7FFFFFFF)
        self._raw_decode(built, bytes(blob), tmp_path)

    def test_degenerate_formats(self, built, tmp_path, rng):
        import struct

        # zero channels
        blob = bytearray(self._valid_bytes(rng))
        blob[22:24] = struct.pack("<H", 0)
        assert self._raw_decode(built, bytes(blob), tmp_path) == -1
        # unsupported 12-bit PCM
        blob = bytearray(self._valid_bytes(rng))
        blob[34:36] = struct.pack("<H", 12)
        assert self._raw_decode(built, bytes(blob), tmp_path) == -1
        # empty file and pure garbage
        assert self._raw_decode(built, b"", tmp_path) == -1
        assert self._raw_decode(built, b"\x01\x02" * 300, tmp_path) == -1
        # 255 channels with a tiny payload: frames floor to a sane count
        blob = bytearray(self._valid_bytes(rng, n=10))
        blob[22:24] = struct.pack("<H", 255)
        frames = self._raw_decode(built, bytes(blob), tmp_path)
        assert -1 <= frames <= 1

    def test_odd_chunk_padding(self, built, tmp_path, rng):
        """A junk chunk with an odd size before fmt/data: the word-aligned
        walk must still find the real chunks."""
        import struct

        blob = self._valid_bytes(rng)
        junk = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"  # padded to 4
        out = blob[:12] + junk + blob[12:]
        out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
        frames = self._raw_decode(built, out, tmp_path)
        assert frames > 0
