"""WAV decoding without libsndfile/sox.

The reference decodes audio through ``torchaudio.sox_effects`` (SLU path,
reference ``data.py:273-292``) and ``soundfile.read`` (ASR path,
``data.py:478``), both returning waveforms normalized to [-1, 1). Neither
library is part of this image, and the decode is pure host-side byte work, so
this module implements RIFF/WAVE parsing directly:

* NumPy fast path: PCM 8/16/24/32-bit and IEEE float32/float64, mono or
  multi-channel (first channel used, matching ``wav[0]`` in the reference).
* Optional native path: ``tpu_slu.native`` provides a multithreaded C++
  batch decoder (decode + pad into a pinned batch buffer) used by the loader
  when built; this file is the reference implementation and fallback.
"""

from __future__ import annotations

import os
import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def read_wav(path: str, dtype=np.float32, channel: int | None = 0):
    """Decode a WAV file -> (samples, sample_rate).

    samples: 1-D ``dtype`` array in [-1, 1) for the requested channel
    (``channel=None`` returns (frames, channels)). Uses the native C++
    decoder when built (first channel only); NumPy otherwise.
    """
    if channel == 0 and dtype == np.float32 and not os.environ.get("TPU_SLU_NO_NATIVE"):
        from tpu_slu import native

        result = native.read_wav_native(path)
        if result is not None:
            return result
    with open(path, "rb") as f:
        data = f.read()
    return decode_wav_bytes(data, dtype=dtype, channel=channel, name=path)


def decode_wav_bytes(data: bytes, dtype=np.float32, channel: int | None = 0,
                     name: str = "<bytes>"):
    """Decode in-memory RIFF/WAVE bytes -> (samples, sample_rate).

    Same semantics as :func:`read_wav`; the serving path decodes request
    bodies without touching disk.
    """
    path = name
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")

    fmt = None
    raw = None
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")

    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(data) >= 2:  # WAVE_FORMAT_EXTENSIBLE
        # SubFormat GUID's first two bytes carry the real format tag.
        audio_format = 1 if bits in (8, 16, 24, 32) else 3

    if audio_format == 1:  # integer PCM
        if bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = (x ^ 0x800000) - 0x800000  # sign-extend
            out = x.astype(np.float64) / 8388608.0
        else:
            dt = _PCM_DTYPES.get(bits)
            if dt is None:
                raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
            x = np.frombuffer(raw, dtype=dt)
            if bits == 8:
                out = (x.astype(np.float64) - 128.0) / 128.0
            else:
                out = x.astype(np.float64) / float(2 ** (bits - 1))
    elif audio_format == 3:  # IEEE float
        dt = np.dtype("<f4") if bits == 32 else np.dtype("<f8")
        out = np.frombuffer(raw, dtype=dt).astype(np.float64)
    else:
        raise ValueError(f"{path}: unsupported WAV format tag {audio_format}")

    if channels > 1:
        out = out[: (len(out) // channels) * channels].reshape(-1, channels)
        if channel is not None:
            out = out[:, channel]
    return out.astype(dtype), sample_rate


def write_wav(path: str, samples, sample_rate: int) -> None:
    """Write mono float [-1,1] samples as 16-bit PCM (test fixtures/tools)."""
    x = np.clip(np.asarray(samples, np.float64), -1.0, 1.0 - 1.0 / 32768)
    pcm = (x * 32768.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    with open(path, "wb") as f:
        f.write(hdr + pcm)
