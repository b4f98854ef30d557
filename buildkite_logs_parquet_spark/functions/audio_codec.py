"""Pure-stdlib WAV (RIFF PCM) codec — the audio twin of
``image_codec`` (PNG/PPM): a REAL decode path behind the multimodal
seam built only from public, always-available pieces (``wave`` +
numpy), so the Spark-side plumbing can be exercised on genuine media
bytes without external codec libraries.

Formats beyond PCM WAV (MP3, FLAC, Ogg…) remain the honest
``strict_decode`` seam in ``operators/multimodal``.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV payload to ``(sample_rate, samples)`` with
    ``samples`` shaped ``(n_frames, n_channels)`` as int16.

    Supports the two PCM widths the ``wave`` module emits losslessly:
    16-bit signed and 8-bit unsigned (rescaled to int16).  Anything else
    raises ``ValueError`` — the caller's codec seam decides whether to
    quarantine or fail.
    """
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    elif sw == 1:
        arr = (
            (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
        ).astype(np.int16)
    else:
        raise ValueError(f"unsupported PCM sample width: {sw} bytes")
    if ch <= 0:
        raise ValueError("invalid channel count")
    return sr, arr.reshape(-1, ch)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples (``(n_frames,)`` or ``(n_frames,
    n_channels)``) as 16-bit PCM WAV bytes — the fixture-side inverse of
    ``decode_wav``."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(arr.astype("<i2").tobytes())
    return buf.getvalue()
