"""Pure-stdlib WAV (RIFF/PCM) codec + deterministic audio features.

Second real media decode path (after functions/png.py): the container has no
ffmpeg/soundfile, but RIFF/WAVE PCM needs nothing beyond ``struct`` +
numpy. Reference behavior analogue: src/services/image.service.js's
decode-normalize-measure step, applied to audio payloads.

Only integer PCM (format tag 1) mono/stereo at 8/16-bit is accepted —
anything else raises ``WavError`` and the caller's undecodable-payload path
handles it (same contract as PngError).
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Returns (samples as float64 in [-1, 1], shape (n, channels); rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise WavError("missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _block, bits = fmt
    if tag != 1 or channels not in (1, 2) or bits not in (8, 16) or rate <= 0:
        raise WavError(f"unsupported PCM layout tag={tag} ch={channels} bits={bits}")
    if bits == 16:
        n = len(raw) // (2 * channels)
        if n == 0:
            raise WavError("empty data chunk")
        s = np.frombuffer(raw[: n * 2 * channels], dtype="<i2").astype(np.float64)
        s /= 32768.0
    else:  # 8-bit PCM is unsigned
        n = len(raw) // channels
        if n == 0:
            raise WavError("empty data chunk")
        s = (np.frombuffer(raw[: n * channels], dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    return s.reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 encoder for fixtures/tests (the synth side of decode_wav)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(samples: np.ndarray, rate: int, dim: int = 64) -> np.ndarray:
    """Deterministic fixed-size features from real samples, mirroring
    image_features' contract (float64, length ``dim``, roughly [0, 1]):
    [log-duration, global RMS, zero-crossing rate, peak] + (dim-4)-point
    RMS envelope (vectorized block pooling over the mono mix)."""
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    dur = n / rate
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    peak = float(np.abs(mono).max())
    bins = dim - 4
    idx = np.arange(n) * bins // max(n, 1)
    sums = np.bincount(idx, weights=mono**2, minlength=bins)
    counts = np.bincount(idx, minlength=bins).astype(np.float64)
    counts[counts == 0] = 1.0
    envelope = np.sqrt(sums / counts)
    head = np.array([np.log1p(dur) / 10.0, rms, zcr, peak], dtype=np.float64)
    return np.concatenate([head, envelope])
