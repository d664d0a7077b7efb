"""Minimal from-scratch WAV (RIFF/PCM) codec — pure struct + numpy.

Like sources/png.py, this makes the multimodal AUDIO path real: WAV is
fully specified public knowledge (RIFF container + PCM samples) and
needs no external codec. Scope: PCM 16-bit, mono/stereo, read + write;
compressed formats (MP3/AAC/…) remain behind the documented stub.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> WAV bytes."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        raise ValueError("wav_encode expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16 samples, sample_rate)."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    ch = rate = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + ln > len(data):
            raise ValueError(
                f"truncated {tag!r} chunk: declares {ln} bytes, "
                f"{len(data) - pos - 8} remain"
            )
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError(f"fmt chunk too short ({ln} bytes)")
            audio_fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 supported (fmt={audio_fmt}, bits={bits})"
                )
        elif tag == b"data":
            pcm = payload
    if ch is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if len(pcm) % (2 * ch):
        raise ValueError("data chunk not a whole number of PCM16 frames")
    samples = np.frombuffer(pcm, "<i2")
    return samples.reshape(-1, ch), rate
