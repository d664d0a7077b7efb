"""From-scratch MJPEG-in-AVI (RIFF) container codec — pure stdlib.

Motion-JPEG stored in the classic AVI RIFF layout (public format:
Microsoft "AVI RIFF File Reference" / OpenDML): a ``LIST hdrl`` with the
``avih`` main header and one ``LIST strl`` video stream (``strh`` fcc
'vids' handler 'MJPG' + ``strf`` BITMAPINFOHEADER), a ``LIST movi`` whose
``00dc`` chunks each hold ONE complete baseline JPEG (decodable by
sources/jpeg.py), and an ``idx1`` index. The container is lossless around
the JPEG payloads: encode/decode round-trips frame bytes exactly.

Role in the engine (reference parity: rasterstats has no media path —
this backs the training-data multimodal stages, stages/multimodal.py):
the VIDEO decode step used to be the last deterministic-fake stub; with
this container parser + the from-scratch JPEG codec (baseline and
progressive), frame sampling and per-frame features run on real video
bytes end to end.
"""

from __future__ import annotations

import struct

__all__ = ["is_avi", "avi_encode", "avi_decode", "AviError"]


class AviError(ValueError):
    pass


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_encode(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
) -> bytes:
    """Wrap per-frame JPEG byte strings into an MJPEG AVI container."""
    if not frames:
        raise AviError("AVI needs at least one frame")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
            max_bytes * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            n,  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            max_bytes,  # dwSuggestedBufferSize
            width,
            height,
            0, 0, 0, 0,  # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            max(fps, 1),  # dwRate (rate/scale = fps)
            0,  # dwStart
            n,  # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize (0 = variable, one sample per chunk)
            0, 0, width, height,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,  # biSize
            width,
            height,
            1,  # biPlanes
            24,  # biBitCount
            b"MJPG",  # biCompression
            width * height * 3,  # biSizeImage (nominal)
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_payload = bytearray()
    index = bytearray()
    for f in frames:
        # idx1 offsets are relative to the first byte of 'movi' (the
        # list-type fourcc), pointing at the chunk's own fourcc
        offset = 4 + len(movi_payload)
        index += b"00dc" + struct.pack("<III", 0x10, offset, len(f))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", bytes(index))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise AviError(f"chunk {fourcc!r} overruns container")
        yield fourcc, payload, size
        pos = payload + size + (size % 2)


def avi_decode(data: bytes) -> tuple[list[bytes], dict]:
    """Parse an MJPEG AVI; returns (frame_jpeg_bytes, meta).

    meta: width, height, fps, n_frames (from the avih header; n_frames
    also cross-checked against the movi chunk count). Tolerates a
    missing idx1 (the movi list is scanned directly) and both '00dc'
    and '00db' frame chunk ids.
    """
    if not is_avi(data):
        raise AviError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)

    meta = {"width": None, "height": None, "fps": None, "n_frames": None}
    frames: list[bytes] = []
    for fourcc, p, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = data[p : p + 4]
        if list_type == b"hdrl":
            for sub, sp, ssize in _iter_chunks(data, p + 4, p + size):
                if sub == b"avih" and ssize >= 40:
                    vals = struct.unpack_from("<10I", data, sp)
                    meta["fps"] = round(1_000_000 / vals[0]) if vals[0] else 0
                    meta["n_frames"] = vals[4]
                    meta["width"] = vals[8]
                    meta["height"] = vals[9]
        elif list_type == b"movi":
            for sub, sp, ssize in _iter_chunks(data, p + 4, p + size):
                if sub in (b"00dc", b"00db"):
                    frames.append(data[sp : sp + ssize])
    if meta["width"] is None:
        raise AviError("missing avih header")
    if not frames:
        raise AviError("no frame chunks in movi list")
    if meta["n_frames"] != len(frames):  # trust the actual chunk count
        meta["n_frames"] = len(frames)
    return frames, meta
