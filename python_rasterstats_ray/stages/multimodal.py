"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

PNG, JPEG (baseline AND progressive) and MJPEG-AVI VIDEO payloads
DECODE FOR REAL via the from-scratch pure-stdlib codecs in
sources/png.py (DEFLATE + scanline filters), sources/jpeg.py (T.81
baseline sequential + progressive DCT: Huffman, spectral selection,
successive approximation, batched-matmul IDCT, 4:4:4/4:2:2/4:2:0,
restart markers) and sources/avi.py (RIFF container parser whose 00dc
chunks feed the JPEG decoder) — no PIL/libjpeg/ffmpeg. Payloads in a
format the engine has no codec for (there are none among the synthetic
media kinds; arithmetic-coded JPEG would be one) fall through to the
deterministic fake behind the same interface (clearly marked below);
everything Ray-side — schema, actor-pool signatures, batch sizing for
large binary payloads, output layout — is real and tested.

Media row schema: (media_id:int64, kind:string, payload:binary,
width:int32, height:int32, sample_rate:int32, n_frames:int32).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_media_table(n: int, kind: str = "image", seed: int = 42,
                      payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = {
        "media_id": pa.array(np.arange(n), pa.int64()),
        "kind": pa.array([kind] * n, pa.string()),
        "payload": pa.array(
            [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)],
            pa.binary(),
        ),
        "width": pa.array(np.full(n, 64, dtype=np.int32)),
        "height": pa.array(np.full(n, 48, dtype=np.int32)),
        "sample_rate": pa.array(np.full(n, 16000, dtype=np.int32)),
        "n_frames": pa.array(np.full(n, 16, dtype=np.int32)),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODER — deterministic fake standing in for libjpeg/ffmpeg.
    A real deployment replaces ONLY this function (same ndarray contract:
    HxWx3 uint8)."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    seed = int.from_bytes(h, "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode a media payload to HxWx3 uint8.

    PNG and JPEG (baseline + progressive) payloads decode for REAL via
    the from-scratch pure-stdlib codecs (sources/png.py,
    sources/jpeg.py); MJPEG-AVI video frames route through
    sources/avi.py + the JPEG decoder (see VideoFrameFeatureKernel).
    Unrecognized payloads fall back to the clearly-marked stub — a
    deployment swaps only `_fake_decode`.
    """
    from ..sources.jpeg import is_jpeg, jpeg_decode
    from ..sources.png import is_png, png_decode

    if is_png(payload):
        img = png_decode(payload)
        if img.ndim == 2:  # grayscale -> 3-channel contract
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[2] == 2:  # gray+alpha: luminance channel, alpha dropped
            img = np.repeat(img[:, :, :1], 3, axis=2)
        return img[:, :, :3]  # RGBA -> alpha dropped
    if is_jpeg(payload):
        img = jpeg_decode(payload)  # baseline JFIF, from-scratch codec
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    return _fake_decode(payload, width, height)


def synth_png_media_table(n: int, size: tuple[int, int] = (64, 48), seed: int = 42) -> pa.Table:
    """Deterministic REAL-PNG media rows: per-id gradient + hash-seeded
    noise thumbnails, encoded with the from-scratch PNG writer (filter
    type cycles 0..4 per row-id so decode exercises every filter)."""
    from ..sources.png import png_encode

    w, h = size
    yy, xx = np.mgrid[0:h, 0:w]
    payloads = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        base = (xx * 255 // max(w - 1, 1) + yy * (i % 7)) % 256
        img = np.stack(
            [base, (base + 85) % 256, rng.integers(0, 256, (h, w))], axis=2
        ).astype(np.uint8)
        payloads.append(png_encode(img, filter_type=i % 5))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["png"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, w, dtype=np.int32)),
            "height": pa.array(np.full(n, h, dtype=np.int32)),
            "sample_rate": pa.array(np.zeros(n, dtype=np.int32)),
            "n_frames": pa.array(np.ones(n, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeImageKernel:
    """Actor-pool kernel: payload binary -> decoded pixels + basic features.

    Keep ``batch_size`` small for large payloads (batch x concurrency must
    fit worker heap); the decoded pixels column is emitted as fixed-shape
    binary so downstream stages can zero-copy view it."""

    def __init__(self, target_size: tuple[int, int] | None = None):
        self.target_size = target_size

    @staticmethod
    def _resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
        sh, sw = img.shape[:2]
        ri = (np.arange(th) * sh // th).astype(np.int64)
        ci = (np.arange(tw) * sw // tw).astype(np.int64)
        return img[ri][:, ci]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        out_pixels, out_w, out_h, mean_lum = [], [], [], []
        for p, w, h in zip(payloads, widths, heights):
            img = decode_image(p, int(w), int(h))
            if self.target_size:
                img = self._resize_nearest(img, *self.target_size)
            out_pixels.append(np.ascontiguousarray(img).tobytes())
            out_h.append(img.shape[0])
            out_w.append(img.shape[1])
            mean_lum.append(float(img.mean()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.array(out_pixels, pa.binary()),
                "out_width": pa.array(out_w, pa.int32()),
                "out_height": pa.array(out_h, pa.int32()),
                "mean_luminance": pa.array(mean_lum, pa.float64()),
            }
        )


class FrameSampleKernel:
    """Video payloads -> every ``stride``-th frame (flat_map-style: one
    output row per sampled frame).

    MJPEG-AVI payloads are parsed FOR REAL (sources/avi.py): each
    emitted chunk is that frame's complete baseline JPEG, decodable by
    ``decode_image``. Other payloads keep the fixed-size byte-slice
    contract (the SQL-oracled driver query feeds seeded opaque bytes)."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.avi import avi_decode, is_avi

        out_id, out_frame, out_chunk = [], [], []
        for mid, payload, n_frames in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["n_frames"].to_pylist(),
        ):
            if is_avi(payload):
                frames, _meta = avi_decode(payload)
                for fi in range(0, len(frames), self.stride):
                    out_id.append(mid)
                    out_frame.append(fi)
                    out_chunk.append(frames[fi])
                continue
            size = max(1, len(payload) // max(1, n_frames))
            for fi in range(0, n_frames, self.stride):
                out_id.append(mid)
                out_frame.append(fi)
                out_chunk.append(payload[fi * size : (fi + 1) * size])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_frame, pa.int32()),
                "chunk": pa.array(out_chunk, pa.binary()),
            }
        )


def media_feature_pipeline(media_ds, target_size=(16, 12), concurrency=None,
                           batch_size: int = 32):
    """read -> actor-pool decode/resize -> per-item features. batch_size is
    deliberately small: payload x batch x concurrency bounds worker heap."""
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    return media_ds.map_batches(
        DecodeImageKernel,
        fn_constructor_kwargs=dict(target_size=target_size),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )


# ------------------------------------------------ perceptual-hash dedup


def synth_png_media_table_with_dups(
    n: int, n_dups: int, size: tuple[int, int] = (64, 48), seed: int = 42
) -> pa.Table:
    """``synth_png_media_table`` plus ``n_dups`` planted duplicates:
    ids n..n+n_dups-1 are pixel-identical re-encodes of ids 0..n_dups-1
    under a different PNG filter (same decoded pixels, different
    bytes) — the ground truth for phash dedup."""
    from ..sources.png import png_decode, png_encode

    base = synth_png_media_table(n, size=size, seed=seed)
    w, h = size
    payloads = []
    for i in range(n_dups):
        img = png_decode(base["payload"][i].as_py())
        payloads.append(png_encode(img, filter_type=(i + 1) % 5))
    clones = pa.table(
        {
            "media_id": pa.array(np.arange(n, n + n_dups), pa.int64()),
            "kind": pa.array(["png"] * n_dups, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n_dups, w, np.int32)),
            "height": pa.array(np.full(n_dups, h, np.int32)),
            "sample_rate": pa.array(np.zeros(n_dups, np.int32)),
            "n_frames": pa.array(np.ones(n_dups, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )
    return pa.concat_tables([base, clones])

PHASH_GRID = 32  # downsample grid feeding the DCT
PHASH_BLOCK = 8  # low-frequency block kept (64 bits)


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash (the classic pHash recipe): integer
    Rec.601 luma -> 32x32 area-mean downsample -> 2-D DCT-II -> top-left
    8x8 low-frequency block -> bit i set iff coeff_i > median of the 63
    non-DC coeffs. Deterministic: the whole hash is computed on one
    worker per image in fixed float64 order, so it is layout-independent
    by construction."""
    img = np.asarray(img)
    if img.ndim == 3:
        r, g, b = (img[:, :, c].astype(np.int64) for c in range(3))
        gray = (299 * r + 587 * g + 114 * b) // 1000
    else:
        gray = img.astype(np.int64)
    h, w = gray.shape
    g = PHASH_GRID
    # area-mean over integer bin edges (handles any h, w >= 1)
    ys = (np.arange(g + 1) * h) // g
    xs = (np.arange(g + 1) * w) // g
    ys, xs = np.maximum(ys, 0), np.maximum(xs, 0)
    c2 = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    cpad = np.zeros((h + 1, w + 1), np.int64)
    cpad[1:, 1:] = c2
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    area = np.maximum(area, 1)
    sums = (
        cpad[ys[1:], :][:, xs[1:]]
        - cpad[ys[:-1], :][:, xs[1:]]
        - cpad[ys[1:], :][:, xs[:-1]]
        + cpad[ys[:-1], :][:, xs[:-1]]
    )
    small = sums.astype(np.float64) / area
    n = g
    k = np.arange(n)
    dct_m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    freq = dct_m @ small @ dct_m.T
    block = freq[:PHASH_BLOCK, :PHASH_BLOCK].ravel()
    med = np.median(block[1:])  # DC excluded
    bits = block > med
    return int(sum(1 << i for i, b in enumerate(bits) if b))


class ImagePHashKernel:
    """Actor-pool kernel: media payload -> 64-bit perceptual hash plus
    8-bit band keys for LSH-style candidate bucketing (8 bands of 8
    bits: any pair within hamming distance <= 7 shares at least one
    band by pigeonhole, so candidate generation has NO false negatives
    for the verify threshold used downstream)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        hs = batch["height"].to_numpy(zero_copy_only=False)
        hashes = np.empty(len(batch), np.uint64)
        for i, payload in enumerate(batch["payload"]):
            img = decode_image(payload.as_py(), int(ws[i]), int(hs[i]))
            hashes[i] = phash64(img)
        out = {
            "media_id": pa.array(ids.astype(np.int64), pa.int64()),
            "phash": pa.array(hashes.astype(np.int64), pa.int64()),
        }
        for blk in range(8):
            key = (hashes >> np.uint64(8 * blk)) & np.uint64(0xFF)
            out[f"band{blk}"] = pa.array(key.astype(np.int64), pa.int64())
        return pa.table(out)


def image_phash_dups(media_ds, max_distance: int = 6, concurrency=None,
                     batch_size: int = 32):
    """Near-duplicate image pairs by perceptual hash: actor-pool decode +
    pHash -> band-bucket groupby (8x8-bit bands; exhaustive for any
    ``max_distance`` <= 7) -> in-bucket hamming verify -> distinct pairs.

    The exchange moves only (media_id, phash, band) rows — pixels never
    leave the decode stage. Output: (id_a, id_b, distance), id_a < id_b,
    each pair once.
    """
    if max_distance > 7:
        raise ValueError("banding guarantees recall only for max_distance <= 7")
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool(2)
    hashed = media_ds.map_batches(
        ImagePHashKernel,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )

    import ray.data  # noqa: F401

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        ph = batch["phash"].to_numpy(zero_copy_only=False)
        out_id, out_ph, out_key = [], [], []
        for blk in range(8):
            key = batch[f"band{blk}"].to_numpy(zero_copy_only=False)
            out_id.append(ids)
            out_ph.append(ph)
            out_key.append(key * 8 + blk)  # (band value, band index) fused
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(out_id), pa.int64()),
                "phash": pa.array(np.concatenate(out_ph), pa.int64()),
                "bucket": pa.array(np.concatenate(out_key), pa.int64()),
            }
        )

    exploded = hashed.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def verify(group: pa.Table) -> pa.Table:
        ids = group["media_id"].to_numpy(zero_copy_only=False)
        ph = group["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "distance": pa.array([], pa.int64()),
            }
        )
        if len(ids) < 2:
            return empty
        ia, ib = np.triu_indices(len(ids), k=1)
        dist = np.zeros(len(ia), np.int64)
        x = ph[ia] ^ ph[ib]
        while np.any(x):
            dist += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        mask = (dist <= max_distance) & (ids[ia] != ids[ib])
        if not mask.any():
            return empty
        a, b = ids[ia[mask]], ids[ib[mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "distance": pa.array(dist[mask], pa.int64()),
            }
        )

    pairs = exploded.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    # same pair can surface from several bands: one distinct pass on the
    # tiny pair set
    return (
        pairs.groupby(["id_a", "id_b"])
        .min("distance")
        .rename_columns({"min(distance)": "distance"})
        .sort(["id_a", "id_b"])
    )


def synth_mjpeg_media_table(
    n: int,
    size: tuple[int, int] = (48, 32),
    n_frames: int = 8,
    fps: int = 10,
    seed: int = 42,
) -> pa.Table:
    """Deterministic REAL-VIDEO media rows: each payload is an MJPEG AVI
    whose frames are moving-gradient baseline JPEGs from the from-scratch
    encoder — the full container + codec path is exercised on decode."""
    from ..sources.avi import avi_encode
    from ..sources.jpeg import jpeg_encode

    w, h = size
    yy, xx = np.mgrid[0:h, 0:w]
    payloads = []
    for i in range(n):
        frames = []
        for f in range(n_frames):
            shift = (i * 3 + f * 5) % 256
            base = (xx * 255 // max(w - 1, 1) + shift) % 256
            img = np.stack(
                [base, (base + 85) % 256, np.full((h, w), (i + f) % 256)], axis=2
            ).astype(np.uint8)
            frames.append(jpeg_encode(img, quality=90))
        payloads.append(avi_encode(frames, width=w, height=h, fps=fps))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["mjpeg_avi"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, w, dtype=np.int32)),
            "height": pa.array(np.full(n, h, dtype=np.int32)),
            "sample_rate": pa.array(np.zeros(n, dtype=np.int32)),
            "n_frames": pa.array(np.full(n, n_frames, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class VideoFrameFeatureKernel:
    """Actor-pool kernel: MJPEG-AVI payloads -> per-sampled-frame features
    via the REAL container parser + JPEG decoder. One output row per
    sampled frame: (media_id, frame, out_width, out_height,
    mean_luminance). Small ``batch_size`` — a video payload is the
    largest object the engine ships per row."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.avi import avi_decode

        out = {k: [] for k in
               ("media_id", "frame", "out_width", "out_height", "mean_luminance")}
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            frames, _meta = avi_decode(payload)
            for fi in range(0, len(frames), self.stride):
                img = decode_image(frames[fi], _meta["width"], _meta["height"])
                out["media_id"].append(mid)
                out["frame"].append(fi)
                out["out_height"].append(img.shape[0])
                out["out_width"].append(img.shape[1])
                out["mean_luminance"].append(float(img.mean()))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame": pa.array(out["frame"], pa.int32()),
                "out_width": pa.array(out["out_width"], pa.int32()),
                "out_height": pa.array(out["out_height"], pa.int32()),
                "mean_luminance": pa.array(out["mean_luminance"], pa.float64()),
            }
        )


def video_feature_pipeline(media_ds, stride: int = 4, concurrency=None,
                           batch_size: int = 16):
    """read -> actor-pool AVI parse + per-frame JPEG decode + features."""
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    return media_ds.map_batches(
        VideoFrameFeatureKernel,
        fn_constructor_kwargs=dict(stride=stride),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def synth_wav_media_table(n: int, seconds: float = 0.25, rate: int = 16000,
                          seed: int = 42) -> pa.Table:
    """Deterministic REAL-WAV media rows: per-id sine + noise PCM16,
    encoded with the from-scratch RIFF writer."""
    from ..sources.wav import wav_encode

    t = np.arange(int(seconds * rate)) / rate
    payloads = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        freq = 110.0 * (1 + i % 16)
        wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(len(t))
        payloads.append(
            wav_encode((np.clip(wave, -1, 1) * 32767).astype(np.int16), rate)
        )
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["wav"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.zeros(n, dtype=np.int32)),
            "height": pa.array(np.zeros(n, dtype=np.int32)),
            "sample_rate": pa.array(np.full(n, rate, dtype=np.int32)),
            "n_frames": pa.array(np.zeros(n, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class AudioFeatureKernel:
    """Actor-pool kernel: WAV payloads -> per-clip features, REAL decode
    via the from-scratch RIFF/PCM reader (sources/wav.py). Features are
    the standard cheap audio-curation signals: duration, RMS energy,
    peak amplitude, zero-crossing rate — all vectorized numpy per clip."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.wav import wav_decode

        out = {k: [] for k in
               ("media_id", "n_samples", "sample_rate", "duration_s",
                "rms", "peak", "zero_crossing_rate")}
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            samples, rate = wav_decode(payload)
            # int32 first: np.abs(int16 -32768) wraps; int16**2 overflows
            mono = samples.astype(np.int32).mean(axis=1)
            n = len(mono)
            out["media_id"].append(mid)
            out["n_samples"].append(n)
            out["sample_rate"].append(rate)
            out["duration_s"].append(n / rate)
            if n == 0:  # structurally valid zero-length clip
                out["rms"].append(0.0)
                out["peak"].append(0.0)
                out["zero_crossing_rate"].append(0.0)
                continue
            out["rms"].append(float(np.sqrt(np.mean(mono**2))))
            out["peak"].append(float(np.abs(samples.astype(np.int32)).max()))
            out["zero_crossing_rate"].append(
                float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                if n > 1
                else 0.0
            )
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
                "duration_s": pa.array(out["duration_s"], pa.float64()),
                "rms": pa.array(out["rms"], pa.float64()),
                "peak": pa.array(out["peak"], pa.float64()),
                "zero_crossing_rate": pa.array(out["zero_crossing_rate"], pa.float64()),
            }
        )


def audio_feature_pipeline(media_ds, concurrency=None, batch_size: int = 32):
    if concurrency is None:
        from ._cluster import pool

        concurrency = pool()
    return media_ds.map_batches(
        AudioFeatureKernel,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
