"""Multimodal column plumbing: opaque binary media + typed metadata.

Images / audio / video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages.

``DecodeStage(real=True)`` REALLY decodes the uncompressed container formats
implemented below in pure numpy — BMP (24-bit), PPM (P6) and WAV (PCM16) —
and derives image/audio features from the actual pixels/samples. Compressed
formats (JPEG/PNG/MP3/H.264) would need Pillow/ffmpeg, which are not in this
container: payloads the sniffer can't identify raise ``ValueError`` per the
divide&conquer convention (poison rows isolate; nothing is silently faked).
The default ``real=False`` mode keeps the deterministic hash-seeded fake for
plumbing tests.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field(
            "meta",
            pa.struct(
                [
                    pa.field("width", pa.int32()),
                    pa.field("height", pa.int32()),
                    pa.field("duration_ms", pa.int32()),
                    pa.field("format", pa.string()),
                ]
            ),
        ),
    ]
)

# Wide binary rows need small batches so batch × concurrency fits the worker
# heap (see SURVEY §7.5 item 4 / ray_guide 'Memory-aware').
RECOMMENDED_MEDIA_BATCH_SIZE = 64


def synth_media_table(n: int, kind: str = "image", seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(
                [
                    {"width": 64 + int(i % 64), "height": 64, "duration_ms": 0, "format": "fake"}
                    for i in range(n)
                ],
                MEDIA_SCHEMA.field("meta").type,
            ),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# pure-numpy codecs for the uncompressed container formats
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, 4-byte row padding)."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img = np.zeros((h, row_bytes), dtype=np.uint8)
    img[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = img.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    img = np.frombuffer(data, dtype=np.uint8, count=h * row_bytes, offset=off)
    img = img.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flip:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments not supported — our encoder never writes them)
    parts, pos = [], 2
    while len(parts) < 3:
        while data[pos] in b" \t\r\n":
            pos += 1
        tok = bytearray()
        while data[pos] not in b" \t\r\n":
            tok.append(data[pos])
            pos += 1
        parts.append(int(tok))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (int16 samples, sample_rate); walks RIFF chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16 or channels != 1:
                # multi-channel would silently decode as interleaved mono —
                # raise like every other unsupported shape (nothing faked)
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, bits={bits}, channels={channels})"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").copy()
        pos += 8 + clen + (clen & 1)
    if rate is None or samples is None:
        raise ValueError("truncated WAV payload")
    return samples, rate


def sniff_format(payload: bytes) -> str:
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    raise ValueError("unknown media container (only BMP/PPM/WAV decodable here)")


def _image_features(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic content features from real pixels: channel means/stds +
    a luminance histogram filling the remaining bins."""
    chans = pixels.reshape(-1, 3).astype(np.float64)
    head = np.concatenate([chans.mean(axis=0) / 255.0, chans.std(axis=0) / 255.0])
    lum = chans @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=max(dim - 6, 1), range=(0.0, 255.0))
    hist = hist / max(len(lum), 1)
    return np.concatenate([head, hist])[:dim].astype(np.float32)


def _audio_features(samples: np.ndarray, dim: int) -> np.ndarray:
    """RMS + zero-crossing rate + amplitude histogram from real samples."""
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
    hist, _ = np.histogram(x, bins=max(dim - 2, 1), range=(-1.0, 1.0))
    hist = hist / max(len(x), 1)
    return np.concatenate([[rms, zcr], hist])[:dim].astype(np.float32)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-features: seeded from sha256(payload)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal(dim).astype(np.float32)


def synth_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL media rows: alternating 24-bit BMP / P6 PPM image
    payloads and PCM16 WAV audio payloads, byte-exact across runs — the
    fixture for ``DecodeStage(real=True)``."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        ids.append(i)
        if i % 3 == 2:  # audio
            samples = (rng.standard_normal(1600) * 8000).astype(np.int16)
            payloads.append(encode_wav(samples, 16_000))
            kinds.append("audio")
            metas.append({"width": 0, "height": 0, "duration_ms": 100, "format": "wav"})
        else:  # image
            w, h = 16 + int(i % 8), 12
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(px) if i % 3 == 0 else encode_ppm(px))
            kinds.append("image")
            metas.append({"width": w, "height": h, "duration_ms": 0,
                          "format": "bmp" if i % 3 == 0 else "ppm"})
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_tone_audio_table(n: int = 90, n_samples: int = 1_600, seed: int = 42) -> pa.Table:
    """Deterministic tone-detection fixture: PCM16 WAV clips of gaussian
    noise (σ=2000), with odd-id clips carrying an added fs/6 tone. At fs/6
    the sampled cosine 2A·cos(πk/3 + φ) is the INTEGER period-6 pattern
    A·[2,1,-1,-2,-1,1] (rolled by the phase index), so the mixed signal is
    exact int16 and a Goertzel detector at that bin sees ~10⁴× the noise
    power. Amplitude varies per clip (2500 + 250·(i mod 16)) so thresholding
    isn't a single knife-edge."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, payloads, metas = [], [], []
    base = np.array([2, 1, -1, -2, -1, 1], dtype=np.int64)
    for i in range(n):
        x = np.rint(rng.normal(0.0, 2000.0, n_samples)).astype(np.int64)
        if i % 2 == 1:
            amp = 2500 + 250 * (i % 16)
            pat = np.roll(base, i % 6) * amp
            x = x + np.tile(pat, n_samples // 6 + 1)[:n_samples]
        samples = np.clip(x, -32767, 32767).astype(np.int16)
        ids.append(i)
        payloads.append(encode_wav(samples, 16_000))
        metas.append({"width": 0, "height": 0, "duration_ms": n_samples * 1000 // 16_000,
                      "format": "wav"})
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStage:
    """Actor-pool decode: binary payload → feature vector + dimensions.

    Use as ``ds.map_batches(DecodeStage, fn_constructor_kwargs=...,
    batch_size=RECOMMENDED_MEDIA_BATCH_SIZE, concurrency=N, num_cpus=1)``.

    ``real=True`` sniffs each payload's container magic and REALLY decodes it
    with the pure-numpy codecs above (BMP/PPM images → pixel features, WAV →
    sample features); unknown containers raise, so poison media rows isolate
    via divide&conquer like any other bad event. ``real=False`` keeps the
    hash-seeded deterministic fake (plumbing tests without media bytes).
    Output schema is identical in both modes except the real mode appends
    ``decoded_width``/``decoded_height``/``decoded_samples``.

    ``audio_decimate=k`` keeps every k-th decoded sample before feature
    extraction (sample-rate normalization's integer-exact core; a
    production resampler adds a polyphase anti-alias filter in front —
    float-heavy, so the testable contract here is pure decimation).
    Images are unaffected."""

    def __init__(self, feature_dim: int = 64, real: bool = False, audio_decimate: int = 1):
        self.feature_dim = feature_dim
        self.real = real
        self.audio_decimate = audio_decimate

    def _decode_one(self, payload: bytes) -> tuple[np.ndarray, int, int, int]:
        fmt = sniff_format(payload)
        if fmt == "bmp":
            px = decode_bmp(payload)
            return _image_features(px, self.feature_dim), px.shape[1], px.shape[0], 0
        if fmt == "ppm":
            px = decode_ppm(payload)
            return _image_features(px, self.feature_dim), px.shape[1], px.shape[0], 0
        samples, _rate = decode_wav(payload)
        if self.audio_decimate > 1:
            samples = samples[:: self.audio_decimate]
        return _audio_features(samples, self.feature_dim), 0, 0, len(samples)

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_frame_idx = "frame_idx" in batch.column_names
        if len(batch) == 0:  # np.stack needs at least one row
            schema = [("media_id", pa.int64()), ("kind", pa.string()),
                      ("feature", pa.list_(pa.float32(), self.feature_dim)),
                      ("feature_norm", pa.float64()),
                      ("payload_sha", pa.string()), ("payload_bytes", pa.int64())]
            if has_frame_idx:
                # AFTER "kind" — must match the non-empty cols order, or
                # mixed empty/non-empty blocks fail Arrow concatenation
                schema.insert(2, ("frame_idx", pa.int32()))
            if self.real:
                schema += [("decoded_width", pa.int32()), ("decoded_height", pa.int32()),
                           ("decoded_samples", pa.int64())]
            return pa.schema(schema).empty_table()
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        raw = [p.as_py() for p in payloads]
        dims: list[tuple[int, int, int]] = []
        if self.real:
            decoded = [self._decode_one(p) for p in raw]
            feats = np.stack([d[0] for d in decoded])
            dims = [(d[1], d[2], d[3]) for d in decoded]
        else:
            feats = np.stack([_fake_features(p, self.feature_dim) for p in raw])
        cols = {
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            # frame rows (FrameSampleStage output) keep their ordinal so
            # sample→decode→featurize composes without a synthetic row id
            **({"frame_idx": batch["frame_idx"]} if has_frame_idx else {}),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.feature_dim
            ),
            "feature_norm": pa.array(np.linalg.norm(feats.astype(np.float64), axis=1)),
            "payload_sha": pa.array([hashlib.sha256(p).hexdigest() for p in raw], pa.string()),
            "payload_bytes": pa.array([len(p) for p in raw], pa.int64()),
        }
        if self.real:
            cols["decoded_width"] = pa.array([d[0] for d in dims], pa.int32())
            cols["decoded_height"] = pa.array([d[1] for d in dims], pa.int32())
            cols["decoded_samples"] = pa.array([d[2] for d in dims], pa.int64())
        return pa.table(cols)


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor image resize, pure numpy (two index-take ops —
    vectorized, no per-pixel Python). pixels: (H, W[, C]) uint8."""
    h, w = pixels.shape[0], pixels.shape[1]
    row_idx = np.minimum((np.arange(height) * h) // height, h - 1)
    col_idx = np.minimum((np.arange(width) * w) // width, w - 1)
    return pixels[row_idx][:, col_idx]


class ResizeStage:
    """Image resize: decode → nearest-neighbor resample → re-encode.

    ``real=True`` REALLY resizes BMP/PPM payloads with the pure-numpy
    codecs (non-image payloads pass through untouched); ``real=False``
    keeps the metadata-only fake for plumbing tests without media bytes.
    Both modes rewrite the ``meta`` struct to the target dimensions."""

    def __init__(self, width: int, height: int, real: bool = False):
        self.width = width
        self.height = height
        self.real = real

    def _resize_one(self, payload: bytes) -> bytes:
        fmt = sniff_format(payload)
        if fmt == "bmp":
            return encode_bmp(resize_nearest(decode_bmp(payload), self.width, self.height))
        if fmt == "ppm":
            return encode_ppm(resize_nearest(decode_ppm(payload), self.width, self.height))
        return payload  # audio/unknown: resize is an image op

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        meta_type = MEDIA_SCHEMA.field("meta").type
        if self.real:
            payloads = batch["payload"]
            if isinstance(payloads, pa.ChunkedArray):
                payloads = payloads.combine_chunks()
            raw = [p.as_py() for p in payloads]
            resized = [self._resize_one(p) for p in raw]
            batch = batch.set_column(
                batch.column_names.index("payload"), "payload", pa.array(resized, pa.binary())
            )
            # meta rewritten ONLY for rows actually resized — an audio row's
            # meta must keep describing the (untouched) audio payload
            old_meta = batch["meta"].to_pylist()
            new_meta = [
                {"width": self.width, "height": self.height, "duration_ms": 0, "format": "resized"}
                if sniff_format(p) in ("bmp", "ppm") else m
                for p, m in zip(raw, old_meta)
            ]
            meta = pa.array(new_meta, meta_type)
        else:
            meta = pa.array(
                [{"width": self.width, "height": self.height, "duration_ms": 0,
                  "format": "fake-resized"}] * n,
                meta_type,
            )
        i = batch.column_names.index("meta")
        return batch.set_column(i, "meta", meta)


# ---------------------------------------------------------------------------
# multi-frame container: concatenated P6 PPM frames (the ffmpeg image2pipe
# stream format — each frame is self-delimiting via its own header)
# ---------------------------------------------------------------------------


def encode_ppm_stream(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → concatenated binary PPM stream."""
    return b"".join(encode_ppm(f) for f in frames)


def _ppm_frame_offsets(data: bytes) -> list[tuple[int, int]]:
    """Walk the stream's frame headers WITHOUT decoding pixels: returns
    (offset, length) per frame — O(frames) header parses, so sampling frame
    k is an O(1) slice afterwards."""
    spans = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"P6":
            raise ValueError(f"bad PPM stream: no P6 magic at offset {pos}")
        # header: magic, width, height, maxval as whitespace-separated tokens
        p, parts = pos + 2, []
        while len(parts) < 3:
            while data[p] in b" \t\r\n":
                p += 1
            tok = bytearray()
            while data[p] not in b" \t\r\n":
                tok.append(data[p])
                p += 1
            parts.append(int(tok))
        p += 1  # single whitespace after maxval
        w, h, maxval = parts
        if maxval != 255:
            raise ValueError("only 8-bit PPM frames supported")
        end = p + w * h * 3
        if end > n:
            raise ValueError("truncated PPM stream")
        spans.append((pos, end - pos))
        pos = end
    return spans


def decode_ppm_stream(data: bytes) -> list[np.ndarray]:
    """Concatenated P6 stream → list of (h, w, 3) uint8 RGB frames."""
    return [decode_ppm(data[o : o + ln]) for o, ln in _ppm_frame_offsets(data)]


def synth_scene_video_table(
    n: int, n_scenes: int = 3, frames_per_scene: int = 4, seed: int = 42
) -> pa.Table:
    """Scene-STRUCTURED video rows (the cut-detection fixture): each payload
    is a concatenated-PPM stream of ``n_scenes`` scenes × ``frames_per_scene``
    frames. Within a scene frame j is the scene's base image brightened by j
    (near-identical; SAD ≤ w·h·3), scene boundaries switch to fresh random
    content (SAD ≈ 85·w·h·3) — so sum-of-absolute-differences spikes exactly
    at scene starts."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, payloads, metas = [], [], []
    nf = n_scenes * frames_per_scene
    for i in range(n):
        w, h = 16 + int(i % 4), 12
        frames = []
        for _s in range(n_scenes):
            base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.int64)
            for j in range(frames_per_scene):
                frames.append(np.minimum(base + j, 255).astype(np.uint8))
        ids.append(i)
        payloads.append(encode_ppm_stream(np.stack(frames)))
        metas.append({"width": w, "height": h, "duration_ms": nf * 40,
                      "format": "ppm-stream"})
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_video_table(n: int, n_frames: int = 12, seed: int = 42) -> pa.Table:
    """Deterministic REAL video rows: each payload is a concatenated-PPM
    stream of ``n_frames`` distinct frames (per-frame content varies so a
    sampler that decodes the wrong frame produces different features)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, payloads, metas = [], [], []
    for i in range(n):
        w, h = 16 + int(i % 4), 12
        frames = rng.integers(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
        # stamp the frame ordinal into the pixels: frame fi is brightened by
        # fi so decoded features are frame-index-dependent (deterministic)
        frames = np.minimum(frames.astype(np.int64) + np.arange(n_frames)[:, None, None, None] * 5, 255).astype(np.uint8)
        ids.append(i)
        payloads.append(encode_ppm_stream(frames))
        metas.append({"width": w, "height": h, "duration_ms": n_frames * 40,
                      "format": "ppm-stream"})
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        },
        schema=MEDIA_SCHEMA,
    )


class FrameSampleStage:
    """Video frame sampling: explodes each video row into ``n_frames`` frame
    rows (media_id, frame_idx, payload).

    ``real=True`` REALLY parses the concatenated-PPM container: frame spans
    come from a header walk (never a full decode), ``n_frames`` evenly-spaced
    frames are sliced out as standalone P6 payloads — directly decodable by
    ``DecodeStage(real=True)``, so sample→decode→featurize composes into a
    real video feature pipeline (see ``queries.multimodal_frames``). Emits
    ``frame_w``/``frame_h``/``src_frames`` from the parsed headers. Unknown
    containers raise into divide&conquer like every other codec here.
    ``real=False`` keeps the byte-slice fake for plumbing tests."""

    def __init__(self, n_frames: int = 4, real: bool = False):
        self.n_frames = n_frames
        self.real = real

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, payloads = [], [], []
        ws, hs, srcs = [], [], []
        media_ids = batch["media_id"].to_pylist()
        pls = batch["payload"].to_pylist()
        for mid, p in zip(media_ids, pls):
            if self.real:
                spans = _ppm_frame_offsets(p)
                take = np.unique(
                    np.linspace(0, len(spans) - 1, min(self.n_frames, len(spans))).astype(int)
                )
                for fi in take:
                    o, ln = spans[fi]
                    frame = p[o : o + ln]
                    w, h = _ppm_dims(frame)
                    ids.append(mid)
                    idxs.append(int(fi))
                    payloads.append(frame)
                    ws.append(w)
                    hs.append(h)
                    srcs.append(len(spans))
            else:
                step = max(len(p) // self.n_frames, 1)
                for fi in range(self.n_frames):
                    ids.append(mid)
                    idxs.append(fi)
                    payloads.append(p[fi * step : (fi + 1) * step])
        cols = {
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        }
        if self.real:
            cols["frame_w"] = pa.array(ws, pa.int32())
            cols["frame_h"] = pa.array(hs, pa.int32())
            cols["src_frames"] = pa.array(srcs, pa.int32())
        return pa.table(cols)


def _ppm_dims(frame: bytes) -> tuple[int, int]:
    (off, _ln), = _ppm_frame_offsets(frame)
    # re-parse just the header tokens for dims
    p, parts = off + 2, []
    while len(parts) < 3:
        while frame[p] in b" \t\r\n":
            p += 1
        tok = bytearray()
        while frame[p] not in b" \t\r\n":
            tok.append(frame[p])
            p += 1
        parts.append(int(tok))
    return parts[0], parts[1]


# ---------------------------------------------------------------------------
# perceptual hash (aHash) for image near-dup detection
# ---------------------------------------------------------------------------

# BT.601 luminance weights ×1000 — integer arithmetic end to end so the
# DuckDB oracle can reproduce every bit exactly (no float rounding to drift).
_LUM_W = np.array([299, 587, 114], dtype=np.int64)

# 16-bit popcount lookup (numpy 1.26 has no bitwise_count); 64 KiB, built once
# at import.
_POP16 = np.unpackbits(
    np.arange(65536, dtype=np.uint16).view(np.uint8).reshape(-1, 2), axis=1
).sum(axis=1, dtype=np.int64)


def ahash_bands(pixels: np.ndarray) -> tuple[int, int, int, int]:
    """64-bit average hash (aHash) of an RGB image as four 16-bit bands.

    Integer-exact by construction: luminance = 299r+587g+114b (BT.601 ×1000
    over uint8 channels), the 8×8 grid is :func:`resize_nearest`'s
    floor-index downsample ((i*H)//8, (j*W)//8 — spatial, so the BMP
    bottom-up row order matters and is handled by the decoder), and bit
    k = row*8+col is set iff 64*lum_k > sum(all 64 lums) (strict >).
    Band k//16 holds bit k at position k%16 — the banded-hamming LSH unit:
    two hashes within hamming ≤ 3 are GUARANTEED to share a band
    (pigeonhole over 4 bands); beyond that, sharing is content-dependent,
    which is the standard banded-LSH candidate semantic."""
    if pixels.shape[0] < 8 or pixels.shape[1] < 8:
        raise ValueError("aHash needs at least an 8x8 image")
    lum = pixels.astype(np.int64) @ _LUM_W
    grid = resize_nearest(lum, 8, 8)
    bits = (64 * grid.ravel() > grid.sum())
    vals = np.where(bits, np.int64(1) << (np.arange(64) % 16), np.int64(0))
    return tuple(int(v) for v in vals.reshape(4, 16).sum(axis=1))


class PHashStage:
    """Actor-pool perceptual-hash stage: decodes BMP/PPM image payloads and
    emits the aHash as four 16-bit band columns ``b0..b3`` (see
    :func:`ahash_bands`). Cross-container by design — the same pixels hash
    identically whether stored as BMP or PPM, so re-encoded copies of an
    image are found. Non-image payloads raise into divide & conquer like
    every other codec here (reference error-isolation convention,
    app/models/transfer_thread.rb:361)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.schema(
                [("media_id", pa.int64())] + [(f"b{i}", pa.int64()) for i in range(4)]
            ).empty_table()
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        bands = np.empty((len(batch), 4), dtype=np.int64)
        for i, p in enumerate(payloads):
            raw = p.as_py()
            px = decode_bmp(raw) if raw[:2] == b"BM" else decode_ppm(raw)
            bands[i] = ahash_bands(px)
        return pa.table(
            {
                "media_id": batch["media_id"],
                **{f"b{i}": pa.array(bands[:, i]) for i in range(4)},
            }
        )


def hamming_from_bands(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between (m, 4) int64 band matrices."""
    return _POP16[np.bitwise_xor(a, b)].sum(axis=1)


def synth_phash_media_table(n_base: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic image fixture for perceptual-hash dedup: base images
    plus two variant classes — a near-identical copy RE-ENCODED IN THE OTHER
    CONTAINER (id+1000, a 2×3 pixel block brightened by 6: hamming usually
    0-3, so the banded LSH must find it across codecs) and a moderately
    edited copy (id+2000, left half brightened by 45: hamming spreads above
    and below the threshold, exercising both the cut and the candidate
    semantics). All dims ≥ 8 so the 8×8 grid is a true downsample."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, payloads, metas = [], [], []

    def add(mid: int, px: np.ndarray, fmt: str) -> None:
        ids.append(mid)
        payloads.append(encode_bmp(px) if fmt == "bmp" else encode_ppm(px))
        metas.append({"width": px.shape[1], "height": px.shape[0],
                      "duration_ms": 0, "format": fmt})

    for i in range(n_base):
        w, h = 16 + (i % 8), 12
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        fmt = "bmp" if i % 2 == 0 else "ppm"
        add(i, px, fmt)
        if i % 3 == 0:  # near-dup, other container
            near = px.copy()
            near[0:6, 0:8] = np.minimum(near[0:6, 0:8].astype(np.int64) + 14, 255).astype(np.uint8)
            add(1000 + i, near, "ppm" if fmt == "bmp" else "bmp")
        if i % 5 == 0:  # moderate edit, same container
            mod = px.copy()
            mod[:, : w // 2] = np.minimum(mod[:, : w // 2].astype(np.int64) + 45, 255).astype(np.uint8)
            add(2000 + i, mod, fmt)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * len(ids)),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        },
        schema=MEDIA_SCHEMA,
    )
