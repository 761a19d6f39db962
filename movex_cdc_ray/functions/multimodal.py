"""Multimodal column plumbing: opaque binary media + typed metadata.

Images / audio / video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages. The decode libraries (Pillow, ffmpeg,
torchaudio) are NOT in this container, so the actual byte→pixels step is
STUBBED: ``DecodeStage(real=True)`` raises ``NotImplementedError``, while the
default deterministic fake derives pseudo-features from a stable hash of the
bytes. Everything Ray-side — schema, batch sizing for wide binary rows,
actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

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


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-features: seeded from sha256(payload)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal(dim).astype(np.float32)


class DecodeStage:
    """Actor-pool decode: binary payload → feature vector + dimensions.

    Use as ``ds.map_batches(DecodeStage, fn_constructor_kwargs=...,
    batch_size=RECOMMENDED_MEDIA_BATCH_SIZE, concurrency=N, num_cpus=1)``.
    ``real=True`` is the integration point for an actual decoder library —
    unavailable here, so it raises ``NotImplementedError`` at construction
    (per-actor ``__init__``, so the failure is immediate, not per batch)."""

    def __init__(self, feature_dim: int = 64, real: bool = False):
        if real:
            raise NotImplementedError(
                "real media decoding requires Pillow/ffmpeg, not present in this "
                "environment; use real=False for the deterministic fake decoder"
            )
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        feats = np.stack([_fake_features(p.as_py(), self.feature_dim) for p in payloads])
        n = len(batch)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), self.feature_dim
                ),
                "feature_norm": pa.array(np.linalg.norm(feats, axis=1).astype(np.float64)),
                "payload_sha": pa.array(
                    [hashlib.sha256(p.as_py()).hexdigest() for p in payloads], pa.string()
                ),
                "payload_bytes": pa.array(
                    [len(p.as_py()) for p in payloads], pa.int64()
                ),
            }
        )


class ResizeStage:
    """Image resize stub: updates metadata, passes payload through.

    A real implementation decodes → resizes → re-encodes; here the Ray-side
    contract (meta struct rewrite, payload passthrough, batch shape) is
    exercised with the fake."""

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        meta = pa.array(
            [
                {"width": self.width, "height": self.height, "duration_ms": 0, "format": "fake-resized"}
            ]
            * n,
            MEDIA_SCHEMA.field("meta").type,
        )
        i = batch.column_names.index("meta")
        return batch.set_column(i, "meta", meta)


class FrameSampleStage:
    """Video frame-sample stub: explodes each video row into ``n_frames``
    frame rows (media_id, frame_idx, payload slice) — the fan-out shape a
    real sampler produces."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, payloads = [], [], []
        media_ids = batch["media_id"].to_pylist()
        pls = batch["payload"].to_pylist()
        for mid, p in zip(media_ids, pls):
            step = max(len(p) // self.n_frames, 1)
            for fi in range(self.n_frames):
                ids.append(mid)
                idxs.append(fi)
                payloads.append(p[fi * step : (fi + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
