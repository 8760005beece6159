"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video libraries are not available in this container, so the
*decode* kernels are STUBS — a clearly-marked deterministic fake (header
peek + byte statistics) behind the same actor-pool ``map_batches``
interface a real decoder would use (``__init__`` loads the codec once per
actor; ``__call__`` decodes a batch).  Everything Ray-side — schema, small
batch sizes for large payloads, actor signatures, output layout — is real
and tested; swapping in PIL/torchaudio is a one-method change
(`_decode_real` raises ``NotImplementedError`` until those imports exist).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON sidecar metadata
    ]
)


def gen_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (seeded payload bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, metas = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        ids.append(i)
        kind_col.append(kind)
        payloads.append(payload)
        metas.append('{"codec": "fake", "bytes": %d}' % size)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


class MediaDecodeStage:
    """Actor-pool decode stage.  ``use_real=True`` requires codec libraries
    (absent here -> ``NotImplementedError``); the default fake decoder is
    deterministic: dimensions derived from the payload hash, features from
    byte statistics."""

    def __init__(self, use_real: bool = False, thumb_size: int = 8):
        self.use_real = use_real
        self.thumb_size = thumb_size
        if use_real:
            # real path would do: from PIL import Image; import soundfile ...
            raise NotImplementedError(
                "image/audio codecs are not available in this environment; "
                "use the deterministic fake decoder (use_real=False)"
            )

    def _decode_fake(self, payload: bytes, kind: str):
        h = hashlib.sha256(payload).digest()
        w = 16 + h[0] % 240
        hgt = 16 + h[1] % 240
        arr = np.frombuffer(payload, dtype=np.uint8)
        return {
            "width": int(w),
            "height": int(hgt),
            "channels": 3 if kind == "image" else 1,
            "mean_byte": float(arr.mean()) if len(arr) else 0.0,
            "std_byte": float(arr.std()) if len(arr) else 0.0,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        decoded = [self._decode_fake(p or b"", k) for p, k in zip(payloads, kinds)]
        out = batch.select([c for c in ("media_id", "kind") if c in batch.column_names])
        for field in ("width", "height", "channels"):
            out = out.append_column(field, pa.array([d[field] for d in decoded], pa.int32()))
        for field in ("mean_byte", "std_byte"):
            out = out.append_column(field, pa.array([d[field] for d in decoded], pa.float64()))
        return out


class MediaFeatureStage:
    """Feature extraction: 64-bin byte histogram per payload (the
    deterministic stand-in for an image/audio embedding model).  Same
    actor-pool shape as a model stage: state in ``__init__``."""

    def __init__(self, bins: int = 64):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            arr = np.frombuffer(p or b"", dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.edges)
            total = max(1, hist.sum())
            feats.append((hist / total).astype(np.float32))
        mat = np.stack(feats) if feats else np.zeros((0, self.bins), np.float32)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(mat.reshape(-1), pa.float32()), self.bins)
        out = batch.select([c for c in ("media_id", "kind") if c in batch.column_names])
        return out.append_column("embedding", emb)


def frame_sample(payload: bytes, frame_bytes: int = 1024, every: int = 4) -> list:
    """Video frame-sampling stub: byte-chunk 'frames', keep every Nth."""
    frames = [payload[i : i + frame_bytes] for i in range(0, len(payload), frame_bytes)]
    return frames[::every]


class FrameSampleStage:
    """flat-map-style stage: one video row -> N sampled frame rows."""

    def __init__(self, frame_bytes: int = 1024, every: int = 4):
        self.frame_bytes = frame_bytes
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            for j, fr in enumerate(frame_sample(payload or b"", self.frame_bytes, self.every)):
                ids.append(mid)
                frame_idx.append(j)
                frames.append(fr)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )
