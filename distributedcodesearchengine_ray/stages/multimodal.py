"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The decode stage has a REAL path for every format decodable without
external codec libraries — P6/P5 PPM/PGM images and RIFF/PCM WAV audio are
parsed with numpy + the stdlib ``wave`` module, returning true dimensions
and pixel/sample statistics.  Formats that require codecs absent from this
container (JPEG/PNG/MP4...) raise ``NotImplementedError`` from the real
path with the install hint; the deterministic fake decoder (header peek +
byte statistics) remains for synthetic corpora.  Everything Ray-side —
schema, small batch sizes for large payloads, actor signatures
(``__init__`` holds per-actor state, ``__call__`` decodes a batch), output
layout — is identical across the real and fake paths.
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


def _make_ppm(rng: np.random.Generator) -> tuple:
    """Real P6 PPM image bytes (pure numpy; no codec lib needed)."""
    w = int(rng.integers(16, 48))
    h = int(rng.integers(16, 48))
    pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()
    return data, w, h


def _make_wav(rng: np.random.Generator) -> tuple:
    """Real RIFF/PCM-16 WAV bytes via the stdlib ``wave`` writer."""
    import io
    import wave

    n_frames = int(rng.integers(400, 2000))
    rate = 8000
    samples = rng.integers(-20000, 20000, size=n_frames, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue(), n_frames, rate


def gen_media_table(n: int, seed: int = 42, real_formats: bool = False) -> pa.Table:
    """Deterministic media corpus.  ``real_formats=True`` emits genuinely
    decodable payloads (P6 PPM images, PCM WAV audio) so the REAL decode
    path is exercised end-to-end; video payloads are always opaque fakes
    (no container format is writable without codec libs)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, kind_col, payloads, metas = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        if real_formats and kind == "image":
            payload, w, h = _make_ppm(rng)
            meta = '{"codec": "ppm", "width": %d, "height": %d}' % (w, h)
        elif real_formats and kind == "audio":
            payload, frames, rate = _make_wav(rng)
            meta = '{"codec": "wav", "frames": %d, "rate": %d}' % (frames, rate)
        else:
            size = int(rng.integers(256, 4096))
            payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            meta = '{"codec": "fake", "bytes": %d}' % size
        ids.append(i)
        kind_col.append(kind)
        payloads.append(payload)
        metas.append(meta)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_col, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


def decode_ppm(payload: bytes) -> dict:
    """Real P6/P5 netpbm decode: header parse + pixel stats (numpy only)."""
    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    # header tokens: magic, width, height, maxval — '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(payload):
        ch = payload[pos : pos + 1]
        if ch == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, _maxval = fields
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=pos)
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "mean_byte": float(pixels.mean()) if len(pixels) else 0.0,
        "std_byte": float(pixels.std()) if len(pixels) else 0.0,
    }


def decode_wav(payload: bytes) -> dict:
    """Real RIFF/PCM WAV decode via stdlib ``wave`` + numpy sample stats.

    Schema mapping for audio: width = frame count, height = sample rate.
    """
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n, rate, ch, sw = w.getnframes(), w.getframerate(), w.getnchannels(), w.getsampwidth()
        data = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    samples = np.frombuffer(data, dtype=dtype) if dtype else np.empty(0, np.int16)
    return {
        "width": n,
        "height": rate,
        "channels": ch,
        "mean_byte": float(samples.mean()) if len(samples) else 0.0,
        "std_byte": float(samples.std()) if len(samples) else 0.0,
    }


class MediaDecodeStage:
    """Actor-pool decode stage.

    ``use_real=True`` decodes for real every format parseable without
    external codec libraries — P6/P5 netpbm images and RIFF/PCM WAV — and
    raises ``NotImplementedError`` (with the install hint) for payloads
    that need PIL/ffmpeg-class codecs.  ``use_real=False`` is the
    deterministic fake for opaque synthetic payloads: dimensions from the
    payload hash, features from byte statistics."""

    def __init__(self, use_real: bool = False, thumb_size: int = 8):
        self.use_real = use_real
        self.thumb_size = thumb_size

    def _decode_real(self, payload: bytes, kind: str):
        if payload[:2] in (b"P6", b"P5"):
            return decode_ppm(payload)
        if payload[:4] == b"RIFF":
            return decode_wav(payload)
        raise NotImplementedError(
            f"no codec for this {kind} payload (magic {payload[:4]!r}): "
            "only netpbm (P5/P6) and PCM WAV decode without external "
            "libraries; install PIL/soundfile/ffmpeg for JPEG/PNG/MP3/MP4"
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
        decode = self._decode_real if self.use_real else self._decode_fake
        decoded = [decode(p or b"", k) for p, k in zip(payloads, kinds)]
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


def _ppm_pixels(payload: bytes) -> tuple:
    """Decode a P6/P5 netpbm payload to (pixels ndarray [h,w,c], w, h).
    One header parse (``_ppm_header``, which also rejects maxval > 255
    2-byte-sample payloads) locates the pixel data."""
    w, h, c, pos, _end = _ppm_header(payload)
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=pos)
    return px.reshape(h, w, c), w, h


def resize_ppm(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of a P6/P5 netpbm image — pure numpy
    integer index math (``src = floor((dst + 0.5) * src_dim / dst_dim)``,
    the standard nearest-neighbor grid), re-encoded as a valid netpbm
    payload round-trippable through ``decode_ppm``."""
    px, w, h = _ppm_pixels(payload)
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    thumb = px[ys][:, xs]
    magic = b"P6" if px.shape[2] == 3 else b"P5"
    return magic + f"\n{tw} {th}\n255\n".encode() + thumb.tobytes()


class MediaResizeStage:
    """Actor-pool resize/thumbnail stage (the image-preprocessing shape:
    decode -> resize -> re-encode, one batch per call, target size held
    as per-actor state in ``__init__``).

    ``use_real=True`` resizes netpbm payloads for real (nearest-neighbor,
    numpy) and raises ``NotImplementedError`` for codec formats absent
    from this container; ``use_real=False`` emits a deterministic fake
    thumbnail (sha256-seeded bytes of exactly the target dimensions) so
    the Ray-side plumbing — schema, binary output column, actor pool
    shape — is identical either way."""

    def __init__(self, width: int = 16, height: int = 16, use_real: bool = False):
        self.width = width
        self.height = height
        self.use_real = use_real

    def _one(self, payload: bytes, kind: str) -> bytes:
        if self.use_real:
            if payload[:2] in (b"P6", b"P5"):
                return resize_ppm(payload, self.width, self.height)
            raise NotImplementedError(
                f"no codec to resize this {kind} payload (magic "
                f"{payload[:4]!r}); only netpbm resizes without external "
                "libraries — install PIL for JPEG/PNG"
            )
        seed = hashlib.sha256(payload).digest()
        n = self.width * self.height * 3
        reps = -(-n // len(seed))
        body = (seed * reps)[:n]
        return b"P6" + f"\n{self.width} {self.height}\n255\n".encode() + body

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = [
            self._one(p or b"", k)
            for p, k in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())
        ]
        out = batch.select([c for c in ("media_id", "kind") if c in batch.column_names])
        out = out.append_column("thumb", pa.array(thumbs, pa.binary()))
        out = out.append_column(
            "thumb_w", pa.array([self.width] * len(batch), pa.int32())
        )
        out = out.append_column(
            "thumb_h", pa.array([self.height] * len(batch), pa.int32())
        )
        return out


def frame_sample(payload: bytes, frame_bytes: int = 1024, every: int = 4) -> list:
    """Video frame-sampling fallback for OPAQUE codec payloads:
    byte-chunk 'frames', keep every Nth (the plumbing stand-in where
    the codec libraries are absent — see ``split_ppm_stream`` for the
    real netpbm-container path)."""
    frames = [payload[i : i + frame_bytes] for i in range(0, len(payload), frame_bytes)]
    return frames[::every]


def _ppm_header(payload: bytes, base: int = 0) -> tuple:
    """Parse one netpbm header at ``base`` -> (w, h, channels,
    data_offset, frame_end).  Raises ValueError on a non-P5/P6 magic."""
    magic = payload[base : base + 2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a netpbm frame at {base}: {magic!r}")
    channels = 3 if magic == b"P6" else 1
    pos, fields = base + 2, []
    while len(fields) < 3 and pos < len(payload):
        ch = payload[pos : pos + 1]
        if ch == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError(
            f"netpbm maxval {maxval} > 255 (2-byte samples) is not supported"
        )
    return w, h, channels, pos, pos + w * h * channels


def split_ppm_stream(payload: bytes) -> list:
    """REAL video-container decode for the in-container scope: a 'video'
    is a stream of concatenated P6/P5 frames (MJPEG's shape with netpbm
    frames); each frame's extent comes from its own header, so this is
    an actual parse, not byte-chunking.  Returns the frame payloads,
    each independently decodable by ``decode_ppm`` / resizable by
    ``resize_ppm``.  Raises ValueError when the stream has trailing
    non-netpbm bytes (honest guard, same policy as the codec errors)."""
    frames = []
    pos = 0
    n = len(payload)
    while pos < n:
        w, h, c, _, end = _ppm_header(payload, pos)
        if end > n:
            raise ValueError(
                f"truncated netpbm frame at {pos}: needs {end - n} more bytes"
            )
        frames.append(payload[pos:end])
        pos = end
    return frames


def frame_sample_ppm(payload: bytes, every: int = 4) -> list:
    """Every Nth REAL frame of a concatenated-netpbm video stream."""
    return split_ppm_stream(payload)[::every]


class FrameSampleStage:
    """flat-map-style stage: one video row -> N sampled frame rows.

    ``use_real=True`` parses concatenated-netpbm streams into true
    frames (``split_ppm_stream``) and raises on other containers
    (install hint — the honest-guard policy); ``use_real=False`` keeps
    the byte-chunk fallback so the Ray plumbing is exercised with any
    payload."""

    def __init__(self, frame_bytes: int = 1024, every: int = 4,
                 use_real: bool = False):
        self.frame_bytes = frame_bytes
        self.every = every
        self.use_real = use_real

    def _frames(self, payload: bytes) -> list:
        if self.use_real:
            if payload[:2] in (b"P6", b"P5"):
                return frame_sample_ppm(payload, self.every)
            raise NotImplementedError(
                f"no codec to split this video payload (magic "
                f"{payload[:4]!r}); only concatenated netpbm streams "
                "decode without external libraries — install PyAV/ffmpeg "
                "for real containers"
            )
        return frame_sample(payload, self.frame_bytes, self.every)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            for j, fr in enumerate(self._frames(payload or b"")):
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


def chunk_wav(payload: bytes, window_ms: int = 250, hop_ms: int = 125) -> list:
    """REAL audio windowing over a PCM WAV payload: fixed-length windows
    with hop, per-window integer features — RMS (milli, relative to
    full scale) and zero-crossing count.  Mono-izes by taking channel 0;
    the last partial window is kept (standard STFT-frame convention is
    parameterizable upstream by trimming).  Returns
    [(start_ms, n_samples, rms_milli, zero_crossings), ...]."""
    import io
    import wave

    if not payload:
        return []  # null/empty audio rows yield no windows
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n, rate, ch, sw = (
                w.getnframes(), w.getframerate(), w.getnchannels(),
                w.getsampwidth(),
            )
            data = w.readframes(n)
    except (wave.Error, EOFError) as e:
        raise ValueError(
            f"not a RIFF/PCM WAV payload (magic {payload[:4]!r}): {e}; "
            "install soundfile/ffmpeg for compressed audio formats"
        ) from e
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    samples = np.frombuffer(data, dtype=dtype).reshape(-1, ch)[:, 0].astype(np.int64)
    if sw == 1:  # unsigned 8-bit centers at 128
        samples = samples - 128
    full_scale = float(1 << (8 * sw - 1))
    win = max(1, rate * window_ms // 1000)
    hop = max(1, rate * hop_ms // 1000)
    out = []
    for start in range(0, max(len(samples), 1), hop):
        seg = samples[start : start + win]
        if len(seg) == 0:
            break
        rms = float(np.sqrt(np.mean(seg.astype(np.float64) ** 2)))
        zc = int(np.count_nonzero(np.diff(np.signbit(seg))))
        out.append(
            (
                int(start * 1000 // rate),
                int(len(seg)),
                int(np.floor(rms / full_scale * 1000 + 0.5)),
                zc,
            )
        )
        if start + win >= len(samples):
            break
    return out


class MediaSummaryStage:
    """Fused decode -> features -> frame-sample stage: ONE pass over each
    payload batch composing the three reusable stages
    (``MediaDecodeStage`` / ``MediaFeatureStage`` / ``FrameSampleStage``)
    and emitting tiny per-kind PARTIAL summary rows
    (kind, n, width_sum, emb_dim, frames_sampled) — the map-side
    pre-aggregation shape: at corpus scale the payload bytes are read
    once and only a handful of counter rows per batch leave the task.
    The driver folds the partials by kind (sum of n/width_sum/frames,
    max emb_dim)."""

    def __init__(self, use_real: bool = True, every: int = 2, bins: int = 64):
        self.decode = MediaDecodeStage(use_real=use_real)
        self.features = MediaFeatureStage(bins=bins)
        self.frames = FrameSampleStage(every=every, use_real=use_real)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = self.decode(batch)
        emb_dim = self.features.bins
        frames = self.frames(batch)
        n_frames = len(frames)
        kinds = decoded["kind"].to_pylist()
        widths = decoded["width"].to_numpy(zero_copy_only=False)
        agg = {}
        for k, w in zip(kinds, widths):
            n, ws = agg.get(k, (0, 0))
            agg[k] = (n + 1, ws + int(w))
        ks = sorted(agg)
        return pa.table(
            {
                "kind": pa.array(ks, pa.string()),
                "n": pa.array([agg[k][0] for k in ks], pa.int64()),
                "width_sum": pa.array([agg[k][1] for k in ks], pa.int64()),
                "emb_dim": pa.array([emb_dim] * len(ks), pa.int64()),
                "frames_sampled": pa.array(
                    [n_frames if k == "video" else 0 for k in ks], pa.int64()
                ),
            }
        )


class AudioWindowStage:
    """flat-map-style stage: one audio row -> one row per analysis
    window (the frame-sampling analog for audio) — real PCM decode +
    windowed RMS / zero-crossing features, state-free per batch."""

    def __init__(self, window_ms: int = 250, hop_ms: int = 125):
        self.window_ms = window_ms
        self.hop_ms = hop_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, win_idx, start_ms, n_samp, rms_m, zcs = [], [], [], [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "audio":
                continue
            for j, (s, ns, r, z) in enumerate(
                chunk_wav(payload or b"", self.window_ms, self.hop_ms)
            ):
                ids.append(mid)
                win_idx.append(j)
                start_ms.append(s)
                n_samp.append(ns)
                rms_m.append(r)
                zcs.append(z)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "win_idx": pa.array(win_idx, pa.int32()),
                "start_ms": pa.array(start_ms, pa.int64()),
                "n_samples": pa.array(n_samp, pa.int64()),
                "rms_milli": pa.array(rms_m, pa.int64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
            }
        )
