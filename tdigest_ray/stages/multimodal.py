"""Multimodal (image/audio/video) stages.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``, ``height``, ``duration_ms``, ...). The Ray-side
plumbing — schema contracts, actor-pool stages with load-once setup, small
batch sizes for large payloads, output layout — is real and tested; the
actual codec work is stubbed because no image/audio library ships in this
container: each stage tries the real library in ``__init__`` and otherwise
uses a deterministic fake (or raises ``NotImplementedError`` in strict
mode). Swapping in PIL/torchaudio/ffmpeg is a one-line change in the actor's
``__init__`` — the pipeline shape does not move.

Batch-size guidance (SURVEY.md §4 memory row): with payloads of ~1 MB, use
``batch_size<=64`` so batch x concurrency stays inside the worker heap;
these stages are CPU-bound decode work, so run them as actor pools with
``concurrency=(min, max)`` sized to the node.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _deterministic_features(payloads: list[bytes | None], dim: int) -> np.ndarray:
    """Fake 'decode': a deterministic feature vector per payload derived from
    a SHA-256 stream — stable across processes, shaped like a real embedding."""
    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        if not p:
            continue
        h = hashlib.sha256(p).digest()
        need = dim * 4
        buf = bytearray()
        counter = 0
        while len(buf) < need:
            buf += hashlib.sha256(h + counter.to_bytes(4, "big")).digest()
            counter += 1
        vec = np.frombuffer(bytes(buf[:need]), dtype=np.uint32)
        out[i] = (vec % 10_000).astype(np.float32) / 10_000.0
    return out


class DecodeImageStage:
    """Actor-pool stage: payload -> decoded size stats + feature vector.

    ``__init__`` runs once per actor (load-once setup); ``__call__`` per
    batch. In this container PIL is absent, so decode is the deterministic
    fake unless ``strict=True`` (then: NotImplementedError, clearly marking
    the stub boundary).
    """

    def __init__(self, feature_dim: int = 64, strict: bool = False):
        self.feature_dim = feature_dim
        try:  # pragma: no cover - PIL not in this container
            from PIL import Image  # noqa: F401

            self._backend = "pil"
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "image decoding requires PIL; container has no codec "
                    "libraries — run with strict=False for the deterministic "
                    "fake decoder"
                )
            self._backend = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = _deterministic_features(payloads, self.feature_dim)
        sizes = np.asarray([len(p) if p else 0 for p in payloads],
                           dtype=np.int64)
        batch = batch.drop_columns(["payload"])  # decoded output only
        batch = batch.append_column("payload_bytes", pa.array(sizes))
        batch = batch.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float32())))
        return batch


class ResizeImageStage:
    """Actor-pool stage: (width, height) -> resized dims + scale factor.
    Real resampling is stubbed; the metadata math (aspect-preserving fit
    into ``max_side``) is exact and tested."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(float)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(float)
        scale = np.minimum(1.0, self.max_side / np.maximum(np.maximum(w, h), 1))
        batch = batch.append_column(
            "resized_w", pa.array((w * scale).astype(np.int32)))
        batch = batch.append_column(
            "resized_h", pa.array((h * scale).astype(np.int32)))
        batch = batch.append_column("scale", pa.array(scale))
        return batch


class SampleFramesStage:
    """Actor-pool stage for video: pick ``n_frames`` evenly spaced timestamps
    from ``duration_ms`` (frame extraction itself is the stub boundary)."""

    def __init__(self, n_frames: int = 8):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        stamps = [
            np.linspace(0, max(int(d), 0), self.n_frames,
                        endpoint=False).astype(np.int64).tolist()
            for d in dur
        ]
        return batch.append_column(
            "frame_ts_ms", pa.array(stamps, pa.list_(pa.int64())))


def decode_pipeline(ds, feature_dim: int = 64, concurrency=(2, 8),
                    batch_size: int = 64):
    """Canonical multimodal layout: small batches, actor pool, payload
    dropped as soon as features are extracted."""
    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
