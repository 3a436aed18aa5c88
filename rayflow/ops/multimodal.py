"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``width``/``height``/``duration_ms``…).  Decode /
resize / feature-extract run as actor-pool ``map_batches`` stages with
SMALL batch sizes (payload bytes × batch_size × concurrency must fit the
worker heap — the block-sizing rule for wide binary rows).

The actual codecs (Pillow / torchaudio / ffmpeg) are NOT in this
container, so the decode kernel is STUBBED: with ``fake=True`` (default)
it produces a deterministic pseudo-decode derived from the payload bytes
(so the whole pipeline — schema, batching, actor signatures, output
layout — is real and tested); with ``fake=False`` it raises
``NotImplementedError`` at the exact point a real decoder plugs in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from rayflow.ops import register_op

#: media table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # image/png, audio/wav, ...
    ("payload", pa.large_binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media fixture (no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    types = np.array(["image/png", "audio/wav"])[rng.integers(0, 2, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "media_type": pa.array(types),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(rng.integers(16, 256, n, dtype=np.int32)),
        "height": pa.array(rng.integers(16, 256, n, dtype=np.int32)),
        "duration_ms": pa.array(rng.integers(0, 10_000, n, dtype=np.int32)),
    })


class MediaDecoder:
    """Actor-pool decode stage.  Heavy init (codec contexts, model
    weights) belongs HERE, once per actor — never per batch."""

    def __init__(self, feature_dim: int = 32, fake: bool = True):
        self.dim = feature_dim
        self.fake = fake
        if not fake:
            # real implementation would import PIL / torchaudio here
            raise NotImplementedError(
                "real media codecs are not available in this environment; "
                "construct with fake=True for the deterministic stub"
            )

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-features: sha256-seeded uniform vector
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        return np.random.default_rng(seed).random(self.dim, dtype=np.float64)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        feats = [self._fake_decode(p) for p in payloads]
        return pa.table({
            "media_id": t.column("media_id"),
            "media_type": t.column("media_type"),
            "feature": pa.array([f.tolist() for f in feats],
                                type=pa.list_(pa.float64())),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })


@register_op("media_decode")
def build_media_decode(*, feature_dim: int = 32, fake: bool = True,
                       batch_size: int = 64, concurrency: int = 2):
    """Binary payload → feature vector.  Small ``batch_size`` on purpose:
    batch bytes ≈ payload_size × batch_size must stay well under the
    worker heap with ``concurrency`` actors resident."""

    def apply(ds):
        return ds.map_batches(
            MediaDecoder,
            fn_constructor_kwargs=dict(feature_dim=feature_dim, fake=fake),
            batch_size=batch_size,
            concurrency=concurrency,
            batch_format="pyarrow",
            zero_copy_batch=True,
            num_cpus=1,
        )

    return apply


@register_op("media_frame_sample")
def build_media_frame_sample(*, every_ms: int = 1000):
    """Video → frame rows (stubbed): one output row per sampled frame
    timestamp, payload sliced deterministically.  Real frame extraction
    plugs into the marked kernel."""

    def apply(ds):
        def fn(t: pa.Table) -> pa.Table:
            ids, types, stamps = [], [], []
            for i in range(t.num_rows):
                dur = t.column("duration_ms")[i].as_py() or 0
                mid = t.column("media_id")[i].as_py()
                mt = t.column("media_type")[i].as_py()
                for ts in range(0, max(dur, 1), every_ms):
                    ids.append(mid)
                    types.append(mt)
                    stamps.append(ts)
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "frame_ms": pa.array(stamps, pa.int32()),
            })

        return ds.map_batches(fn, batch_size=64, **{"batch_format": "pyarrow",
                                                    "zero_copy_batch": True})

    return apply
