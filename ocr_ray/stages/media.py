"""Multimodal (image/audio/video) span processing — real plumbing, stubbed
codecs.

Media payloads are opaque ``large_binary`` columns with typed metadata
(``media_ref``, ``media_kind``, ``n_bytes``). The decode step needs image/
audio libraries that are NOT in this environment, so ``MediaDecoder``
raises ``NotImplementedError`` for real decoding and provides a
deterministic fake (seeded from the payload bytes) behind
``fake_decode=True`` — the Ray-side plumbing (schema, actor signature,
small batch sizes for wide binary rows, output layout) is real and tested.

Scale notes: binary rows are wide — callers must use a small
``batch_size`` (512 default here) so batch x concurrency fits worker
heaps; blocks of oversized rows rely on Ray Data's dynamic block
splitting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_FEATURE_DIM = 8


def synth_media_payload(media_ref: str, *, n_bytes: int = 256) -> bytes:
    """Deterministic opaque payload for a media_ref (fixture side).

    Seeded from a stable digest — NOT Python ``hash()``, which is
    randomized per process and would differ across Ray workers.
    """
    import hashlib

    seed = int.from_bytes(hashlib.md5(media_ref.encode()).digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=n_bytes, dtype=np.uint8).tobytes()


def attach_payloads(batch: pa.Table, *, n_bytes: int = 256) -> pa.Table:
    """Fixture stage: attach synthetic binary payloads + metadata to media rows."""
    refs = batch["media_ref"].to_pylist()
    payloads = [synth_media_payload(r, n_bytes=n_bytes) for r in refs]
    batch = batch.append_column("payload", pa.array(payloads, type=pa.large_binary()))
    batch = batch.append_column("media_kind", pa.array(["image"] * len(refs), type=pa.string()))
    return batch.append_column(
        "n_bytes", pa.array(np.full(len(refs), n_bytes, dtype=np.int64))
    )


class MediaDecoder:
    """Actor-pool stage: decode media payloads and extract features.

    ``__init__`` is where a real run would load the codec / model once per
    actor; ``__call__`` handles one (small) batch of binary rows and emits
    a fixed-dim feature vector per media item.
    """

    def __init__(self, *, fake_decode: bool = True):
        if not fake_decode:
            raise NotImplementedError(
                "real image/audio decoding requires libs not present in this "
                "environment (PIL/ffmpeg); run with fake_decode=True"
            )
        self.fake_decode = fake_decode

    def _features(self, payload: bytes) -> np.ndarray:
        # Deterministic stand-in for decode + feature extraction: moment
        # statistics of the byte stream reshaped to MEDIA_FEATURE_DIM lanes.
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        lanes = arr[: len(arr) - len(arr) % MEDIA_FEATURE_DIM].reshape(-1, MEDIA_FEATURE_DIM)
        return lanes.mean(axis=0) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack([self._features(p) for p in batch["payload"].to_pylist()])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "media_kind": batch["media_kind"],
                "n_bytes": batch["n_bytes"],
                "feature": pa.array(list(feats.astype(np.float32))),
                "feature_norm": pa.array(np.linalg.norm(feats, axis=1)),
            }
        )
