"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are STUBS: either raise ``NotImplementedError``
(``strict=True``) or produce a deterministic fake decode keyed on the
payload hash (``strict=False``, default — used by tests/benches to
exercise the REAL Ray-side plumbing: schema, batch sizing, actor
signatures, output layout).

Schema convention:

    media: (media_id:int64, kind:string, payload:binary,
            meta:string/json)
    features out: (media_id, kind, n_bytes, width, height,
                   feature:list<float>)

Batch-size guidance (SURVEY §4.2 memory-aware rule): binary payloads
ride in SMALL batches — ``batch_size`` chosen so
batch_size × max_payload × concurrency fits the worker heap; callers
pass ``batch_size=8..64`` for multi-MB media, never the 4096 default.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 32


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real decoder: pseudo width/height
    and an embedding derived from the payload digest."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    width = 64 + h[0]
    height = 64 + h[1]
    rng = np.random.RandomState(int.from_bytes(h[2:6], "big"))
    feat = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return width, height, feat


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract media payloads.

    A real deployment replaces ``_decode`` with a PIL/ffmpeg call and
    loads the feature model in ``__init__`` (once per actor — the same
    warm-state pattern as the PDF converter pool)."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        # model-load analog: a fixed projection matrix built once
        rng = np.random.RandomState(42)
        self.projection = rng.standard_normal((FEATURE_DIM, FEATURE_DIM)).astype(np.float32)

    def _decode(self, payload: bytes, kind: str):
        if self.strict:
            raise NotImplementedError(
                f"no {kind} codec in this environment; install PIL/ffmpeg "
                "and replace MediaFeatureStage._decode")
        return _fake_decode(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_bytes, widths, heights, feats = [], [], [], []
        for p, k in zip(payloads, kinds):
            p = p or b""
            w, h, f = self._decode(p, k)
            n_bytes.append(len(p))
            widths.append(w)
            heights.append(h)
            feats.append((f @ self.projection).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


def media_features(ds, concurrency=(1, 4), batch_size: int = 32,
                   strict: bool = False):
    """The pipeline entry: actor pool, small batches (binary columns),
    zero-copy Arrow in/out."""
    return ds.map_batches(MediaFeatureStage, fn_constructor_args=(strict,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def synth_media_dataset(n: int = 64, seed: int = 5):
    """Deterministic fake media table for tests/benches."""
    import random

    import ray.data as rd

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(256, 4096)))
        rows.append({"media_id": i, "kind": kind, "payload": payload,
                     "meta": f'{{"codec":"fake","idx":{i}}}'})
    t = pa.Table.from_pylist(rows)
    return rd.from_arrow(t)
