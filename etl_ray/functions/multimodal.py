"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns processed by
actor-pool ``map_batches`` stages. The decode kernels themselves are
STUBBED (no image/audio libraries in this environment — clearly marked
below); the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested. Swap ``_decode_stub`` for a PIL /
torchaudio call and nothing else changes.

Batch-size discipline: binary payloads are wide — size ``batch_size`` so
``batch_size × concurrency × avg_payload`` fits the worker heap
(SURVEY.md §4 memory-pressure row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode: deterministic fake 'decoded' array derived from the
    bytes. Replace with a real decoder (PIL.Image.open / soundfile.read);
    the deterministic fake keeps the pipeline testable without the libs."""
    if payload is None:
        raise NotImplementedError("real decoder required for null-payload handling")
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: 64 * 64].astype(np.float32) / 255.0


class DecodeFeatureStage:
    """Actor-pool stage: decode payload → fixed-length feature vector.

    ``__init__`` is where a real model/codec would be loaded once per
    actor; ``__call__`` processes one Arrow batch. Output layout: input
    metadata columns + ``feat`` (list<float32>) + ``feat_norm``.
    """

    FEAT_DIM = 16

    def __init__(self):
        # real pipeline: self.model = load_model(...); here: fixed projection
        rng = np.random.default_rng(4242)
        self.proj = rng.standard_normal((64 * 64, self.FEAT_DIM)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pandas()
        kinds = batch.column("kind").to_pandas()
        feats = np.zeros((len(payloads), self.FEAT_DIM), dtype=np.float32)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            dec = _decode_stub(p, k)
            padded = np.zeros(64 * 64, dtype=np.float32)
            padded[: len(dec)] = dec
            feats[i] = padded @ self.proj
        norms = np.linalg.norm(feats, axis=1)
        # decode invariant the SQL oracle can reproduce: integer sum of the
        # decoded byte window / 255 (exact in float64 — the int sum happens
        # BEFORE the division on both sides, so no float-summation-order
        # discrepancy vs DuckDB)
        checksums = np.array(
            [
                int(np.frombuffer(p, dtype=np.uint8)[: 64 * 64].sum(dtype=np.int64))
                for p in batch.column("payload").to_pandas()
            ],
            dtype=np.float64,
        ) / 255.0
        from etl_ray.functions.rounding import round_half_away

        out = batch.drop_columns(["payload"])  # features replace heavy bytes
        out = out.append_column("feat", pa.array(list(feats), pa.list_(pa.float32(), self.FEAT_DIM)))
        out = out.append_column("feat_norm", pa.array(np.round(norms, 4).astype(np.float64)))
        out = out.append_column("decode_checksum", pa.array(round_half_away(checksums, 6)))
        return out


def extract_features(ds: rd.Dataset, concurrency: int = 4, batch_size: int = 256) -> rd.Dataset:
    """Media dataset → feature dataset (drops payload bytes early so the
    wide column never crosses more stages than necessary)."""
    return ds.map_batches(
        DecodeFeatureStage,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def documents_as_media(batch: pa.Table) -> pa.Table:
    """Adapter used by tests/queries: documents → MEDIA_SCHEMA, treating
    utf-8 text bytes as the opaque payload (deterministic stand-in)."""
    text = batch.column("text").to_pandas()
    payload = [(t or "").encode("utf-8") for t in text]
    n = batch.num_rows
    return pa.table(
        {
            "media_id": batch.column("doc_id").cast(pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payload, pa.binary()),
            "meta_width": pa.array(np.full(n, 64, np.int32)),
            "meta_height": pa.array(np.full(n, 64, np.int32)),
            "meta_duration_ms": pa.array(np.zeros(n, np.int32)),
        }
    )


class FrameSampleStage:
    """Stateless frame-sampling kernel: video row → one row per sampled
    frame (run task-based via ``sample_frames`` — there is no per-actor
    state; a real decoder that loads a codec would move this behind an
    actor pool like ``DecodeFeatureStage``).

    Uniform sampling: n = min(max_frames, ceil(duration/1000 ms)) frames
    at ts = i * duration // n (exact integer math — the sampling layout
    is the contract; the per-frame pixel decode stays behind
    ``_decode_stub`` like the other media kernels). Explode happens
    INSIDE the stage so the wide payload column is dropped before any
    exchange; a real decoder slots into ``__init__``/per-frame hook
    without changing the layout.
    """

    def __init__(self, max_frames: int = 8):
        self.max_frames = max_frames
        # real pipeline: self.codec = open_decoder(...)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "media_id": pa.array([], pa.int64()),
            "n_frames": pa.array([], pa.int64()),
            "frame_idx": pa.array([], pa.int64()),
            "frame_ts_ms": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0 or "media_id" not in batch.column_names:
            return empty
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        dur = batch.column("meta_duration_ms").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = np.minimum(self.max_frames, -(-dur // 1000))
        n = np.maximum(n, 1)
        reps = n.astype(np.int64)
        media = np.repeat(ids, reps)
        nf = np.repeat(reps, reps)
        idx = np.concatenate([np.arange(k, dtype=np.int64) for k in reps]) \
            if len(reps) else np.empty(0, np.int64)
        durs = np.repeat(dur, reps)
        ts = idx * durs // nf
        return pa.table({
            "media_id": pa.array(media),
            "n_frames": pa.array(nf),
            "frame_idx": pa.array(idx),
            "frame_ts_ms": pa.array(ts),
        })


def sample_frames(ds: rd.Dataset, max_frames: int = 8,
                  batch_size: int = 256) -> rd.Dataset:
    """Media dataset → sampled-frame dataset (payload dropped in-stage)."""
    import functools

    return ds.map_batches(
        functools.partial(_frame_sample_task, max_frames=max_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def _frame_sample_task(batch: pa.Table, max_frames: int = 8) -> pa.Table:
    return FrameSampleStage(max_frames)(batch)
