"""Multimodal columns: REAL uncompressed-container codecs + plumbing.

Image/audio/video payloads are opaque ``binary`` columns processed by
actor-pool ``map_batches`` stages. The decode kernels are REAL pure-numpy
parsers for uncompressed containers — 24-bit BMP (BITMAPINFOHEADER) and
16-bit PCM WAV (RIFF) — no third-party codec libraries needed. Payload
synthesis (:func:`synthesize_media`) writes genuine BMP/WAV files whose
content derives from the SQL-replicable fmix32 hash, so the DuckDB
oracle can verify the decoded pixel/sample statistics end-to-end
(container encode → binary column → header parse → pixel/sample decode).
``_decode_stub`` remains only as the fallback for kinds with no codec in
this sandbox (e.g. compressed video frames).

Batch-size discipline: binary payloads are wide — size ``batch_size`` so
``batch_size × concurrency × avg_payload`` fits the worker heap
(SURVEY.md §4 memory-pressure row).
"""

from __future__ import annotations

import struct

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


# --- real codecs: 24-bit BMP ------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR byte order,
    rows padded to 4 bytes — the on-disk format any image viewer reads)."""
    h, w, c = pixels.shape
    assert c == 3
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    data_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                      2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up, BGR
    rows[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    return header + dib + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array
    (top-down). Pure numpy; validates magic, bpp and compression."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=off).reshape(h, stride)
    img = rows[:, :row_bytes].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


# --- real codecs: 16-bit PCM WAV --------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a canonical RIFF/WAVE PCM file."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM mono RIFF/WAVE file → (sample_rate, int16
    samples). Walks the chunk list (handles extra chunks and odd-length
    chunk padding per the RIFF spec)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt}, ch={channels}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples


# --- fmix32-derived payload synthesis (SQL-replicable content) ---------------

_IMG_W = _IMG_H = 16          # 768 pixel bytes
_WAV_N = 256                  # samples
_WAV_RATE = 8000              # → exactly 32 ms
_AUDIO_KEY_OFF = 1024         # audio keys live in a distinct sub-space


def synthesize_media(batch: pa.Table) -> pa.Table:
    """documents → MEDIA_SCHEMA with REAL container payloads: even
    doc_ids get a 16×16 24-bit BMP whose pixel byte i is
    ``fmix32(doc_id*4096 + i) % 256``; odd doc_ids get a 256-sample
    16-bit PCM WAV with sample i = ``fmix32(doc_id*4096 + 1024 + i) %
    65536 - 32768``. Content is pure fmix32 so the DuckDB oracle can
    recompute the decoded statistics without parsing binaries — while
    the ENGINE path must round-trip the actual container bytes."""
    from etl_ray.functions.sketch import _fmix32

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    payloads, kinds = [], []
    widths = np.zeros(n, np.int32)
    heights = np.zeros(n, np.int32)
    durs = np.zeros(n, np.int32)
    npx = _IMG_W * _IMG_H * 3
    for j, d in enumerate(ids):
        if d % 2 == 0:
            keys = (np.int64(d) * 4096 + np.arange(npx, dtype=np.int64)) % (1 << 32)
            px = (_fmix32(keys.astype(np.uint64)) % 256).astype(np.uint8)
            payloads.append(encode_bmp(px.reshape(_IMG_H, _IMG_W, 3)))
            kinds.append("image")
            widths[j] = _IMG_W
            heights[j] = _IMG_H
        else:
            keys = (np.int64(d) * 4096 + _AUDIO_KEY_OFF
                    + np.arange(_WAV_N, dtype=np.int64)) % (1 << 32)
            s = (_fmix32(keys.astype(np.uint64)) % 65536).astype(np.int64) - 32768
            payloads.append(encode_wav(s.astype(np.int16), _WAV_RATE))
            kinds.append("audio")
            durs[j] = _WAV_N * 1000 // _WAV_RATE
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(widths),
            "meta_height": pa.array(heights),
            "meta_duration_ms": pa.array(durs),
        }
    )


def parse_media_meta(batch: pa.Table) -> pa.Table:
    """Header-parse stage: reads width/height (BMP DIB) and sample-count/
    rate → duration (WAV fmt/data chunks) from the REAL container bytes —
    the metadata columns are re-derived from the payload, never trusted
    from the producer."""
    payloads = batch.column("payload").to_pylist()
    kinds = batch.column("kind").to_pylist()
    n = len(payloads)
    width = np.zeros(n, np.int64)
    height = np.zeros(n, np.int64)
    dur = np.zeros(n, np.int64)
    blen = np.zeros(n, np.int64)
    for i, (p, k) in enumerate(zip(payloads, kinds)):
        blen[i] = len(p)
        if k == "image":
            img = decode_bmp(p)
            height[i], width[i] = img.shape[0], img.shape[1]
        elif k == "audio":
            rate, samples = decode_wav(p)
            dur[i] = len(samples) * 1000 // rate
    return pa.table(
        {
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "byte_len": pa.array(blen),
            "width": pa.array(width),
            "height": pa.array(height),
            "duration_ms": pa.array(dur),
        }
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """FALLBACK decode for kinds with no pure-python codec in this
    sandbox (compressed video): deterministic fake 'decoded' array
    derived from the bytes. image/audio kinds use the REAL BMP/WAV
    decoders above."""
    if payload is None:
        raise NotImplementedError("real decoder required for null-payload handling")
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: 64 * 64].astype(np.float32) / 255.0


class DecodeFeatureStage:
    """Actor-pool stage: REAL decode (BMP pixels / WAV samples) →
    fixed-length feature vector + exact-integer decode statistics.

    ``__init__`` is where the model/projection is loaded once per actor;
    ``__call__`` processes one Arrow batch. Output layout: input
    metadata columns + ``feat`` (list<float32>) + ``feat_norm`` +
    ``decode_checksum``/``decode_peak`` (int64 — image: Σ pixel bytes /
    max pixel; audio: Σ|sample| / max|sample| — exact on both engines,
    so the DuckDB oracle hash-gates the full encode→decode round trip).
    Unknown kinds fall back to ``_decode_stub``.
    """

    FEAT_DIM = 16
    WINDOW = 64 * 64

    def __init__(self):
        # real pipeline: self.model = load_model(...); here: fixed projection
        rng = np.random.default_rng(4242)
        self.proj = rng.standard_normal((self.WINDOW, self.FEAT_DIM)).astype(np.float32)

    def _decode(self, payload: bytes, kind: str) -> tuple[np.ndarray, int, int]:
        """→ (float window in [-1, 1], checksum, peak) per media row."""
        if kind == "image":
            px = decode_bmp(payload).reshape(-1).astype(np.int64)
            return px.astype(np.float32) / 255.0, int(px.sum()), int(px.max())
        if kind == "audio":
            _, s = decode_wav(payload)
            a = np.abs(s.astype(np.int64))
            return s.astype(np.float32) / 32768.0, int(a.sum()), int(a.max())
        dec = _decode_stub(payload, kind)
        arr = np.frombuffer(payload, dtype=np.uint8)[: self.WINDOW]
        return dec, int(arr.sum(dtype=np.int64)), int(arr.max()) if len(arr) else 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        n = len(payloads)
        feats = np.zeros((n, self.FEAT_DIM), dtype=np.float32)
        checksums = np.zeros(n, dtype=np.int64)
        peaks = np.zeros(n, dtype=np.int64)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            dec, checksums[i], peaks[i] = self._decode(p, k)
            padded = np.zeros(self.WINDOW, dtype=np.float32)
            padded[: min(len(dec), self.WINDOW)] = dec[: self.WINDOW]
            feats[i] = padded @ self.proj
        norms = np.linalg.norm(feats, axis=1)
        out = batch.drop_columns(["payload"])  # features replace heavy bytes
        out = out.append_column("feat", pa.array(list(feats), pa.list_(pa.float32(), self.FEAT_DIM)))
        out = out.append_column("feat_norm", pa.array(np.round(norms, 4).astype(np.float64)))
        out = out.append_column("decode_checksum", pa.array(checksums))
        out = out.append_column("decode_peak", pa.array(peaks))
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
    utf-8 text bytes as the opaque payload (deterministic stand-in).
    kind='blob' routes decode through the ``_decode_stub`` fallback —
    real containers come from :func:`synthesize_media`."""
    text = batch.column("text").to_pandas()
    payload = [(t or "").encode("utf-8") for t in text]
    n = batch.num_rows
    return pa.table(
        {
            "media_id": batch.column("doc_id").cast(pa.int64()),
            "kind": pa.array(["blob"] * n, pa.string()),
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


class ThumbnailStage:
    """Actor-pool RESIZE stage: decode BMP → nearest-neighbor 16×16 →
    4×4 RGB thumbnail → exact-integer thumbnail statistics. The resize
    index maps are built once per actor in ``__init__``; ``__call__``
    processes one Arrow batch and DROPS the payload column so the wide
    bytes never outlive the stage. Statistics are position-weighted
    (Σ (pos+1)·byte) so a transposed / mis-strided resize cannot pass.
    Audio rows pass through untouched by design (image-only op)."""

    OUT_W = OUT_H = 4

    def __init__(self, src_w: int = _IMG_W, src_h: int = _IMG_H):
        sy = (np.arange(self.OUT_H) * src_h) // self.OUT_H
        sx = (np.arange(self.OUT_W) * src_w) // self.OUT_W
        self.sy, self.sx = sy, sx

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        out = {"media_id": [], "thumb_checksum": [],
               "mean_r_milli": [], "mean_g_milli": [], "mean_b_milli": []}
        for mid, p, k in zip(ids, payloads, kinds):
            if k != "image":
                continue
            img = decode_bmp(p)
            thumb = img[self.sy][:, self.sx, :].astype(np.int64)
            flat = thumb.reshape(-1)
            npx = self.OUT_W * self.OUT_H
            out["media_id"].append(int(mid))
            out["thumb_checksum"].append(
                int(((np.arange(len(flat)) + 1) * flat).sum()))
            for c, name in enumerate(("mean_r_milli", "mean_g_milli",
                                      "mean_b_milli")):
                out[name].append(int(1000 * int(thumb[:, :, c].sum()))
                                 // npx)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "thumb_checksum": pa.array(out["thumb_checksum"], pa.int64()),
            "mean_r_milli": pa.array(out["mean_r_milli"], pa.int64()),
            "mean_g_milli": pa.array(out["mean_g_milli"], pa.int64()),
            "mean_b_milli": pa.array(out["mean_b_milli"], pa.int64()),
        })


class DecimateStage:
    """Actor-pool audio RESAMPLE stage: decode WAV → 2:1 decimation with
    exact pair averaging (out[i] = trunc((s[2i] + s[2i+1]) / 2), the
    anti-aliasing box filter in integer form) → exact statistics.
    Truncation (not floor) mirrors DuckDB ``//`` on negative samples.
    Image rows pass through untouched (audio-only op)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        out = {"media_id": [], "n_out": [], "out_checksum": [],
               "out_peak": []}
        for mid, p, k in zip(ids, payloads, kinds):
            if k != "audio":
                continue
            rate, s = decode_wav(p)
            s = s.astype(np.int64)
            n2 = len(s) // 2
            pair = s[: 2 * n2].reshape(n2, 2).sum(axis=1)
            q = np.abs(pair) // 2
            dec = np.where(pair < 0, -q, q)
            out["media_id"].append(int(mid))
            out["n_out"].append(int(n2))
            out["out_checksum"].append(
                int(((np.arange(n2) + 1) * dec).sum()))
            out["out_peak"].append(int(np.abs(dec).max()) if n2 else 0)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "n_out": pa.array(out["n_out"], pa.int64()),
            "out_checksum": pa.array(out["out_checksum"], pa.int64()),
            "out_peak": pa.array(out["out_peak"], pa.int64()),
        })
