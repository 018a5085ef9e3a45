"""Pure-unit tests for the real BMP/WAV codecs (no Ray needed).

The DuckDB oracle verifies the encode→decode round trip end-to-end via
fmix32-derived content (queries multimodal_features / media_metadata);
these tests pin the codecs themselves on adversarial shapes the synth
path never hits: non-4-aligned BMP rows, top-down BMP, extra WAV chunks,
and malformed payloads.
"""

import numpy as np
import pytest

from etl_ray.functions import multimodal as M


def test_bmp_roundtrip_aligned():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_bmp(M.encode_bmp(px)), px)


def test_bmp_roundtrip_padded_rows():
    # width 5 → 15-byte rows, 1-byte pad per row: exercises stride math
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    payload = M.encode_bmp(px)
    assert len(payload) == 54 + 7 * 16
    assert np.array_equal(M.decode_bmp(payload), px)


def test_bmp_header_fields():
    px = np.zeros((4, 6, 3), dtype=np.uint8)
    payload = M.encode_bmp(px)
    assert payload[:2] == b"BM"
    import struct

    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    assert (off, w, h) == (54, 6, 4)


def test_bmp_top_down_negative_height():
    # hand-build a top-down BMP (negative height) and check orientation
    import struct

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    payload = bytearray(M.encode_bmp(px))
    struct.pack_into("<i", payload, 22, -2)           # declare top-down
    rows = px[::-1, :, ::-1].reshape(2, 6)            # encoder wrote bottom-up BGR
    got = M.decode_bmp(bytes(payload))
    # decoder must now read rows in stored order (top-down), BGR→RGB
    assert np.array_equal(got, rows.reshape(2, 2, 3)[:, :, ::-1])


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        M.decode_bmp(b"NOTABMP" + b"\x00" * 64)


def test_wav_roundtrip():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, size=301, dtype=np.int16)
    rate, got = M.decode_wav(M.encode_wav(s, rate=8000))
    assert rate == 8000
    assert np.array_equal(got, s)


def test_wav_skips_extra_chunks_and_odd_padding():
    import struct

    s = np.array([1, -2, 3], dtype=np.int16)
    base = M.encode_wav(s, rate=16000)
    # splice an odd-length LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    payload = base[:fmt_end] + extra + base[fmt_end:]
    payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
    rate, got = M.decode_wav(payload)
    assert rate == 16000
    assert np.array_equal(got, s)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFF\x00\x00\x00\x00META")


def test_synthesized_media_decodes_to_fmix32_content():
    import pyarrow as pa

    from etl_ray.functions.sketch import _fmix32

    batch = pa.table({"doc_id": pa.array([4, 7], pa.int64())})
    media = M.synthesize_media(batch)
    rows = media.to_pylist()
    img = M.decode_bmp(rows[0]["payload"]).reshape(-1)
    keys = (4 * 4096 + np.arange(768, dtype=np.int64)) % (1 << 32)
    assert np.array_equal(img, (_fmix32(keys.astype(np.uint64)) % 256).astype(np.uint8))
    rate, samples = M.decode_wav(rows[1]["payload"])
    keys = (7 * 4096 + 1024 + np.arange(256, dtype=np.int64)) % (1 << 32)
    want = (_fmix32(keys.astype(np.uint64)) % 65536).astype(np.int64) - 32768
    assert rate == 8000
    assert np.array_equal(samples.astype(np.int64), want)


def test_parse_media_meta_rederives_header_fields():
    import pyarrow as pa

    media = M.synthesize_media(pa.table({"doc_id": pa.array([2, 3], pa.int64())}))
    meta = M.parse_media_meta(media).to_pylist()
    assert meta[0] == {"media_id": 2, "kind": "image", "byte_len": 822,
                       "width": 16, "height": 16, "duration_ms": 0}
    assert meta[1] == {"media_id": 3, "kind": "audio", "byte_len": 556,
                       "width": 0, "height": 0, "duration_ms": 32}
