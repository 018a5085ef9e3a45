"""Fingerprint-keyed query-result cache — warehouse-style semantic
caching: a result is valid exactly as long as its INPUTS are unchanged,
so the cache key is a content fingerprint of the input files (or the
lake's manifest pointer), never a TTL.

Reference analog: the reference persists benchmark results keyed by an
explicit run configuration (``etl/init/sql/80_benchmark_results.sql``);
here the key is derived from the data itself so invalidation is
automatic. Opt-in API — the correctness gates must never read a cache.

Scale shape: the fingerprint reads file METADATA only (name, size,
mtime) plus the manifest pointer when present; results live as parquet
next to a small meta JSON, safe to wipe at any time.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq


def dir_fingerprint(path: str) -> str:
    """Content fingerprint of a data directory: sorted (relname, size,
    mtime_ns) triples, plus the verbatim MANIFEST.json when the
    directory is a lake (the pointer IS the lake's version)."""
    h = hashlib.sha256()
    manifest = os.path.join(path, "MANIFEST.json")
    if os.path.exists(manifest):
        with open(manifest, "rb") as f:
            h.update(f.read())
        return h.hexdigest()[:32]
    for root, _dirs, files in sorted(os.walk(path)):
        for name in sorted(files):
            p = os.path.join(root, name)
            st = os.stat(p)
            rel = os.path.relpath(p, path)
            h.update(f"{rel}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:32]


class ResultCache:
    """get_or_compute(name, inputs, fn) → pa.Table, recomputing only
    when any input directory's fingerprint changed."""

    def __init__(self, cache_dir: str):
        self.dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        safe = hashlib.sha256(name.encode()).hexdigest()[:16]
        base = os.path.join(self.dir, f"{name[:48]}-{safe}")
        return f"{base}.parquet", f"{base}.meta.json"

    def get_or_compute(
        self,
        name: str,
        inputs: list[str],
        fn: Callable[[], pa.Table],
    ) -> tuple[pa.Table, bool]:
        """Returns (result, was_hit). ``inputs`` are directories whose
        fingerprints gate validity."""
        fp = {p: dir_fingerprint(p) for p in inputs}
        data_p, meta_p = self._paths(name)
        if os.path.exists(data_p) and os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            if meta.get("fingerprints") == fp:
                return pq.read_table(data_p), True
        result = fn()
        if not isinstance(result, pa.Table):
            raise TypeError("ResultCache caches pyarrow Tables")
        tmp = data_p + ".tmp"
        pq.write_table(result, tmp)
        os.replace(tmp, data_p)
        with open(meta_p + ".tmp", "w") as f:
            json.dump({"fingerprints": fp, "name": name}, f)
        os.replace(meta_p + ".tmp", meta_p)
        return result, False

    def invalidate(self, name: str) -> bool:
        data_p, meta_p = self._paths(name)
        hit = os.path.exists(data_p)
        for p in (data_p, meta_p):
            if os.path.exists(p):
                os.unlink(p)
        return hit
