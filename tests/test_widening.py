"""Schema-evolution TYPE WIDENING: a payload column reappearing wider.

Additive evolution (new columns) is covered in test_replay; here the
``meta_rev`` payload column arrives as int32 in window 1 and as int64
(with values above 2^32) in window 2 — the manifest's recorded type must
widen via the lossless lattice (schema.py:widen_type), window-1 partition
files stay narrow on disk and cast up at read, and incompatible
evolutions refuse loudly instead of truncating.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ray.generator import generate_events
from etl_ray.pipelines.replay import ReplayEngine
from etl_ray.schema import widen_type


def _write_two_windows(tmp_path, second_type, second_values):
    log = generate_events(n_keys=120, seed=4, scenario="inorder")
    t = log.table
    n = t.num_rows
    half = n // 2
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    f0 = t.slice(0, half).append_column(
        "meta_rev", pa.array(np.arange(half, dtype=np.int32))
    )
    f1 = t.slice(half).append_column(
        "meta_rev", pa.array(second_values, second_type)
    )
    pq.write_table(f0, str(log_dir / "events-00000.parquet"))
    pq.write_table(f1, str(log_dir / "events-00001.parquet"))
    return log, str(log_dir), half


def test_widen_int32_to_int64_across_windows(ray_session, tmp_path):
    n2 = generate_events(n_keys=120, seed=4, scenario="inorder").table.num_rows
    half = n2 // 2
    big = np.arange(n2 - half, dtype=np.int64) + (1 << 40)
    log, log_dir, half = _write_two_windows(tmp_path, pa.int64(), big)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(log_dir, window_events=half)
    assert eng.store.current().payload_types["meta_rev"] == "int64"
    df = eng.final_state().to_pandas()
    # keys last written in window 2 carry the wide values verbatim
    assert (df["meta_rev"].max()) >= (1 << 40)
    # keys last written in window 1 keep their narrow values, cast up
    assert (df["meta_rev"].min()) < (1 << 31)
    # oracle parity on the evolved column
    from etl_ray import oracle

    combined = pa.concat_tables(
        [
            pq.read_table(f"{log_dir}/events-00000.parquet"),
            pq.read_table(f"{log_dir}/events-00001.parquet"),
        ],
        promote_options="permissive",
    )
    res = oracle.reduce_events(combined)
    got = {(r["repo"], r["path"]): r["meta_rev"] for _, r in df.iterrows()}
    want = {k: v.get("meta_rev") for k, v in res.state.items()}
    assert got == {k: want[k] for k in got}


def test_widen_int32_to_float_records_double(ray_session, tmp_path):
    n2 = generate_events(n_keys=120, seed=4, scenario="inorder").table.num_rows
    vals = np.linspace(0.5, 9.5, n2 - n2 // 2)
    _, log_dir, half = _write_two_windows(tmp_path, pa.float32(), vals)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(log_dir, window_events=half)
    assert eng.store.current().payload_types["meta_rev"] == "double"


def test_incompatible_evolution_fails_loudly(ray_session, tmp_path):
    n2 = generate_events(n_keys=120, seed=4, scenario="inorder").table.num_rows
    strs = [f"v{i}" for i in range(n2 - n2 // 2)]
    _, log_dir, half = _write_two_windows(tmp_path, pa.string(), strs)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    with pytest.raises(ValueError, match="incompatible payload evolution"):
        eng.replay(log_dir, window_events=half)


def test_widen_lattice_is_commutative():
    for a, b in [
        (pa.int8(), pa.int64()),
        (pa.uint16(), pa.int32()),
        (pa.float32(), pa.int64()),
        (pa.uint8(), pa.uint64()),
    ]:
        assert widen_type(a, b).equals(widen_type(b, a))
