"""Deterministic synthetic change-event generator (FIXTURES.md §2).

Builds a *true per-key history* over a source-code-repo key space
``(repo, path)`` — Zipf-ish repo skew so one hot repo holds ~20% of keys,
mirroring the density skew the reference balances with its KD-tree
partitioner (``etl/partition_builder/02_kd_tree_construction.sql``) —
then derives the *recorded* log from it with seeded perturbations:

- ``inorder``  : recorded order == commit order
- ``dup``      : p≈0.05 events duplicated verbatim at a later seq
- ``ooo``      : events shuffled within a sliding window of w seq positions
- ``delete``   : ~10% of keys end with a tombstone D; ~30% of those revived
- ``evolve``   : events after a split point carry an additive column
                 ``meta_owner`` (files before the split are written
                 WITHOUT the column — real Arrow schema-evolution path)
- ``mixed``    : all of the above

Everything is deterministic in (seed, n_keys): same args → byte-identical
log. No wall-clock, no external data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from etl_ray.schema import OP_DELETE, OP_INSERT, OP_UPDATE

_LANGS = np.array(["py", "rs", "go", "js", "md", "toml", "c", "java"])
_EXTS = {b: b for b in _LANGS}

_FILLER_POOL_SIZE = 257  # prime; pool of reusable filler strings


@dataclass
class Scenario:
    duplicates: bool = False
    out_of_order: bool = False
    deletes: bool = False
    evolve: bool = False
    #: append malformed COPIES of real rows (blank repo/path, op 'X',
    #: null commit_seq — the four DLQ reason codes). Copies, not
    #: corruptions: the valid history is untouched, so the final lake
    #: state is byte-identical to the same seed without ``invalid`` —
    #: pinned by tests/test_dlq.py.
    invalid: bool = False
    invalid_p: float = 0.01
    dup_p: float = 0.05
    ooo_window: int = 100
    delete_key_frac: float = 0.10
    revive_frac: float = 0.30
    evolve_frac: float = 0.60  # fraction of the log after which meta_owner appears

    @classmethod
    def named(cls, name: str) -> "Scenario":
        if name == "inorder":
            return cls()
        if name == "dup":
            return cls(duplicates=True)
        if name == "ooo":
            return cls(out_of_order=True)
        if name == "delete":
            return cls(deletes=True)
        if name == "evolve":
            return cls(evolve=True)
        if name == "invalid":
            return cls(invalid=True)
        if name == "mixed":
            return cls(duplicates=True, out_of_order=True, deletes=True, evolve=True)
        if name == "mixed-dirty":
            # mixed + malformed events; kept out of plain "mixed" so the
            # bench stream stays byte-identical round over round
            return cls(duplicates=True, out_of_order=True, deletes=True,
                       evolve=True, invalid=True)
        raise ValueError(f"unknown scenario {name!r}")


@dataclass
class EventLog:
    """A generated recorded log plus its metadata."""

    table: pa.Table            # full log incl. meta_owner when evolve is on
    evolve_split_seq: int | None   # events with seq >= this carry meta_owner
    n_keys: int
    seed: int
    scenario: Scenario = field(repr=False, default_factory=Scenario)


def _filler_pool(rng: np.random.Generator, content_len: int) -> np.ndarray:
    """Pool of deterministic filler strings reused across rows."""
    alphabet = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789{}();=+-*/#\n",
        dtype=np.uint8,
    )
    lens = rng.integers(max(8, content_len // 2), content_len + 1, size=_FILLER_POOL_SIZE)
    return np.array(
        ["".join(chr(c) for c in rng.choice(alphabet, size=n)) for n in lens],
        dtype=object,
    )


def generate_events(
    n_keys: int = 1000,
    seed: int = 42,
    scenario: Scenario | str = "inorder",
    mean_versions: float = 3.0,
    content_len: int = 256,
) -> EventLog:
    """Generate the recorded change log. Deterministic in all arguments."""
    if isinstance(scenario, str):
        scenario = Scenario.named(scenario)
    rng = np.random.default_rng(seed)

    # --- key space with repo skew ------------------------------------------
    n_repos = max(4, int(np.sqrt(n_keys)))
    repo_idx = rng.integers(0, n_repos, size=n_keys)
    hot = rng.random(n_keys) < 0.20
    repo_idx[hot] = 0  # one hot repo holds ~20% of keys
    lang_idx = rng.integers(0, len(_LANGS), size=n_keys)
    dirs = rng.integers(0, 97, size=n_keys)
    repos = np.array([f"org{r % 13}/repo{r}" for r in repo_idx], dtype=object)
    key_ids = np.arange(n_keys)
    paths = np.array(
        [f"src/m{d}/f{k}.{_LANGS[li]}" for d, k, li in zip(dirs, key_ids, lang_idx)],
        dtype=object,
    )
    langs = _LANGS[lang_idx].astype(object)

    # --- versions per key (geometric-ish, clipped) -------------------------
    n_versions = np.clip(rng.geometric(1.0 / mean_versions, size=n_keys), 1, 12)
    total = int(n_versions.sum())

    key_of_row = np.repeat(np.arange(n_keys), n_versions)
    ver_of_row = np.concatenate([np.arange(k) for k in n_versions]) if total else np.array([], int)

    # --- tombstones + revivals --------------------------------------------
    ops = np.where(ver_of_row == 0, OP_INSERT, OP_UPDATE).astype(object)
    if scenario.deletes:
        del_keys = rng.random(n_keys) < scenario.delete_key_frac
        revive = del_keys & (rng.random(n_keys) < scenario.revive_frac)
        extra_key, extra_ver, extra_op = [], [], []
        for k in np.nonzero(del_keys)[0]:
            v = int(n_versions[k])
            extra_key.append(k); extra_ver.append(v); extra_op.append(OP_DELETE)
            if revive[k]:
                extra_key.append(k); extra_ver.append(v + 1); extra_op.append(OP_INSERT)
        if extra_key:
            key_of_row = np.concatenate([key_of_row, np.array(extra_key)])
            ver_of_row = np.concatenate([ver_of_row, np.array(extra_ver)])
            ops = np.concatenate([ops, np.array(extra_op, dtype=object)])
            total = len(key_of_row)
            order = np.lexsort((ver_of_row, key_of_row))
            key_of_row, ver_of_row, ops = key_of_row[order], ver_of_row[order], ops[order]

    # --- global commit ordering, monotone per key ---------------------------
    # Draw one uniform per row; sort the draws *within each key* so version v
    # gets the v-th smallest draw; the global rank of the draw is commit_seq.
    # Rows are laid out key-major / version-ascending, and
    # lexsort((u, key)) yields the same key-major grouping with u ascending
    # inside each key, so the positional assignment below aligns the v-th
    # smallest draw of key k with version v of key k.
    u = rng.random(total)
    u_assigned = u[np.lexsort((u, key_of_row))]
    commit_seq = np.empty(total, dtype=np.int64)
    commit_seq[np.argsort(u_assigned, kind="stable")] = np.arange(total)

    # --- payload ------------------------------------------------------------
    repo_col = repos[key_of_row]
    path_col = paths[key_of_row]
    lang_col = langs[key_of_row]
    h = (
        (key_of_row.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ^ (ver_of_row.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        ^ np.uint64(seed)
    )
    h2 = (h ^ (h >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
    commit_col = np.char.mod("%016x", h).astype(object) + np.char.mod(
        "%016x", h2
    ).astype(object) + np.char.mod("%08x", (h2 >> np.uint64(32)).astype(np.uint32)).astype(object)

    pool = _filler_pool(rng, content_len)
    filler = pool[(h % np.uint64(_FILLER_POOL_SIZE)).astype(np.int64)]
    head = np.array(
        [f"{r}:{p}:v{v}|" for r, p, v in zip(repo_col, path_col, ver_of_row)],
        dtype=object,
    )
    content_col = head + filler
    is_delete = ops == OP_DELETE
    content_col[is_delete] = ""  # deletes carry no content (but keep a commit id)

    # --- recorded order (perturbations) ------------------------------------
    pos = commit_seq.astype(np.float64)
    if scenario.out_of_order:
        pos = pos + rng.uniform(0, scenario.ooo_window, size=total)

    cols = {
        "op": ops,
        "commit_seq": commit_seq,
        "repo": repo_col,
        "path": path_col,
        "commit": commit_col,
        "lang": lang_col,
        "content": content_col,
    }
    if scenario.duplicates:
        dup_mask = rng.random(total) < scenario.dup_p
        dup_pos = pos[dup_mask] + rng.uniform(1, 500, size=int(dup_mask.sum()))
        pos = np.concatenate([pos, dup_pos])
        for k in cols:
            cols[k] = np.concatenate([cols[k], cols[k][dup_mask]])

    if scenario.invalid:
        n_bad = int(round(len(pos) * scenario.invalid_p))
        if n_bad:
            pick = rng.integers(0, len(pos), size=n_bad)
            bad_pos = pos[pick] + rng.uniform(1, 500, size=n_bad)
            kind = rng.integers(0, 4, size=n_bad)
            bad = {k: cols[k][pick].copy() for k in cols}
            bad["repo"][kind == 0] = ""
            bad["path"][kind == 1] = ""
            bad["op"][kind == 2] = "X"
            cs = bad["commit_seq"].astype(object)
            cs[kind == 3] = None
            bad["commit_seq"] = cs
            pos = np.concatenate([pos, bad_pos])
            for k in cols:
                cols[k] = np.concatenate([cols[k], bad[k]])

    order = np.argsort(pos, kind="stable")
    n_total = len(order)
    seq = np.arange(n_total, dtype=np.int64)
    arrays = {"seq": pa.array(seq)}
    for k, v in cols.items():
        vv = v[order]
        arrays[k] = pa.array(vv, type=pa.int64() if k == "commit_seq" else pa.string())

    evolve_split_seq = None
    if scenario.evolve:
        evolve_split_seq = int(n_total * scenario.evolve_frac)
        owner = np.array(
            [
                # blank repo = an injected invalid row (scenario.invalid);
                # it never applies, so its owner can stay null
                f"owner{int(r.split('repo')[-1]) % 5}" if r else None
                for r in cols["repo"][order]
            ],
            dtype=object,
        )
        owner[: evolve_split_seq] = None
        arrays["meta_owner"] = pa.array(owner, type=pa.string())

    table = pa.table(arrays)
    return EventLog(table=table, evolve_split_seq=evolve_split_seq, n_keys=n_keys, seed=seed, scenario=scenario)


def write_event_log(log: EventLog, out_dir: str, n_files: int = 4) -> list[str]:
    """Write the recorded log as ``n_files`` seq-ordered parquet files.

    With an evolve split, files entirely before the split are written
    WITHOUT the ``meta_owner`` column — the reader must unify schemas
    (the real Arrow schema-evolution path, SURVEY.md §1.3).
    """
    os.makedirs(out_dir, exist_ok=True)
    n = log.table.num_rows
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    if log.evolve_split_seq is not None:
        # make the split a file boundary so pre-split files can drop the column
        bounds = np.unique(np.append(bounds, log.evolve_split_seq))
    paths = []
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        chunk = log.table.slice(lo, hi - lo)
        if log.evolve_split_seq is not None and hi <= log.evolve_split_seq:
            chunk = chunk.drop_columns(["meta_owner"])
        p = os.path.join(out_dir, f"events-{i:05d}.parquet")
        pq.write_table(chunk, p)
        paths.append(p)
    return paths
