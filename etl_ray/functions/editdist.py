"""Batch Levenshtein edit distance, vectorized across pairs.

The near-dup VERIFY kernel for character-level similarity (the
complement of the token-shingle Jaccard/containment verifies): unit-cost
edit distance between the two texts of each candidate pair, computed for
a whole batch of pairs at once with numpy — no per-pair Python DP.

The row-update trick: the classic DP row recurrence
``new[j] = min(old[j]+1, old[j-1]+cost_j, new[j-1]+1)`` has a serial
dependency in ``j``, but its closed form is a prefix minimum:
``new[j] = j + running_min(c[k] - k)`` for ``c = min(old+1,
shift(old)+cost)`` — one ``np.minimum.accumulate`` per row, so the whole
batch costs ``cap`` vectorized passes over a (pairs × cap) matrix
instead of pairs × cap² scalar steps.

Distances are over the first ``cap`` characters (byte-safe for ASCII;
callers strip/limit to ASCII for engine↔SQL parity since SQL
``levenshtein`` counts characters, not bytes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _pack(texts: pd.Series, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """(pairs × cap) uint8 matrix + true (clipped) lengths, no row loop."""
    s = texts.fillna("").str.slice(0, cap)
    lens = s.str.len().to_numpy(np.int64)
    padded = s.str.pad(width=cap, side="right", fillchar="\x00")
    buf = np.frombuffer("".join(padded.tolist()).encode("ascii"), np.uint8)
    return buf.reshape(len(s), cap), lens


def batch_levenshtein(
    texts_a: pd.Series, texts_b: pd.Series, cap: int = 64
) -> np.ndarray:
    """Edit distance between ``texts_a[i][:cap]`` and ``texts_b[i][:cap]``
    for every i, as int64. ASCII input required (callers' contract)."""
    if len(texts_a) == 0:
        return np.array([], dtype=np.int64)
    A, la = _pack(texts_a, cap)
    B, lb = _pack(texts_b, cap)
    P = A.shape[0]
    j = np.arange(cap + 1, dtype=np.int32)
    dp = np.broadcast_to(j, (P, cap + 1)).astype(np.int32).copy()
    c = np.empty((P, cap + 1), np.int32)
    for i in range(int(la.max()) if P else 0):
        cost = (A[:, i][:, None] != B).astype(np.int32)
        c[:, 0] = i + 1
        np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost, out=c[:, 1:])
        new = np.minimum.accumulate(c - j, axis=1) + j
        active = i < la
        dp[active] = new[active]
    return dp[np.arange(P), lb].astype(np.int64)
