"""DuckDB-compatible rounding (half away from zero).

numpy/pandas ``round`` is half-to-even; DuckDB ``round()`` is half away
from zero computed on the scaled double. Every float the query surface
emits is rounded with THIS helper so value-hash comparison against the
DuckDB oracle is stable at .5 boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def round_half_away(x, ndigits: int):
    """Vectorized round-half-away-from-zero matching DuckDB semantics:
    ``sign(x) * floor(|x| * 10^n + 0.5) / 10^n`` on doubles."""
    scale = 10.0 ** ndigits
    if isinstance(x, pd.Series):
        a = x.to_numpy(dtype=np.float64, copy=True)
        out = np.copysign(np.floor(np.abs(a) * scale + 0.5), a) / scale
        return pd.Series(out, index=x.index, name=x.name)
    a = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(a) * scale + 0.5), a) / scale
