"""Half-away-from-zero rounding, matching DuckDB/ANSI ``round(x, d)``.

``np.round`` / pandas ``.round`` use banker's rounding (round-half-even);
DuckDB rounds half away from zero (``std::round(value * 10^d) / 10^d``).
Every float column that is value-hash-compared against a DuckDB oracle must
round with THIS helper so values landing exactly on a half boundary
(e.g. 0.4440625 at 6 decimals) agree byte-for-byte.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int):
    """Vectorized round-half-away-from-zero. Mirrors DuckDB's
    ``std::round(x * 10^d) / 10^d`` for finite doubles."""
    a = np.asarray(x, dtype=np.float64)
    p = 10.0 ** decimals
    scaled = a * p
    out = np.copysign(np.floor(np.abs(scaled) + 0.5), scaled) / p
    # preserve NaN/inf untouched (floor/copysign already do, but be explicit)
    return np.where(np.isfinite(scaled), out, a)


def series_round_half_away(s, decimals: int):
    """pandas Series version (keeps the index)."""
    import pandas as pd

    return pd.Series(round_half_away(s.to_numpy(dtype=np.float64), decimals),
                     index=s.index, name=s.name)
