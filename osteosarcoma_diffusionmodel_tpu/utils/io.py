"""Fast host-side table I/O.

CSV is the pipeline's interchange format (artifact parity with the
reference); at 10k-cohort scale pandas' default C parser/writer becomes
the validate-step bottleneck, so reads go through the pyarrow engine
when available and floats are written with a compact significant-digit
format.
"""

from __future__ import annotations

import os
from pathlib import Path

import pandas as pd

try:
    import pyarrow  # noqa: F401

    _HAS_PYARROW = True
except ImportError:  # pragma: no cover
    _HAS_PYARROW = False

FLOAT_FORMAT = "%.6g"


def read_matrix_csv(path: str | Path, index_col: int | None = 0) -> pd.DataFrame:
    """Read a (samples x features) CSV, pyarrow-accelerated when possible."""
    if _HAS_PYARROW:
        try:
            df = pd.read_csv(path, engine="pyarrow")
            if index_col is not None:
                df = df.set_index(df.columns[index_col])
                df.index.name = None
            return df
        except (ValueError, TypeError):
            pass
    return pd.read_csv(path, index_col=index_col)


def write_matrix_csv(
    df: pd.DataFrame, path: str | Path, index: bool = True
) -> None:
    """Write with compact float formatting (~40% smaller at f32 data)."""
    df.to_csv(path, index=index, float_format=FLOAT_FORMAT)


def env_flag(name: str, default: bool = False) -> bool:
    """Boolean env knob: '' / '0' / 'false' / 'no' / 'off' are OFF.

    Bare truthiness (`bool(os.environ.get(...))`) silently turns a
    knob ON for `NAME=0` or `NAME=false` — a driver writing `SLA_AR=0`
    must get the default preset, not the AR one.
    """
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() not in ("", "0", "false", "no", "off")
