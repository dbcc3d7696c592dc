"""Shared numeric helpers for the training-data operators."""

from __future__ import annotations

import numpy as np


def e6_round_half_away(x) -> np.ndarray:
    """Micro-scale to int64 with SQL ``round()`` semantics (half AWAY
    from zero). THE canonical implementation — np.rint's half-to-even
    hash-mismatches DuckDB on exact-.5 values, and the rounding rule is
    load-bearing for oracle parity, so queries, the fixture feature
    oracle and the dedup threshold all share this one function."""
    v = np.asarray(x, np.float64) * 1e6
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
