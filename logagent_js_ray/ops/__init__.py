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


def scorer_pool() -> tuple:
    """Autoscaling actor-pool bounds for stateful scorer stages,
    derived from the SESSION's CPUs (round-3 verdict item #6: a fixed
    ``(2, 8)`` cap left 3/4 of a 32-CPU box idle on the kNN row, while
    2 mandatory actors waste startup on tiny inputs). Min 1 keeps
    unions of several pools deadlock-free on small sessions
    (CLAUDE.md) and lets Ray skip spinning actors nobody needs; the
    max tracks the box."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return (1, max(8, cpus))


_BROADCAST_CACHE: dict = {}


def resolve_broadcast(ref, limit: int = 8):
    """Per-worker-process cache for ``ray.put`` broadcast artifacts
    resolved inside stateless map_batches tasks (the ops/similarity
    _SCORER_CACHE pattern, shared): one ``ray.get`` per worker process
    per ref, bounded memory via whole-cache clear when more than
    ``limit`` distinct refs accumulate."""
    import ray
    val = _BROADCAST_CACHE.get(ref)
    if val is None:
        if len(_BROADCAST_CACHE) > limit:
            _BROADCAST_CACHE.clear()
        val = ray.get(ref)
        _BROADCAST_CACHE[ref] = val
    return val
