"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse -> mask -> enrich -> route pipeline
on the sf0.001-scale transcript fixture. ``queries()`` exposes one
callable per implemented operator/pipeline from SURVEY.md §2 plus the
training-data ops; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every exactly-checkable query (heuristic/approximate/stubbed ops are
intentionally rows-only).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in logagent_js_ray) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logagent_js_ray.fixtures.gen import ensure_transcripts  # noqa: E402
from logagent_js_ray.pipelines import queries as q  # noqa: E402


def entry() -> Any:
    """Flagship pipeline on the sf0.001-scale transcript fixture (small
    input -> small fixed actor pool; the CPU-sized pool is for real
    corpora)."""
    from logagent_js_ray.pipelines.flagship import build_routed
    # elastic pool (min 1): a FIXED pool of 4 actors starves the
    # downstream sort of CPU slots on a <=4-CPU session (observed
    # livelock at num_cpus=4); the driver runs larger sessions but the
    # entry point must not deadlock on small ones
    routed = build_routed(ensure_transcripts("sf0.001"), concurrency=(1, 4))
    return routed.sort(["conv_id", "turn_idx"])


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
