"""Ray-independent scaling bound: run the fused per-row kernel
(pipelines/fused.FlagshipStage) in N vs 4N plain OS processes on the
same in-memory batch and report throughput at both.

This isolates the MACHINE's ceiling (memory bandwidth, cache) from
Ray's scheduling/object-store costs and from neighbor-load-induced
variance in full pipeline runs: if the bare kernel scales at e, no Ray
pipeline on this box can beat e, and a Ray efficiency close to e means
the orchestration overhead is amortized (numbers in BASELINE.md).

Usage: PYTHONPATH=/root/repo python tools/mp_scaling.py [N] [seconds]
Prints one JSON line: {"tps_n": ..., "tps_4n": ..., "efficiency": ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(dur: float, start_at: float, out):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from logagent_js_ray.fixtures.gen import (ensure_tool_catalog,
                                              ensure_transcripts)
    from logagent_js_ray.pipelines.flagship import (DEFAULT_MASK,
                                                    DEFAULT_ROUTES)
    from logagent_js_ray.pipelines.fused import FlagshipStage
    fdir = ensure_transcripts("sf0.01")
    part = sorted(f for f in os.listdir(fdir) if f.endswith(".parquet"))[0]
    batch = pq.read_table(os.path.join(fdir, part))
    lookup = pq.read_table(ensure_tool_catalog())
    stage = FlagshipStage(lookup, DEFAULT_MASK, DEFAULT_ROUTES)
    stage(batch.slice(0, 1024))  # warm (compile regexes, JIT caches)
    while time.time() < start_at:  # all workers start together
        time.sleep(0.005)
    rows = 0
    t0 = time.time()
    while time.time() - t0 < dur:
        stage(batch)
        rows += batch.num_rows
    out.put(rows / (time.time() - t0))


def run_at(nproc: int, dur: float) -> float:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    start_at = time.time() + 3 + nproc * 0.4  # cover spawn+import skew
    procs = [ctx.Process(target=_worker, args=(dur, start_at, q))
             for _ in range(nproc)]
    for p in procs:
        p.start()
    tps = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return tps


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    tps_n = run_at(n, dur)
    time.sleep(3)
    tps_4n = run_at(4 * n, dur)
    print(json.dumps({
        "kernel": "fused prep|parse|mask|enrich|route (no Ray)",
        "n_procs": n, "tps_n": round(tps_n),
        "tps_4n": round(tps_4n),
        "efficiency": round(tps_4n / tps_n / 4, 3),
    }))
