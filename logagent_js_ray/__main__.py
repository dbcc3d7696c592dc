"""CLI — rebuild of ``bin/logagent.js``'s command line for batch runs.

    python -m logagent_js_ray --config config/examples/flagship.yml
    python -m logagent_js_ray --glob 'fixtures/sf0.001/transcripts' \
        --out /tmp/sinks [--resume] [--num-cpus 32]

Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="logagent_js_ray")
    ap.add_argument("--config", help="YAML pipeline config (configLoader analogue)")
    ap.add_argument("--glob", help="input parquet dir/file (files-input analogue)")
    ap.add_argument("--out", help="sink output directory")
    ap.add_argument("--patterns", action="append", default=[],
                    help="extra pattern YAML (prepended, like logagent -f)")
    ap.add_argument("--resume", action="store_true",
                    help="checkpointed per-fragment run (tail-pointer analogue)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    ap.add_argument("--show", type=int, default=0,
                    help="print N parsed rows (stdout plugin) and exit")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    # Session-owner executor tuning (mirrors bench.py; see BASELINE.md):
    # per-op resource reservation splits the CPU budget equally across a
    # linear chain's task operators, capping the heavy parse stage at
    # ~1/N of the cluster. Our chains' intermediates are tiny partials.
    if os.environ.get("GRAFT_OP_RESERVATION", "0") != "1":
        DataContext.get_current().op_resource_reservation_enabled = False

    from .pipelines.flagship import (DEFAULT_MASK, DEFAULT_ROUTES,
                                     build_routed, run_flagship)

    kwargs: dict = {}
    input_path = args.glob
    out_dir = args.out
    if args.config:
        from .config import load_config
        cfg = load_config(args.config)
        input_path = input_path or cfg.input_path
        out_dir = out_dir or cfg.out_dir
        kwargs.update(
            pattern_paths=(cfg.pattern_files + args.patterns) or None,
            mask=cfg.mask if cfg.mask is not None else DEFAULT_MASK,
            routes=cfg.routes or DEFAULT_ROUTES,
            drop_unmatched=cfg.drop_unmatched,
            tool_catalog=cfg.catalog,
            default_sink=cfg.default_sink,
            detect_severity=cfg.detect_severity,
            input_grep=cfg.grep or None,
            drop_events=cfg.drop_events or None,
            multiline=cfg.multiline,
            max_log_size=cfg.max_log_size,
            geoip=cfg.geoip,
        )
        if cfg.input_kind == "lines" and not args.glob:
            from .sources.transcripts import read_lines
            input_path = read_lines(cfg.input_path)
    elif args.patterns:
        kwargs["pattern_paths"] = args.patterns
    if not input_path:
        ap.error("need --glob or a config with input:")

    rc = 0
    try:
        if args.show:
            from .sinks.files import show
            ds = build_routed(input_path, **kwargs)
            print(show(ds, n=args.show))
        elif args.resume:
            if not out_dir:
                ap.error("--resume needs --out")
            if not isinstance(input_path, str):
                ap.error("--resume needs a parquet input path "
                         "(fragment checkpoints), not a lines input")
            from .state.manifest import run_checkpointed
            summary = run_checkpointed(input_path, out_dir, **kwargs)
            print(json.dumps(summary, default=str))
        else:
            res = run_flagship(input_path, out_dir=out_dir, **kwargs)
            stats = {
                "out_dir": res["out_dir"],
                "sinks": res["aggregates"]["by_role"]
                         .groupby("sink")["n"].sum().to_dict(),
            }
            if args.config and cfg.sql:
                # sql output-filter queries (sql.js config parity) run
                # over the written sinks (column-pruned read-back, the
                # cube pattern) — or the routed stream when no sink dir
                from .stages.sqlparse import run_sql
                import ray.data as rd
                src = (rd.read_parquet(out_dir) if out_dir
                       else build_routed(input_path, **kwargs))
                stats["sql"] = {
                    q: run_sql(src, q, approx_distinct=ad)
                    .to_pandas().to_dict("records")
                    for q, ad in cfg.sql}
            print(json.dumps(stats, default=str))
    finally:
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
