"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at a given sf and compare against ``oracle_sql()``
via DuckDB (row count + sorted-column value frame equality).

Usage: PYTHONPATH=/root/repo python tools/check_queries.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


_NULL = "\0<NULL>"  # sentinel no real string value can collide with


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # map nulls to one sentinel BEFORE stringifying: astype(str)
            # renders None as 'None' and NaN as 'nan', which both
            # mis-matched real nulls across engines AND collided with
            # genuine 'None' string values
            isna = df[c].isna()
            df[c] = df[c].astype(str)
            df.loc[isna, c] = _NULL
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "uint32", "int16"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# dtype families considered equivalent across the Ray/DuckDB boundary
# (the driver compares hashes of VALUES; this tool additionally flags
# dtype drift per the CLAUDE.md invariant, at family granularity so
# Int64-nullable vs int64 and us/ns timestamps don't false-alarm)
def _dtype_family(dt) -> str:
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("datetime64"):
        return "timestamp"
    if s == "bool" or s == "boolean":
        return "bool"
    return "object"


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            raw = to_pandas(fn(sf_dir))
            got = canon(raw)
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        try:
            raw_want = con.sql(oracles[name]).df()
            want = canon(raw_want)
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        # dtype-family check on the PRE-canon frames (CLAUDE.md: dtypes
        # must match DuckDB's) — canon coerces, so compare before it
        fam_mismatch = [
            c for c in sorted(set(raw.columns) & set(raw_want.columns))
            if _dtype_family(raw[c].dtype)
            != _dtype_family(raw_want[c].dtype)
            # an all-null object column has no observable family
            and not (raw[c].isna().all() or raw_want[c].isna().all())]
        if fam_mismatch:
            print(f"FAIL {name}: dtype mismatch "
                  + ", ".join(f"{c}: {raw[c].dtype} vs "
                              f"{raw_want[c].dtype}"
                              for c in fam_mismatch))
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows, {dt:.1f}s)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            diff = (got != want) & ~(got.isna() & want.isna())
            idx = diff.any(axis=1)
            if idx.any():
                print("got :", got[idx].head(3).to_string())
                print("want:", want[idx].head(3).to_string())
            failures += 1
    print(f"\n{len(qs) - failures}/{len(qs)} queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    # usage: check_queries.py [sf_dir] [--only name1,name2]
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    rc = main(sf, only=only)
    import ray
    ray.shutdown()
    sys.exit(rc)
