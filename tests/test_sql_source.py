"""Incremental SQL source (watermark contract) + transform registration."""

import pyarrow as pa
import pytest


def test_sql_source_watermark(ray_session, tmp_path):
    from logagent_js_ray.sources.sql_source import Watermark, \
        read_sql_incremental
    wm = Watermark(str(tmp_path / "wm.txt"))
    q = ("SELECT event_id, ts FROM "
         "read_parquet('/root/testdata/sf0.001/events.parquet') "
         "WHERE ts > $QUERY_TIME ORDER BY ts")
    first = read_sql_incremental(q, wm)
    n1 = first.count()
    assert n1 == 1000  # everything is new on the first run
    second = read_sql_incremental(q, wm)
    assert second.count() == 0  # watermark advanced: nothing new
    # crash-safe file: re-reading gives the stored max ts
    assert wm.read().startswith("2024-")


def test_sql_source_distributed(ray_session, tmp_path):
    # real ray.data.read_sql over a duckdb FILE db: fetch happens in
    # worker tasks; watermark advances via a driver-side pushed-down max
    import duckdb

    from logagent_js_ray.sources.sql_source import (
        Watermark, read_sql_incremental_distributed)
    db = str(tmp_path / "events.duckdb")
    con = duckdb.connect(db)
    con.sql("CREATE TABLE ev AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/events.parquet')")
    con.close()
    wm = Watermark(str(tmp_path / "wm.txt"))
    q = "SELECT event_id, user_id, ts FROM ev WHERE ts > $QUERY_TIME"
    first = read_sql_incremental_distributed(q, wm, db)
    assert first.count() == 1000
    again = read_sql_incremental_distributed(q, wm, db)
    assert again.count() == 0
    assert wm.read().startswith("2024-")


def test_sql_source_distributed_sharded(ray_session, tmp_path):
    # hash-sharded read: N sub-queries, same union of rows
    import duckdb

    from logagent_js_ray.sources.sql_source import (
        Watermark, read_sql_incremental_distributed)
    db = str(tmp_path / "ev.duckdb")
    con = duckdb.connect(db)
    con.sql("CREATE TABLE ev AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/events.parquet')")
    con.close()
    wm = Watermark(str(tmp_path / "wm.txt"))
    q = "SELECT event_id, user_id, ts FROM ev WHERE ts > $QUERY_TIME"
    ds = read_sql_incremental_distributed(q, wm, db,
                                          shard_keys=["event_id"],
                                          num_blocks=4)
    got = sorted(r["event_id"] for r in ds.take_all())
    assert got == list(range(1000))


def test_register_transform():
    import pyarrow.compute as pc
    from logagent_js_ray.functions.transforms import (get_transform,
                                                      register_transform)

    def upper_msg(cols):
        cols["message"] = pc.utf8_upper(cols["message"])

    register_transform("upper_msg", upper_msg)
    cols = {"message": pa.array(["hi"])}
    get_transform("upper_msg")(cols)
    assert cols["message"][0].as_py() == "HI"
