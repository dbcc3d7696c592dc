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
