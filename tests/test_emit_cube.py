"""emit='cube' aggregate-only pipeline must produce the exact same cube
as the sink-write + read-back path (no row data through the object
store vs full materialized sinks)."""

import pandas as pd


def test_emit_cube_equals_readback(ray_session, sf_small,
                                   tool_catalog_path, tmp_path):
    from logagent_js_ray.pipelines.flagship import run_flagship
    key = ["sink", "role", "tool", "time_bucket"]
    a = run_flagship(sf_small, out_dir=str(tmp_path / "s"),
                     tool_catalog=tool_catalog_path)["cube"]
    b = run_flagship(sf_small, out_dir=None,
                     tool_catalog=tool_catalog_path)["cube"]
    a = a.sort_values(key).reset_index(drop=True)[key + ["n", "sum_size"]]
    b = b.sort_values(key).reset_index(drop=True)[key + ["n", "sum_size"]]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert a["n"].sum() == 5000
