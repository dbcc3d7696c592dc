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


def test_sharded_cube_accumulator_equals_readback(ray_session, sf_small,
                                                  tool_catalog_path):
    """Sharded CubeAccumulator pool (round-4 verdict item #6): the
    accumulator-fed cube from a sharded pool must equal the read-back
    cube, with the partials genuinely split across shards."""
    import ray

    from logagent_js_ray.pipelines.flagship import (aggregate_cube,
                                                    build_routed)
    from logagent_js_ray.pipelines.fused import cube_pool, merged_cube
    accs = cube_pool(3)
    routed = build_routed(sf_small, tool_catalog=tool_catalog_path,
                          acc=accs)
    want = aggregate_cube(routed).to_pandas()  # consumes the pipeline
    got = merged_cube(accs)
    key = ["sink", "role", "tool", "time_bucket"]
    want = want.sort_values(key).reset_index(drop=True)[key +
                                                        ["n", "sum_size"]]
    got = got.sort_values(key).reset_index(drop=True)[key +
                                                      ["n", "sum_size"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    n_parts = ray.get([a.n_batches.remote() for a in accs])
    assert sum(n_parts) >= 2 and sum(1 for n in n_parts if n) >= 2


def test_cube_from_acc_equals_readback(ray_session, sf_small,
                                       tool_catalog_path, tmp_path,
                                       monkeypatch):
    """GRAFT_CUBE_FROM=acc (sink write + sharded-accumulator cube in ONE
    pass) must return the exact read-back cube."""
    from logagent_js_ray.pipelines.flagship import run_flagship
    key = ["sink", "role", "tool", "time_bucket"]
    a = run_flagship(sf_small, out_dir=str(tmp_path / "rb"),
                     tool_catalog=tool_catalog_path)["cube"]
    monkeypatch.setenv("GRAFT_CUBE_FROM", "acc")
    b = run_flagship(sf_small, out_dir=str(tmp_path / "acc"),
                     tool_catalog=tool_catalog_path)["cube"]
    a = a.sort_values(key).reset_index(drop=True)[key + ["n", "sum_size"]]
    b = b.sort_values(key).reset_index(drop=True)[key + ["n", "sum_size"]]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_task_mode_equals_actor_mode(ray_session, sf_small,
                                     tool_catalog_path, tmp_path):
    """Cached-task fused stage (round-5) must be row- and
    cube-identical to the actor-pool stage it replaces as the default;
    the actor path stays live as the GRAFT_FLAGSHIP_TASKS=0 fallback."""
    from logagent_js_ray.pipelines.flagship import build_routed, \
        run_flagship
    key = ["sink", "role", "tool", "time_bucket"]
    a = run_flagship(sf_small, out_dir=str(tmp_path / "t"),
                     tool_catalog=tool_catalog_path,
                     use_tasks=True)["cube"]
    b = run_flagship(sf_small, out_dir=str(tmp_path / "a"),
                     tool_catalog=tool_catalog_path,
                     use_tasks=False)["cube"]
    a = a.sort_values(key).reset_index(drop=True)[key + ["n", "sum_size"]]
    b = b.sort_values(key).reset_index(drop=True)[key + ["n", "sum_size"]]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    rows_t = build_routed(sf_small, tool_catalog=tool_catalog_path,
                          use_tasks=True).to_pandas()
    rows_a = build_routed(sf_small, tool_catalog=tool_catalog_path,
                          use_tasks=False).to_pandas()
    order = ["conv_id", "turn_idx"]
    rows_t = rows_t.sort_values(order).reset_index(drop=True)
    rows_a = rows_a.sort_values(order).reset_index(drop=True)
    pd.testing.assert_frame_equal(rows_t, rows_a[rows_t.columns])
