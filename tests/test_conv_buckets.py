"""conv_id hash-bucketing + sorted sink output (north-rule layout)."""

import glob

import pyarrow.dataset as pads
import zlib


def test_conv_bucket_layout(ray_session, sf_small, tool_catalog_path,
                            tmp_path):
    from logagent_js_ray.pipelines.flagship import run_flagship
    out = str(tmp_path / "bucketed")
    res = run_flagship(sf_small, out_dir=out, conv_buckets=8,
                       tool_catalog=tool_catalog_path)
    dirs = glob.glob(f"{out}/sink=*/conv_bucket=*")
    assert dirs, "expected nested sink/conv_bucket hive layout"
    ds = pads.dataset(out, partitioning="hive")
    tbl = ds.to_table(columns=["conv_id", "conv_bucket"])
    assert tbl.num_rows == 5000
    # every conversation's rows land in exactly its hash bucket
    for conv, bucket in zip(tbl["conv_id"].to_pylist()[:500],
                            tbl["conv_bucket"].to_pylist()[:500]):
        assert int(bucket) == zlib.crc32(conv.encode()) % 8
    # aggregates unaffected by the extra partition level
    assert res["aggregates"]["by_role"]["n"].sum() == 5000


def test_sorted_output(ray_session, sf_small, tool_catalog_path, tmp_path):
    from logagent_js_ray.pipelines.flagship import run_flagship
    out = str(tmp_path / "sorted")
    run_flagship(sf_small, out_dir=out, sort_output=True,
                 tool_catalog=tool_catalog_path)
    # within each written file, rows are (conv_id, turn_idx)-ordered
    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert files
    import pyarrow.parquet as pq
    f = pq.read_table(files[0], columns=["conv_id", "turn_idx"]).to_pandas()
    assert (f.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
            .equals(f.reset_index(drop=True)))
