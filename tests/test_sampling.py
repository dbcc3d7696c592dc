"""Deterministic hash sampling (ops/sampling)."""

import pyarrow as pa

import ray.data


def _docs(n=2000):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
    })).repartition(8)


def test_hash_sample_deterministic_and_fractional(ray_session):
    from logagent_js_ray.ops.sampling import hash_sample
    a = sorted(hash_sample(_docs(), "doc_id", fraction=0.3)
               .to_pandas()["doc_id"])
    b = sorted(hash_sample(_docs(), "doc_id", fraction=0.3)
               .to_pandas()["doc_id"])
    assert a == b  # rerun-identical (partitioning-independent)
    assert 0.25 < len(a) / 2000 < 0.35
    # different seed -> different subset
    c = sorted(hash_sample(_docs(), "doc_id", fraction=0.3, seed=7)
               .to_pandas()["doc_id"])
    assert c != a


def test_hash_sample_monotone_in_fraction(ray_session):
    from logagent_js_ray.ops.sampling import hash_sample
    small = set(hash_sample(_docs(), "doc_id", fraction=0.1)
                .to_pandas()["doc_id"])
    big = set(hash_sample(_docs(), "doc_id", fraction=0.25)
              .to_pandas()["doc_id"])
    assert small <= big  # ablation-ladder property


def test_hash_sample_stratified(ray_session):
    from logagent_js_ray.ops.sampling import hash_sample
    out = hash_sample(_docs(), "doc_id", strata_col="source",
                      strata_fractions={"s0": 1.0, "s1": 0.0},
                      default_fraction=0.5).to_pandas()
    by = out.groupby("source").size().to_dict()
    assert by["s0"] == 500       # fraction 1.0 keeps all
    assert "s1" not in by        # fraction 0.0 keeps none
    assert 200 < by["s2"] < 300  # default 0.5 of 500


def test_fraction_threshold_edges():
    import pytest
    from logagent_js_ray.ops.sampling import fraction_threshold
    assert fraction_threshold(0.0) == "0" * 32
    assert fraction_threshold(0.5) == "8" + "0" * 31
    with pytest.raises(ValueError):
        fraction_threshold(1.5)
