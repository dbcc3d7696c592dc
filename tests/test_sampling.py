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


def test_apportion_budget_exact():
    from logagent_js_ray.ops.sampling import apportion_budget
    # 100 over 3:2:1 -> base 50/33/16 (sum 99), largest remainder +1
    a = apportion_budget({"x": 3, "y": 2, "z": 1}, 100)
    assert sum(a.values()) == 100
    assert a["x"] == 50 and a["y"] + a["z"] == 50
    # remainder tie broken by name ascending
    b = apportion_budget({"b": 1, "a": 1}, 3)
    assert b == {"a": 2, "b": 1}
    assert apportion_budget({"a": 0, "b": 0}, 10) == {"a": 0, "b": 0}
    assert apportion_budget({"a": 5}, 0) == {"a": 0}


def test_domain_mixture_distributed(ray_session):
    import ray.data
    from logagent_js_ray.ops.sampling import domain_mixture
    rows = []
    for i in range(30):
        rows.append({"source": f"s{i % 3}",
                     "text": " ".join(["w"] * (i % 3 + 1))})
    out = domain_mixture(ray.data.from_items(rows), budget=1000)
    assert out["alloc"].sum() == 1000
    toks = dict(zip(out["source"], out["tokens"]))
    assert toks == {"s0": 10, "s1": 20, "s2": 30}
    # proportionality within 1 of the real share
    for r in out.itertuples():
        assert abs(r.alloc - 1000 * r.tokens / 60) <= 1
