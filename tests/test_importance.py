"""DSIR importance resampling (ops/importance.py) vs brute force and
the pinned fixture weight table."""

import hashlib
import math

import numpy as np

import ray.data

from logagent_js_ray.ops.importance import (BUCKETS, _grams,
                                            add_importance_weight,
                                            dsir_log_weights,
                                            dsir_select,
                                            hashed_gram_profile)


def brute_counts(texts) -> np.ndarray:
    out = np.zeros(BUCKETS, np.int64)
    for t in texts:
        w = t.split(" ")
        for g in w + [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]:
            out[int(hashlib.md5(g.encode()).hexdigest()[:3], 16)] += 1
    return out


TEXTS = ["the cat sat", "a dog ran fast", "the cat ran",
         "slow green turtle", "the the the"]


def test_grams_single_space_tokenizer():
    # double space yields an empty-string token, NOT collapsed (the
    # repo-wide oracle contract)
    assert _grams("a  b") == ["a", "", "b", "a ", " b"]


def test_profile_matches_brute_force(ray_session):
    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    got = hashed_gram_profile(ds)
    want = brute_counts(TEXTS)
    assert np.array_equal(got, want)


def test_log_weights_integer_formula():
    t = np.zeros(BUCKETS, np.int64)
    r = np.zeros(BUCKETS, np.int64)
    assert (dsir_log_weights(t, r) == 0).all()
    t[7] = 99
    r[7] = 99
    w = dsir_log_weights(t, r)
    # same counts, but target total < raw total only via smoothing: here
    # totals are equal too, so the bucket-7 ratio is exactly 1
    assert w[7] == 0
    t[3] = 50
    w = dsir_log_weights(t, r)
    assert w[3] > 0  # target-only gram mass -> positive log ratio
    want3 = round(1000 * (math.log(51) - math.log(149 + BUCKETS)
                          - math.log(1) + math.log(99 + BUCKETS)))
    assert w[3] == want3


def test_select_prefers_target_like_docs(ray_session):
    target_texts = ["alpha beta gamma delta"] * 3
    raw = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["alpha beta gamma delta", "zeta eta theta iota",
         "alpha beta mixed words", "totally unrelated stuff here",
         "gamma delta alpha beta", "more unrelated filler text",
         "beta gamma", "nothing in common at all"])]
    ds = ray.data.from_items(raw)
    tgt = ray.data.from_items([{"text": t} for t in target_texts])
    kept = dsir_select(ds, tgt, keep_denominator=4).to_pandas()
    assert len(kept) == 2
    # only docs made purely of target grams can win (doc 6 "beta gamma"
    # carries no negative raw-only gram, so it may outrank the longer
    # doc 4 that contains one); the unrelated docs must never surface
    assert set(kept.doc_id) <= {0, 4, 6}
    assert 0 in set(kept.doc_id)


def test_weights_match_pinned_fixture(ray_session):
    import pyarrow.parquet as pq
    from logagent_js_ray.fixtures.gen import ANN_PIN_SF_DIR, ensure_dsir
    import os
    fx = pq.read_table(os.path.join(ensure_dsir(), "weights.parquet"))
    ds = ray.data.read_parquet(
        os.path.join(ANN_PIN_SF_DIR, "documents.parquet"),
        columns=["text", "source"])
    live = dsir_log_weights(
        hashed_gram_profile(ds.filter(expr="source == 'src0'")),
        hashed_gram_profile(ds))
    assert np.array_equal(live, fx["w"].to_numpy())


def poly_hash(s: str) -> int:
    """Scalar reference for the vectorized span hash: standard Horner
    polynomial, first char at the highest power (the ops/substr
    formula reduces to this for any span)."""
    h = 0
    for ch in s:
        h = (h * 0x100000001B3 + ord(ch)) % (1 << 64)
    return h


def poly_bucket(g: str) -> int:
    return ((poly_hash(g) * 0x9E3779B97F4A7C15) % (1 << 64) >> 33) % BUCKETS


POLY_EDGE_TEXTS = ["the cat sat", "", "a  b", " leading", "trailing ",
                   "  ", "naïve café über-token 日本語 テスト", None,
                   "single", "the the the"]


def test_poly_gram_buckets_match_scalar():
    from logagent_js_ray.ops.importance import poly_gram_buckets
    texts = POLY_EDGE_TEXTS
    bucket, doc_ix = poly_gram_buckets(texts)
    # per-doc expected multiset of buckets from the scalar reference
    want: list[list[int]] = []
    for t in texts:
        want.append(sorted(poly_bucket(g) for g in _grams(t or "")))
    got: dict[int, list] = {i: [] for i in range(len(texts))}
    for b, d in zip(bucket.tolist(), doc_ix.tolist()):
        got[d].append(b)
    for i in range(len(texts)):
        assert sorted(got[i]) == want[i], f"doc {i}: {texts[i]!r}"


def test_poly_gram_buckets_empty_batch():
    from logagent_js_ray.ops.importance import poly_gram_buckets
    bucket, doc_ix = poly_gram_buckets([])
    assert bucket.shape == (0,) and doc_ix.shape == (0,)


def test_poly_profile_total_and_select(ray_session):
    """Poly mode preserves gram COUNTS (same grams, different buckets)
    and the end-to-end selection contract (exact top n//k)."""
    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in
                              enumerate(TEXTS)])
    md5_prof = hashed_gram_profile(ds)
    poly_prof = hashed_gram_profile(ds, hashed="poly")
    assert md5_prof.sum() == poly_prof.sum()  # same gram instances
    tgt = ray.data.from_items([{"text": "the cat sat"}] * 2)
    kept = dsir_select(ds, tgt, keep_denominator=4,
                       hashed="poly").to_pandas()
    assert len(kept) == len(TEXTS) // 4
    # cat docs dominate any target made of cat grams in either mode
    assert set(kept.doc_id) <= {0, 2, 4}


def test_poly_scoring_matches_manual_weights(ray_session):
    """score = sum over gram instances of w[bucket] — verified against
    the scalar poly reference on edge-case texts."""
    texts = [t for t in POLY_EDGE_TEXTS if t is not None]
    ds = ray.data.from_items([{"doc_id": i, "text": t}
                              for i, t in enumerate(texts)])
    rng = np.random.RandomState(7)
    w = rng.randint(-5000, 5000, BUCKETS).astype(np.int64)
    got = add_importance_weight(ds, w, hashed="poly").to_pandas() \
        .set_index("doc_id")["dsir_w"]
    for i, t in enumerate(texts):
        want = sum(int(w[poly_bucket(g)]) for g in _grams(t))
        assert got[i] == want, f"doc {i}: {t!r}"


def test_threshold_select_approximates_topk(ray_session):
    from logagent_js_ray.ops.importance import dsir_select_threshold
    rng_texts = []
    for i in range(80):
        # vary target-gram density so scores spread
        n_hits = i % 9
        words = ["alpha beta"] * n_hits + ["zz%d" % j for j in range(8)]
        rng_texts.append({"doc_id": i, "text": " ".join(words)})
    ds = ray.data.from_items(rng_texts)
    tgt = ray.data.from_items([{"text": "alpha beta gamma"}] * 2)
    exact = dsir_select(ds, tgt, keep_denominator=4).to_pandas()
    approx = dsir_select_threshold(ds, tgt,
                                   keep_fraction=0.25).to_pandas()
    # at this size the sketch is exact, so the threshold is the true
    # quantile; ties at the boundary may keep a few extra docs
    assert len(approx) >= len(exact)
    assert len(approx) <= 2 * len(exact) + 8
    kept = set(approx.doc_id)
    # every strictly-above-threshold exact pick is present
    thr = approx.dsir_w.min()
    for r in exact.itertuples():
        if r.dsir_w > thr:
            assert r.doc_id in kept
