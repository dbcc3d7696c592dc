"""Training-data ops: dedup, similarity search, text analysis,
multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest


def docs_table():
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the green forest tonight").split()
    texts = []
    # doc 0/1: near-duplicates (one word changed), doc 2: exact dup of 0,
    # docs 3..9: distinct
    texts.append(" ".join(base))
    texts.append(" ".join(base[:-1] + ["today"]))
    texts.append(" ".join(base))
    rng = np.random.default_rng(3)
    for i in range(3, 10):
        texts.append(" ".join(rng.permutation(
            [f"w{i}{j}" for j in range(20)]).tolist()))
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


def embed_table(n=40, dim=16, seed=4):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs[7] = vecs[3] + rng.standard_normal(dim).astype(np.float32) * 0.01
    return pa.table({"vec_id": pa.array(range(n), pa.int64()),
                     "embedding": pa.array(list(vecs),
                                           pa.list_(pa.float32()))})


def test_exact_dedup(ray_session):
    import ray.data
    from logagent_js_ray.ops.dedup import exact_dedup_keep_first
    out = exact_dedup_keep_first(
        ray.data.from_arrow(docs_table())).to_pandas()
    assert len(out) == 9  # 10 docs, one exact dup
    kept = set(out["doc_id"])
    assert 0 in kept and 2 not in kept  # keep-first = min doc_id


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data
    from logagent_js_ray.ops.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(ray.data.from_arrow(docs_table()),
                              threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 2) in got          # exact dup: est jaccard 1.0
    assert (0, 1) in got or (1, 2) in got  # near dup
    for a, b in got:              # no random-doc false positives
        assert {a, b} <= {0, 1, 2}


def test_ngram_jaccard():
    from logagent_js_ray.ops.dedup import ngram_jaccard
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0
    assert 0.0 < ngram_jaccard("a b c d e f", "a b c d e g") < 1.0


def test_simhash_pairs(ray_session):
    import ray.data
    from logagent_js_ray.ops.dedup import simhash_pairs
    pairs = simhash_pairs(ray.data.from_arrow(docs_table()),
                          max_hamming=6).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 2) in got  # identical text -> hamming 0


def test_embedding_near_dup(ray_session):
    import ray.data
    from logagent_js_ray.ops.dedup import embedding_near_dup_pairs
    pairs = embedding_near_dup_pairs(
        ray.data.from_arrow(embed_table()), threshold=0.95).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (3, 7) in got


def test_topk_cosine_matches_numpy(ray_session):
    import ray.data
    from logagent_js_ray.ops.similarity import topk_cosine
    tbl = embed_table()
    vecs = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)
                    ).astype(np.float64)
    q = vecs[0]
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nv @ (q / np.linalg.norm(q))
    want = set(np.argsort([(-s, i) for i, s in enumerate(sims)],
                          axis=0)[:, 0][:5].tolist())
    want = set(sorted(range(len(sims)),
                      key=lambda i: (-sims[i], i))[:5])
    got = topk_cosine(ray.data.from_arrow(tbl), q, k=5)
    assert set(got["vec_id"]) == want
    assert got["cosine"].iloc[0] == pytest.approx(1.0)


def test_topk_lsh_recalls_self_and_neighbor(ray_session):
    import ray.data
    from logagent_js_ray.ops.similarity import topk_cosine_lsh
    tbl = embed_table()
    vecs = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False))
    got = topk_cosine_lsh(ray.data.from_arrow(tbl), vecs[3], k=5)
    assert 3 in set(got["vec_id"])   # self always in its own bucket
    assert 7 in set(got["vec_id"])   # near-identical vector


def test_text_analysis():
    from logagent_js_ray.ops.text_analysis import (analyze_batch,
                                                   fingerprint_batch,
                                                   lang_id_batch)
    t = pa.table({"text": ["the quick brown fox", "a b!! c?? d.."]})
    out = analyze_batch(t)
    assert out["n_tokens_ws"].to_pylist() == [4, 4]
    assert out["n_tokens_bpe"].to_pylist()[1] == 7  # words + punct runs
    assert out["stopword_ratio"][0].as_py() == pytest.approx(0.25)
    fp = fingerprint_batch(t)
    assert len(fp["fp_md5"][0].as_py()) == 32
    lid = lang_id_batch(t)
    assert lid["pred_lang"][0].as_py() == "en"


def test_multimodal_plumbing(ray_session):
    import ray.data
    from logagent_js_ray.ops.multimodal import (DecodeImage, SampleFrames,
                                                synthesize_media_table)
    ds = ray.data.from_arrow(synthesize_media_table(30))
    dec = ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=8,
                         concurrency=2).to_pandas()
    assert len(dec) == 30
    assert len(dec["features"].iloc[0]) == DecodeImage.FEATURE_DIM
    assert "payload" not in dec.columns  # blob consumed, not carried
    # determinism: same payload -> same features
    d2 = ray.data.from_arrow(synthesize_media_table(30)).map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=8,
        concurrency=2).to_pandas()
    np.testing.assert_array_equal(np.stack(dec["features"].to_numpy()),
                                  np.stack(d2["features"].to_numpy()))
    frames = ds.map_batches(SampleFrames, batch_format="pyarrow",
                            concurrency=2).to_pandas()
    # y4m clips have 12-16 real frames -> every_n=10 samples {0, 10}
    assert set(frames["frame_idx"]) == {0, 10}
    assert len(frames) == 2 * 10  # 10 videos in 30 rows
    assert frames["frame_luma"].notna().all()  # real luma, not the stub


def test_topk_ivf_scan_and_index(ray_session, tmp_path):
    import ray.data
    from logagent_js_ray.ops.similarity import (build_ivf_index,
                                                topk_cosine,
                                                topk_cosine_ivf,
                                                topk_cosine_ivf_index,
                                                train_ivf_centroids)
    tbl = embed_table(n=120)
    vecs = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False))
    ds = ray.data.from_arrow(tbl)
    cents = train_ivf_centroids(ds, n_lists=8, sample_size=120)
    assert cents.shape == (8, 16)
    # scan-time IVF: self + planted near-dup always land in probed lists
    got = topk_cosine_ivf(ds, vecs[3], k=5, centroids=cents, nprobe=3)
    assert 3 in set(got["vec_id"])
    assert 7 in set(got["vec_id"])
    # full-probe IVF == brute force exactly (every list scanned)
    full = topk_cosine_ivf(ds, vecs[3], k=5, centroids=cents, nprobe=8)
    brute = topk_cosine(ds, vecs[3], k=5)
    assert list(full["vec_id"]) == list(brute["vec_id"])
    # prebuilt partitioned index: reads only the probed partitions
    idx = build_ivf_index(ds, cents, str(tmp_path / "ivf"))
    got2 = topk_cosine_ivf_index(idx, vecs[3], cents, k=5, nprobe=3)
    assert 3 in set(got2["vec_id"]) and 7 in set(got2["vec_id"])


def test_audio_features_plumbing(ray_session):
    import ray.data
    from logagent_js_ray.ops.multimodal import (ExtractAudioFeatures,
                                                synthesize_media_table)
    tbl = synthesize_media_table(48)
    out = ray.data.from_arrow(tbl).map_batches(
        ExtractAudioFeatures, batch_format="pyarrow", batch_size=16,
        concurrency=2).take_all()
    n_audio = sum(1 for k in tbl["kind"].to_pylist() if k == "audio")
    assert len(out) == n_audio
    dim = ExtractAudioFeatures.N_FRAMES * ExtractAudioFeatures.N_MELS
    assert all(len(r["mel_features"]) == dim for r in out)
    # deterministic: same payload -> same features
    again = ray.data.from_arrow(tbl).map_batches(
        ExtractAudioFeatures, batch_format="pyarrow", batch_size=16,
        concurrency=2).take_all()
    a = sorted(out, key=lambda r: r["media_id"])
    b = sorted(again, key=lambda r: r["media_id"])
    assert all(np.allclose(x["mel_features"], y["mel_features"])
               for x, y in zip(a, b))


def test_asof_join_semantics(ray_session):
    import datetime as dt
    import ray.data
    from logagent_js_ray.ops.joins import asof_join
    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = ray.data.from_arrow(pa.table({
        "lid": [1, 2, 3, 4],
        "user": ["a", "a", "b", "c"],
        "ts": pa.array([T(10), T(5), T(7), T(9)], pa.timestamp("us")),
    }))
    right = ray.data.from_arrow(pa.table({
        "rid": [100, 101, 102],
        "user": ["a", "a", "b"],
        "ts": pa.array([T(4), T(8), T(7)], pa.timestamp("us")),
    }))
    out = asof_join(left, right, key="user", right_cols=["rid"]).to_pandas()
    got = {int(r.lid): int(r.rid_r) for r in out.itertuples()}
    # lid=1 (a@10) -> rid 101 (a@8, latest <= 10); lid=2 (a@5) -> 100
    # lid=3 (b@7) -> 102 (equal ts matches); lid=4 (c) -> no right: drop
    assert got == {1: 101, 2: 100, 3: 102}
    assert out[out.lid == 3]["ts_r"].iloc[0] == T(7)
    # tolerance bounds the lookback window: lid=1's match is 2s back
    # and drops at a 1s tolerance; lid=2 (1s) and lid=3 (0s) stay
    out2 = asof_join(left, right, key="user", right_cols=["rid"],
                     tolerance_us=1_000_000).to_pandas()
    assert {int(r.lid): int(r.rid_r) for r in out2.itertuples()} == \
        {2: 100, 3: 102}


def test_heavy_hitters_exact(ray_session):
    import ray.data
    from logagent_js_ray.ops.sketches import heavy_hitters
    # 1000 rows: 'hot' 150x, 'warm' 20x (exactly 2%), 830 singletons
    vals = ["hot"] * 150 + ["warm"] * 20 + [f"u{i}" for i in range(830)]
    rng = np.random.default_rng(3)
    vals = [vals[i] for i in rng.permutation(len(vals))]
    ds = ray.data.from_arrow(pa.table({"k": vals})).repartition(8)
    out = heavy_hitters(ds, "k", threshold_num=2, threshold_den=100)
    got = dict(zip(out["k"], out["n"]))
    assert got == {"hot": 150, "warm": 20}  # exact, incl. the boundary
    # tighter threshold drops the boundary item
    out2 = heavy_hitters(ds, "k", threshold_num=5, threshold_den=100)
    assert dict(zip(out2["k"], out2["n"])) == {"hot": 150}


def test_mg_compress_undercount_bound():
    from logagent_js_ray.ops.sketches import _mg_compress
    rng = np.random.default_rng(9)
    counts = rng.integers(1, 500, size=200).astype(np.int64)
    items = np.array([f"i{j}" for j in range(200)], dtype=object)
    k = 10
    kept_i, kept_c = _mg_compress(items, counts, k)
    assert len(kept_i) <= k
    lookup = dict(zip(kept_i, kept_c))
    # every kept item is undercounted by at most the subtracted offset,
    # and no dropped item can exceed the (k+1)-th largest count
    s = np.sort(counts)[::-1][k]
    for it, c in zip(items, counts):
        if it in lookup:
            assert 0 < lookup[it] == c - s or lookup[it] == c
        else:
            assert c <= s


def test_kmv_distinct_count(ray_session):
    import ray.data
    from logagent_js_ray.ops.sketches import distinct_count_kmv
    # small-cardinality: sketch is exact
    ds = ray.data.from_arrow(pa.table(
        {"k": [f"v{i % 37}" for i in range(2000)]})).repartition(6)
    r = distinct_count_kmv(ds, "k", k=256)
    assert r["exact_if_small"] and r["estimate"] == 37.0
    # large-cardinality: estimate within ~4 sigma of 1/sqrt(k)
    n = 20000
    ds2 = ray.data.from_arrow(pa.table(
        {"k": [f"u{i}" for i in range(n)]})).repartition(6)
    r2 = distinct_count_kmv(ds2, "k", k=1024)
    assert not r2["exact_if_small"]
    assert abs(r2["estimate"] - n) / n < 4 / np.sqrt(1024)


def test_approx_quantiles_accuracy(ray_session):
    import ray.data
    from logagent_js_ray.ops.sketches import approx_quantiles
    rng = np.random.default_rng(12)
    vals = rng.lognormal(0.0, 1.5, size=50_000)  # heavy-tailed
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(10)
    out = approx_quantiles(ds, "v", qs=(0.5, 0.9, 0.99), m=2048)
    got = dict(zip(out["quantile"], out["value"]))
    for q in (0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        # rank error ~ total/m -> value error small away from the tail
        assert abs(got[q] - exact) / exact < 0.05, (q, got[q], exact)


def test_range_join_semantics(ray_session):
    import datetime as dt
    import ray.data
    from logagent_js_ray.ops.joins import range_join
    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = ray.data.from_arrow(pa.table({
        "lid": [1, 2, 3, 4, 5],
        "user": ["a", "a", "a", "b", "b"],
        "ts": pa.array([T(1), T(5), T(30), T(10), T(2)],
                       pa.timestamp("us")),
    }))
    right = ray.data.from_arrow(pa.table({
        "win": [10, 11, 20],
        "user": ["a", "a", "b"],
        "t_start": pa.array([T(0), T(20), T(8)], pa.timestamp("us")),
        "t_end": pa.array([T(6), T(40), T(12)], pa.timestamp("us")),
    }))
    out = range_join(left, right, key="user",
                     right_cols=["win"]).to_pandas()
    got = {int(r.lid): int(r.win_r) for r in out.itertuples()}
    # lid 1,2 in a's first window (boundaries inclusive); lid 3 in the
    # second; lid 4 in b's window; lid 5 (b@2) before any: dropped
    assert got == {1: 10, 2: 10, 3: 11, 4: 20}


def test_ngram_jaccard_pairs_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.dedup import ngram_jaccard, ngram_jaccard_pairs
    docs = {
        0: "a b c d e f g h",
        1: "a b c d e f g x",     # near-dup of 0
        2: "p q r s t u v w",     # unrelated
        3: "a b c d e f g h",     # exact dup of 0
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(docs), "text": list(docs.values())}))
    out = {(r["id_a"], r["id_b"]): r["jaccard_e6"]
           for r in ngram_jaccard_pairs(
               ds, threshold_num=1, threshold_den=3,
               num_buckets=8, pair_partitions=4).take_all()}
    assert out[(0, 3)] == 1_000_000  # exact dup
    # pairwise function agrees with the distributed operator
    expect = round(1e6 * ngram_jaccard(docs[0], docs[1], 3))
    assert out[(0, 1)] == expect and out[(1, 3)] == expect
    assert (0, 2) not in out and (2, 3) not in out


def test_sessionize_null_keys_and_values(ray_session):
    import datetime

    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.windows import sessionize
    t0 = datetime.datetime(2024, 1, 1)
    mins = [0, 5, 90, 0, 200]
    tbl = pa.table({
        "user_id": pa.array([None, None, None, 7, 7], pa.int64()),
        "ts": pa.array([t0 + datetime.timedelta(minutes=m)
                        for m in mins], pa.timestamp("us")),
        "value": pa.array([1.0, None, 2.0, None, None], pa.float64()),
    })
    out = sessionize(ray.data.from_arrow(tbl), gap_minutes=30.0,
                     num_buckets=4).to_pandas()
    nulls = out[out["user_id"].isna()].sort_values("session_id")
    # nulls group together (SQL semantics), split only by the time gap
    assert list(nulls["n_events"]) == [2, 1]
    assert list(nulls["sum_value_cents"]) == [100, 200]
    sevens = out[out["user_id"] == 7]
    assert list(sevens["n_events"]) == [1, 1]
    assert sevens["sum_value_cents"].isna().all()  # all-null -> NULL


def test_heavy_hitters_null_item(ray_session):
    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.sketches import heavy_hitters
    vals = [None] * 50 + ["a"] * 45 + [f"x{i}" for i in range(5)]
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.string())}))
    out = heavy_hitters(ds, "k", threshold_num=1, threshold_den=4)
    got = {(None if v != v else v) if not isinstance(v, str) else v: n
           for v, n in zip(out["k"], out["n"])}
    assert got.get("a") == 45
    assert got.get(None) == 50  # the null heavy hitter must surface


def test_approx_quantiles_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.sketches import approx_quantiles
    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    out = approx_quantiles(ds, "v")
    assert list(out["quantile"]) == [0.5, 0.9, 0.99]
    assert np.isnan(out["value"]).all()


def test_tumbling_pre_epoch_floor(ray_session):
    import datetime

    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.windows import tumbling
    ts = [datetime.datetime(1969, 12, 31, 23, 50),
          datetime.datetime(1970, 1, 1, 0, 10)]
    tbl = pa.table({"k": ["a", "a"],
                    "ts": pa.array(ts, pa.timestamp("us"))})
    out = tumbling(ray.data.from_arrow(tbl), key="k",
                   minutes=15).to_pandas()
    wins = sorted(out["window"])
    # floor semantics: the pre-epoch event belongs to 23:45, not 00:00
    assert wins[0] == datetime.datetime(1969, 12, 31, 23, 45)
    assert wins[1] == datetime.datetime(1970, 1, 1, 0, 0)


def test_lang_id_agreement_deterministic():
    """Pin the lang-ID heuristic's full confusion surface on the driver
    testdata (round-2 verdict: d_lang_id had neither oracle nor
    closed-form check). The fixture labels are noise relative to the
    English-like texts, so agreement is ~chance by construction — what
    this asserts is that predictions are DETERMINISTIC and any heuristic
    change shows up as a changed matrix."""
    import os
    import pyarrow.parquet as pq
    from logagent_js_ray.ops.text_analysis import lang_id_batch
    path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(path):
        import pytest
        pytest.skip("driver testdata not present")
    t = pq.read_table(path, columns=["doc_id", "text", "lang"])
    out = lang_id_batch(t).select(["lang", "pred_lang"]).to_pandas()
    conf = (out.groupby(["lang", "pred_lang"]).size()
            .sort_index())
    # two independent evaluations must agree bit-for-bit
    out2 = lang_id_batch(t).select(["lang", "pred_lang"]).to_pandas()
    conf2 = out2.groupby(["lang", "pred_lang"]).size().sort_index()
    assert conf.equals(conf2)
    agree = (out["lang"] == out["pred_lang"]).mean()
    # deterministic values at sf0.001 (recorded 2026-08-17); drift only
    # if the heuristic or the driver's testdata generator changes
    assert conf.sum() == len(t) == 500
    assert round(float(agree), 4) == 0.208
    assert conf[("en", "en")] == 55 and conf[("de", "de")] == 30


def test_sessionize_chunked_matches_unchunked(ray_session):
    """Hot-key chunked sessionization (hot_key_chunk_minutes) must
    produce bit-identical sessions to the single-pass path, including
    sessions spanning chunk boundaries, null keys, and a hot key with
    10x the per-key volume of everything else."""
    import datetime

    import numpy as np
    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.windows import sessionize
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # hot key: 400 events, alternating 5-min steps (one long session
    # crossing many 60-min chunks) then a 90-min gap every 50 events
    m = 0
    for i in range(400):
        m += 90 if i % 50 == 49 else 5
        rows.append(("hot", m, float(i % 7) if i % 3 else None))
    # normal keys: ~40 events each
    for k in range(8):
        for i in range(40):
            rows.append((f"u{k}", k * 7 + i * (11 if i % 4 else 70),
                         float(i)))
    # null keys and a key equal to the string sentinel
    for i in range(12):
        rows.append((None, i * 25, 1.0))
        rows.append(("\0null", i * 25, 2.0))
    rng = np.random.default_rng(3)
    order = rng.permutation(len(rows))
    tbl = pa.table({
        "user_id": pa.array([rows[i][0] for i in order], pa.string()),
        "ts": pa.array([t0 + datetime.timedelta(minutes=rows[i][1])
                        for i in order], pa.timestamp("us")),
        "value": pa.array([rows[i][2] for i in order], pa.float64()),
    })

    def norm(df):
        return (df.sort_values(["user_id", "session_id"],
                               na_position="first")
                .reset_index(drop=True))

    base = norm(sessionize(ray.data.from_arrow(tbl), gap_minutes=30.0,
                           num_buckets=4).to_pandas())
    chunked = norm(sessionize(ray.data.from_arrow(tbl), gap_minutes=30.0,
                              num_buckets=4,
                              hot_key_chunk_minutes=60.0).to_pandas())
    import pandas as pd
    pd.testing.assert_frame_equal(base, chunked)
    # the sentinel-value key must NOT have merged with null-key sessions
    assert (base["user_id"] == "\0null").sum() > 0
    assert base["user_id"].isna().sum() > 0


def test_ngram_jaccard_pairs_hashed_mode(ray_session):
    """hashed_shingles=True (8-byte hash shuffle instead of shingle
    strings) must yield the same pairs and jaccard values on a corpus
    with no hash collisions (the declared 2^-64 approximation)."""
    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.dedup import ngram_jaccard_pairs
    docs = {
        0: "a b c d e f g h",
        1: "a b c d e f g x",
        2: "p q r s t u v w",
        3: "a b c d e f g h",
        4: "m n o p q r s t u v w",
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(docs), "text": list(docs.values())}))
    kw = dict(threshold_num=1, threshold_den=3,
              num_buckets=8, pair_partitions=4)
    exact = {(r["id_a"], r["id_b"]): r["jaccard_e6"]
             for r in ngram_jaccard_pairs(ds, **kw).take_all()}
    hashed = {(r["id_a"], r["id_b"]): r["jaccard_e6"]
              for r in ngram_jaccard_pairs(
                  ds, hashed_shingles=True, **kw).take_all()}
    assert exact == hashed and exact[(0, 3)] == 1_000_000


def test_decode_image_empty_batch():
    """Empty blocks (or a kind filter emptying a block) must not crash
    DecodeImage (review regression: np.stack([]) raises)."""
    import pyarrow as pa
    from logagent_js_ray.ops.multimodal import MEDIA_SCHEMA, DecodeImage
    empty = pa.table({f.name: pa.nulls(0, f.type) for f in MEDIA_SCHEMA})
    out = DecodeImage()(empty)
    assert out.num_rows == 0 and "features" in out.column_names


def test_semdedup_keep_least_typical(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.dedup import semdedup
    cents = np.array([[1, 0, 0, 0], [0, 1, 0, 0]], float)
    vecs = [
        [1.0, 0.0, 0.0, 0.0],    # 0: cluster 0, cos-to-centroid 1.0
        [0.99, 0.14, 0.0, 0.0],  # 1: dup of 0 (cos ~0.990)
        [0.9, 0.43, 0.0, 0.0],   # 2: dup of 1 (cos ~0.953) — lowest
                                 #    centroid cosine -> the keeper
        [0.0, 1.0, 0.0, 0.0],    # 3: cluster 1
        [0.1, 0.99, 0.0, 0.0],   # 4: dup of 3
    ]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    out = semdedup(ds, cents, threshold=0.95).to_pandas() \
        .sort_values("vec_id")
    assert out["cluster"].tolist() == [0, 0, 0, 1, 1]
    # 0-1 and 1-2 pair (0-2 is below threshold) -> ONE transitive
    # group {0,1,2}; keeper = least-typical member (lowest centroid
    # cosine), not the lowest id
    assert out["keeper"].tolist() == [2, 2, 2, 4, 4]
    survivors = out[out["keeper"] == out["vec_id"]]["vec_id"].tolist()
    assert survivors == [2, 4]


def test_semdedup_no_duplicates_keeps_all(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from logagent_js_ray.ops.dedup import semdedup
    cents = np.eye(3)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([7, 8, 9], pa.int64()),
        "embedding": pa.array([[1.0, 0.1, 0.0], [0.0, 1.0, 0.1],
                               [0.1, 0.0, 1.0]],
                              pa.list_(pa.float32()))}))
    out = semdedup(ds, cents, threshold=0.99).to_pandas() \
        .sort_values("vec_id")
    assert out["keeper"].tolist() == [7, 8, 9]
    assert (out["keeper"] == out["vec_id"]).all()
