"""Corpus curation pipeline (pipelines/corpus)."""

import pyarrow as pa

import ray.data


def test_exact_dedup_rows(ray_session):
    from logagent_js_ray.pipelines.corpus import exact_dedup_rows
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
        "text": ["same", "same", "other", "same"]})).repartition(4)
    out = exact_dedup_rows(ds).to_pandas().sort_values("doc_id")
    # keep-first = min doc_id per distinct content
    assert out["doc_id"].tolist() == [1, 2]
    assert sorted(out["text"]) == ["other", "same"]


def test_curate_corpus_end_to_end(ray_session, tmp_path):
    from logagent_js_ray.pipelines.corpus import curate_corpus
    base = ("the cat and the dog have that thing to be of note here "
            "plus some more words to pass the length gate fine")
    secret = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = []
    for i in range(30):
        # distinct word soup per doc so near-dup pairing stays sparse
        body = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append({"doc_id": i, "text": base + f" {body}",
                     "source": f"s{i % 3}", "lang": "en",
                     "url": f"https://x/{i}"})  # extra caller column
    # doc 7 carries the benchmark sentence -> contaminated
    rows[7]["text"] += " " + secret
    # exact duplicate of doc 0 (higher id -> dropped by keep-first)
    rows.append({"doc_id": 100, "text": rows[0]["text"],
                 "source": "s0", "lang": "en", "url": "https://x/100"})
    # a low-quality doc (too short)
    rows.append({"doc_id": 101, "text": "tiny", "source": "s0",
                 "lang": "en", "url": "https://x/101"})
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    import pyarrow.parquet as pq
    p = tmp_path / "docs.parquet"
    pq.write_table(t, str(p))
    bench = ray.data.from_arrow(pa.table({"text": [secret]}))
    res = curate_corpus(str(p), out_dir=str(tmp_path / "out"),
                        bench=bench, sample_fraction=1.0,
                        gopher_kwargs={"min_words": 5,
                                       "min_stop_hits": 2},
                        jaccard_threshold=(9, 10))
    c = res["counts"]
    assert c["input"] == 32
    assert c["quality"] == 31          # 'tiny' dropped
    assert c["decontaminated"] == 30   # doc 7 dropped (bench 5-grams)
    assert c["exact_dedup"] == 29      # duplicate 100 dropped
    # docs share the 'base' prefix but differ in 12/~32 shingles, so at
    # 9/10 Jaccard nothing clusters
    assert c["near_dedup"] == 29
    assert c["sampled"] == 29          # fraction 1.0 keeps all
    out = res["dataset"].to_pandas()
    assert len(out) == 29
    for gone in (7, 100, 101):
        assert gone not in out["doc_id"].tolist()
    # caller columns outside the text/id set survive curation
    assert out.loc[out["doc_id"] == 0, "url"].iloc[0] == "https://x/0"
    # written output matches the returned dataset
    back = pq.read_table(str(tmp_path / "out")).num_rows
    assert back == 29

    # scale="web" (hashed shingles + posting guard) is output-identical
    # below the guard thresholds — the one-flag 100-TB preset
    web = curate_corpus(str(p), bench=bench, sample_fraction=1.0,
                        gopher_kwargs={"min_words": 5,
                                       "min_stop_hits": 2},
                        jaccard_threshold=(9, 10), scale="web")
    assert web["counts"] == c
    assert sorted(web["dataset"].to_pandas()["doc_id"]) == \
        sorted(out["doc_id"])


def test_curate_corpus_near_dup_and_scale_validation(ray_session,
                                                     tmp_path):
    """Counts when near-dup clustering actually fires, on both scale
    presets (single-pass counters must agree with the cluster keep)."""
    import pyarrow.parquet as pq
    from logagent_js_ray.pipelines.corpus import curate_corpus
    base = ("the cat and the dog have that thing to be of note here "
            "plus some more words to pass the length gate fine")
    rows = []
    for i in range(12):
        rows.append({"doc_id": i,
                     "text": base + " " + " ".join(
                         f"u{i}v{j}" for j in range(12))})
    # docs 20/21/22 are a 3-clique of near-identical texts (one token
    # appended) -> one cluster, keep the minimum id only
    nd = base + " " + " ".join(f"same{j}" for j in range(30))
    for k, i in enumerate((20, 21, 22)):
        rows.append({"doc_id": i, "text": nd + f" tail{k}"})
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    p = tmp_path / "docs2.parquet"
    pq.write_table(t, str(p))
    for scale in ("standard", "web"):
        # threshold 2/3: every doc shares the `base` prefix (~0.47
        # jaccard pairwise) — only the planted clique (~0.93) clusters
        res = curate_corpus(str(p), gopher_kwargs={"min_words": 5,
                                                   "min_stop_hits": 2},
                            jaccard_threshold=(2, 3), scale=scale)
        c = res["counts"]
        assert c["input"] == 15
        assert c["exact_dedup"] == 15
        assert c["near_dedup"] == 13, scale  # 21, 22 dropped
        ids = sorted(res["dataset"].to_pandas()["doc_id"])
        assert 20 in ids and 21 not in ids and 22 not in ids
    import pytest
    with pytest.raises(ValueError):
        curate_corpus(str(p), scale="planet")


def test_curate_corpus_modern_stages(ray_session, tmp_path):
    """The optional LM-quality / ExactSubstr / DSIR stages compose with
    the base chain, drop what each method says they drop, and preserve
    caller columns end to end."""
    import pyarrow.parquet as pq
    import ray
    from logagent_js_ray.pipelines.corpus import curate_corpus
    base = ("the cat and the dog have that thing to be of note here "
            "plus some more words to pass the length gate fine")
    dup_span = "qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg"  # 44 ch
    rows = []
    for i in range(12):
        body = " ".join(f"m{i}n{j}" for j in range(12))
        rows.append({"doc_id": i, "text": base + " " + body,
                     "url": f"https://x/{i}"})
    # docs 0 and 1 share a long span -> ExactSubstr cuts it from BOTH
    rows[0]["text"] += " " + dup_span
    rows[1]["text"] += " " + dup_span
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    p = tmp_path / "docs3.parquet"
    pq.write_table(t, str(p))
    ref = ray.data.from_arrow(pa.table({"text": [base] * 3}))
    target = ray.data.from_arrow(pa.table(
        {"text": ["m3n0 m3n1 m3n2 m3n3"]}))
    res = curate_corpus(str(p), gopher_kwargs={"min_words": 5,
                                               "min_stop_hits": 2},
                        jaccard_threshold=(9, 10),
                        lm_reference=ref, lm_keep=("head", "middle",
                                                   "tail"),
                        exact_substr=True, substr_min_len=30,
                        dsir_target=target, dsir_keep_denominator=4)
    c = res["counts"]
    assert c["quality"] == 12
    assert c["lm_quality"] == 12       # all buckets kept
    assert c["substr"] == 12           # spans cut, no doc emptied
    assert c["near_dedup"] == 12
    assert c["dsir"] == 3              # exact top 12//4
    out = res["dataset"].to_pandas()
    assert len(out) == 3
    assert 3 in out["doc_id"].tolist()  # the target-gram doc wins
    assert "dsir_w" not in out.columns
    assert out["url"].notna().all()    # caller columns survive
    # the shared span is gone from every surviving text
    full = curate_corpus(str(p), gopher_kwargs={"min_words": 5,
                                                "min_stop_hits": 2},
                         jaccard_threshold=(9, 10), exact_substr=True,
                         substr_min_len=30)
    texts = dict(zip(full["dataset"].to_pandas()["doc_id"],
                     full["dataset"].to_pandas()["text"]))
    assert dup_span not in texts[0] and dup_span not in texts[1]
    assert dup_span in dict(zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()))[0]
    # restrictive LM gate actually drops: a reference containing two
    # of the corpus docs gives exactly those docs in-reference scores;
    # t2 = the reference's 67th-percentile ce, so head+middle keeps a
    # strict nonempty subset (the base-only ref doc scores below both)
    ref2 = ray.data.from_arrow(pa.table(
        {"text": [rows[2]["text"], rows[3]["text"], base]}))
    strict = curate_corpus(str(p), gopher_kwargs={"min_words": 5,
                                                  "min_stop_hits": 2},
                           jaccard_threshold=(9, 10),
                           lm_reference=ref2,
                           lm_keep=("head", "middle"))
    assert 0 < strict["counts"].get("lm_quality", 0) < 12


def test_curate_corpus_zero_surviving_stage_reports_zero(ray_session,
                                                         tmp_path):
    """A stage that drops every row must still appear in counts as 0
    (not vanish), and the empty corpus must flow through the whole
    chain without crashing."""
    import pyarrow.parquet as pq
    from logagent_js_ray.pipelines.corpus import curate_corpus
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["tiny", "wee"]})
    p = tmp_path / "docs0.parquet"
    pq.write_table(t, str(p))
    res = curate_corpus(str(p), gopher_kwargs={"min_words": 50},
                        sample_fraction=0.5)
    assert res["counts"] == {"input": 2, "quality": 0,
                             "exact_dedup": 0, "near_dedup": 0,
                             "sampled": 0}
    assert res["dataset"].count() == 0


def test_curate_corpus_badwords_stage(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from logagent_js_ray.pipelines.corpus import curate_corpus
    base = ("the cat and the dog have that thing to be of note here "
            "plus some more words to pass the length gate fine")
    rows = [{"doc_id": i, "text": base + " " + " ".join(
        f"b{i}c{j}" for j in range(12))} for i in range(6)]
    rows[2]["text"] += " verboten"
    rows[4]["text"] += " verboten stuff"
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    p = tmp_path / "docs4.parquet"
    pq.write_table(t, str(p))
    res = curate_corpus(str(p), gopher_kwargs={"min_words": 5,
                                               "min_stop_hits": 2},
                        jaccard_threshold=(9, 10),
                        badwords=("verboten",))
    assert res["counts"]["badwords"] == 4
    ids = sorted(res["dataset"].to_pandas()["doc_id"])
    assert 2 not in ids and 4 not in ids and len(ids) == 4


def test_counter_pool_sharding(ray_session):
    """Sharded StageCounter (round-4 verdict item #6): counts route by
    batch-key hash, totals merge across shards, and re-adding the same
    (stage, key) stays idempotent on its shard."""
    import zlib

    import ray as _ray
    from logagent_js_ray.pipelines.corpus import (counter_pool,
                                                  counter_totals)
    accs = counter_pool(3)
    keys = [f"batch{i}" for i in range(10)]
    for k in keys:
        shard = accs[zlib.crc32(k.encode()) % len(accs)]
        _ray.get(shard.add.remote("stage_a", k, 5))
        _ray.get(shard.add.remote("stage_a", k, 5))  # retry: no double
    # shards genuinely split the key space at this size
    per_shard = [len(t) for t in
                 _ray.get([a.totals.remote() for a in accs])]
    assert sum(1 for n in per_shard if n) >= 2
    assert counter_totals(accs) == {"stage_a": 50}
