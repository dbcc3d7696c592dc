

def test_decontaminate_string_and_hashed_modes(ray_session):
    import pyarrow as pa
    import ray.data
    from logagent_js_ray.ops.text_analysis import (Decontaminator,
                                                   collect_benchmark_ngrams)
    bench = ray.data.from_arrow(pa.table({
        "text": ["the quick brown fox jumps over the lazy dog"]}))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [
            "prefix the quick brown fox jumps away",  # 1 shared 5-gram
            "quick brown fox jumps over the lazy",    # several shared
            "completely unrelated words here now ok", # none
        ]}))
    for hashed in (False, True):
        ref = collect_benchmark_ngrams(bench, k=5, hashed=hashed)
        out = docs.map_batches(Decontaminator, fn_constructor_kwargs={
            "bench_ref": ref, "k": 5}, batch_format="pyarrow",
            concurrency=(1, 2)).to_pandas().sort_values("doc_id")
        assert out["contam_ngrams"].tolist() == [1, 3, 0], hashed
        assert out["contaminated"].tolist() == [True, True, False]


def test_gopher_rules_batch():
    import pyarrow as pa
    from logagent_js_ray.ops.text_analysis import gopher_rules_batch
    t = pa.table({"text": [
        "the cat sat on the mat and that dog ran off today ok",  # passes
        "aa bb",                                       # too short
        "the the the the the the the the the the the", # dup fraction 10/11
        "",                                            # empty
    ]})
    out = gopher_rules_batch(t, min_words=5, min_stop_hits=2,
                             max_dup_word_frac=0.5)
    assert out["gopher_ok"].to_pylist() == [True, False, False, False]
    assert out["stop_hits"].to_pylist()[0] >= 3  # the x2, and, that
    assert out["dup_word_frac_e6"].to_pylist()[2] == 909091  # 10/11
    assert out["dup_word_frac_e6"].to_pylist()[3] == 0
