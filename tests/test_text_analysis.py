

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


def test_repetition_signals_pinned_values():
    import pyarrow as pa
    from logagent_js_ray.ops.text_analysis import repetition_signals_batch
    # 'a b' windows: [a b, b a, a b, b a, a b, b c, c c, c c, c c, c d]
    text = "a b a b a b c c c c d"       # len 21
    out = repetition_signals_batch(pa.table({"text": [text]}),
                                   top_ks=(2, 3), dup_ks=(2, 5))
    # top 2-gram: 'a b' x3 and 'c c' x3 tie -> lexicographic min 'a b'
    # (len 3): 3*3/21
    assert out["top2gram_char_frac_e6"].to_pylist() == [428571]
    # top 3-gram: 'a b a' x2, 'b a b' x2, 'c c c' x2 -> min 'a b a'
    # (len 5): 2*5/21
    assert out["top3gram_char_frac_e6"].to_pylist() == [476190]
    # dup 2-gram excess: (3-1)*3 [a b] + (2-1)*3 [b a] + (3-1)*3 [c c]
    # = 15 over 21 chars
    assert out["dup2gram_char_frac_e6"].to_pylist() == [714286]
    # dup 5-gram: 'a b a b a'..., every 5-window unique -> 0
    assert out["dup5gram_char_frac_e6"].to_pylist() == [0]


def test_repetition_signals_lines_and_paragraphs():
    import pyarrow as pa
    from logagent_js_ray.ops.text_analysis import repetition_signals_batch
    text = "dup line\nunique one\ndup line\n\ndup line\nunique one\ndup line"
    # lines: [dup line, unique one, dup line, '', dup line, unique one,
    #         dup line] -> 7 lines, 3 distinct -> 1 - 3/7 = 4/7
    # line excess chars: (4-1)*8 ['dup line'] + (2-1)*10 ['unique one']
    # = 34 over len(text)=58
    # paragraphs (split \n\n): two identical -> 1/2
    out = repetition_signals_batch(pa.table({"text": [text]}))
    assert len(text) == 58
    assert out["dup_line_frac_e6"].to_pylist() == [571429]
    assert out["dup_line_char_frac_e6"].to_pylist() == [
        round(1e6 * 34 / 58)]
    assert out["dup_para_frac_e6"].to_pylist() == [500000]


def test_repetition_signals_short_and_empty_docs():
    import pyarrow as pa
    from logagent_js_ray.ops.text_analysis import repetition_signals_batch
    out = repetition_signals_batch(
        pa.table({"text": ["one two", "", None]}),
        top_ks=(3,), dup_ks=(5,))
    # 2 words < k for every k -> all zeros; empty/null -> zeros
    assert out["top3gram_char_frac_e6"].to_pylist() == [0, 0, 0]
    assert out["dup5gram_char_frac_e6"].to_pylist() == [0, 0, 0]
    assert out["dup_line_frac_e6"].to_pylist() == [0, 0, 0]


def test_repetition_tiebreak_picks_lexicographic_min_gram():
    import pyarrow as pa
    from logagent_js_ray.ops.text_analysis import repetition_signals_batch
    # 'z z' x2 (len 3) vs 'aa aa' x2 (len 5): counts tie, the operator
    # must pick 'aa aa' (lexicographically smaller joined string) like
    # the oracle's ORDER BY cnt DESC, gr ASC
    text = "z z z q aa aa q aa aa"   # len 21
    out = repetition_signals_batch(pa.table({"text": [text]}),
                                   top_ks=(2,), dup_ks=())
    assert out["top2gram_char_frac_e6"].to_pylist() == [
        round(1e6 * 2 * 5 / 21)]
