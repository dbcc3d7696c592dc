"""Trained BPE tokenizer (ops/bpe.py): hand-checked merges, encode
semantics, and pinned-fixture agreement."""

import os

import ray
import ray.data

from logagent_js_ray.ops.bpe import (count_tokens_bpe, encode_word,
                                     train_bpe)


def test_train_hand_checked_merges():
    # corpus: "aaab" x3, "ab" x2
    merges = train_bpe(["aaab aaab aaab", "ab ab"], num_merges=3)
    # (a,a)=6 beats (a,b)=5; then (a,b)=5; then the tie
    # (aa,a)=3 vs (a,ab)=3 resolves lexicographically to (a,ab)... but
    # after merging (a,b) the words are (aa,a,b)->(aa,ab) wait:
    # "aaab" after merge1 = (aa,a,b); after merge2 (a,b)-> (aa,ab)? no:
    # (aa,a,b) contains pair (a,b) at positions 1,2 -> (aa, ab).
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", "b")
    # after merge2: "aaab"=(aa,ab) x3, "ab"=(ab) x2 -> only pair
    # (aa,ab)=3 -> merge3
    assert merges[2] == ("aa", "ab")


def test_encode_word_rank_order():
    merges = [("a", "a"), ("a", "b"), ("aa", "ab")]
    rank = {p: i for i, p in enumerate(merges)}
    assert encode_word("aaab", rank) == ["aaab"]
    assert encode_word("ab", rank) == ["ab"]
    assert encode_word("aab", rank) == ["aa", "b"]  # (a,a) first
    assert encode_word("xyz", rank) == ["x", "y", "z"]
    assert encode_word("a", rank) == ["a"]


def test_count_tokens_distributed(ray_session):
    merges = train_bpe(["aaab aaab aaab", "ab ab"], num_merges=3)
    ds = ray.data.from_items([
        {"doc_id": 0, "text": "aaab ab"},     # 1 + 1
        {"doc_id": 1, "text": "aab xyz"},     # 2 + 3
        {"doc_id": 2, "text": ""},            # 0
    ])
    out = count_tokens_bpe(ds, ray.put(merges)).to_pandas() \
        .set_index("doc_id")["n_tokens_bpe"]
    assert out[0] == 2 and out[1] == 5 and out[2] == 0


def test_matches_pinned_fixture(ray_session):
    import pyarrow.parquet as pq
    from logagent_js_ray.fixtures.gen import (ANN_PIN_SF_DIR,
                                              BPE_NUM_MERGES,
                                              ensure_bpe)
    path = os.path.join(ANN_PIN_SF_DIR, "documents.parquet")
    ref = ray.data.read_parquet(path, columns=["text", "source"]) \
        .filter(expr="source == 'src0'")
    merges = train_bpe(ref, num_merges=BPE_NUM_MERGES)
    fx = pq.read_table(os.path.join(ensure_bpe(), "merges.parquet"))
    assert merges == list(zip(fx["a"].to_pylist(), fx["b"].to_pylist()))
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    live = count_tokens_bpe(docs, ray.put(merges)).to_pandas() \
        .sort_values("doc_id")
    want = pq.read_table(os.path.join(ensure_bpe(),
                                      "doc_counts.parquet")) \
        .to_pandas().sort_values("doc_id")
    assert live["n_tokens_bpe"].tolist() == want["n_tokens_bpe"].tolist()


def test_pack_with_bpe_tokens(ray_session):
    """Composition: sequence packing consumes the learned-subword
    counts (pack_and_group_stats is tokens_col-parameterized)."""
    from logagent_js_ray.ops.packing import pack_and_group_stats
    merges = train_bpe(["aaab aaab aaab", "ab ab"], num_merges=3)
    ds = ray.data.from_items([
        {"doc_id": i, "text": "aaab ab aab", "lang": "en"}
        for i in range(8)])
    ds = count_tokens_bpe(ds, ray.put(merges))
    out = pack_and_group_stats(ds, tokens_col="n_tokens_bpe",
                               budget=8, num_buckets=2,
                               extra_key="lang").to_pandas()
    lang = out[out.which == "lang"]
    # 8 docs x 4 bpe tokens each ("aaab"=1, "ab"=1, "aab"=2)
    assert int(lang.n.iloc[0]) == 8
    assert int(lang.sum_n_tokens_bpe.iloc[0]) == 32
    packs = out[out.which == "pack"]
    assert int(packs.n.sum()) == 8  # every doc assigned one window


def test_dataset_training_matches_iterable(ray_session):
    """The bounded (word, count)-partials Dataset path (round-4 verdict
    item #3: no take_all of texts) must learn the identical merge list
    as the driver-side iterable path."""
    texts = ["aaab aaab ab", "the cat  sat", "", "ab aaab the the",
             "naïve naïve café"]
    want = train_bpe(texts, num_merges=8)
    ds = ray.data.from_items([{"text": t} for t in texts])
    assert train_bpe(ds, num_merges=8) == want
    # empty Dataset trains an empty merge table through the same path
    import pyarrow as pa
    empty = ray.data.from_arrow(pa.table({"text": pa.array([],
                                                           pa.string())}))
    assert train_bpe(empty, num_merges=4) == []


def test_empty_inputs(ray_session):
    import pyarrow as pa
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    merges = train_bpe([], num_merges=4)
    assert merges == []
    out = count_tokens_bpe(empty, ray.put(merges)).to_pandas()
    assert len(out) == 0
