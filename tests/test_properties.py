"""Property-based tests (hypothesis) — round-trip and invariant checks
the reference's example-based mocha suite never had (SURVEY.md §5).
All pure-batch functions; no Ray session needed."""

import hashlib
import json
import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

IDENT = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,15}", fullmatch=True)
# printable ASCII minus backslash/newline/quote (escaping contract of the
# influx serializer below stays trivially invertible)
SAFE_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           blacklist_characters='\\"'),
    min_size=1, max_size=24)


def _esc_tag(v: str) -> str:
    return v.replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")


@settings(max_examples=150, deadline=None)
@given(
    measurement=IDENT,
    tags=st.dictionaries(IDENT, SAFE_TEXT, max_size=4),
    fields=st.dictionaries(
        IDENT,
        st.one_of(st.integers(min_value=-2**53, max_value=2**53),
                  st.floats(allow_nan=False, allow_infinity=False,
                            width=64),
                  st.booleans(), SAFE_TEXT),
        min_size=1, max_size=4),
    ts=st.one_of(st.none(),
                 st.integers(min_value=0, max_value=2**62)),
)
def test_influx_line_round_trip(measurement, tags, fields, ts):
    from logagent_js_ray.sources.wire_formats import parse_influx_line
    tag_part = "".join(f",{_esc_tag(k)}={_esc_tag(v)}"
                       for k, v in tags.items())

    def fmt(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return f"{v}i"
        if isinstance(v, float):
            return repr(v)
        return '"' + v + '"'

    field_part = ",".join(f"{k}={fmt(v)}" for k, v in fields.items())
    line = f"{measurement}{tag_part} {field_part}"
    if ts is not None:
        line += f" {ts}"
    ir = parse_influx_line(line)
    assert ir is not None, line
    assert ir["measurement"] == measurement
    assert ir["tags"] == tags
    assert ir["fields"] == fields
    assert ir["timestamp"] == ts


@settings(max_examples=100, deadline=None)
@given(docs=st.lists(
    st.tuples(st.one_of(st.none(), IDENT),          # _index or default
              st.one_of(st.none(), IDENT),          # _id
              st.dictionaries(IDENT, st.one_of(st.integers(), SAFE_TEXT),
                              max_size=3)),
    min_size=1, max_size=6))
def test_es_bulk_round_trip(docs):
    from logagent_js_ray.sources.wire_formats import es_bulk_parse
    lines = []
    for idx, _id, src in docs:
        action = {}
        if idx is not None:
            action["_index"] = idx
        if _id is not None:
            action["_id"] = _id
        lines.append(json.dumps({"index": action}))
        lines.append(json.dumps(src))
    t = pa.table({"body": ["\n".join(lines)]})
    out = es_bulk_parse(t, default_index="dflt", default_type="_doc")
    assert out.num_rows == len(docs)
    for i, (idx, _id, src) in enumerate(docs):
        assert out["_index"][i].as_py() == (idx or "dflt")
        assert out["_id"][i].as_py() == _id
        assert json.loads(out["source_json"][i].as_py()) == src


@settings(max_examples=100, deadline=None)
@given(value=SAFE_TEXT,
       prefix=SAFE_TEXT, suffix=SAFE_TEXT)
def test_hash_mask_rewrites_first_occurrence(value, prefix, suffix):
    from logagent_js_ray.stages.mask import MaskConfig, mask_batch
    msg = f"{prefix}{value}{suffix}"
    t = pa.table({"logSource": ["user"],
                  "secret": [value],
                  "message": [msg]})
    out = mask_batch(t, MaskConfig(hash_fields=["secret"]))
    h = hashlib.sha256(value.encode()).hexdigest()
    assert out["secret"][0].as_py() == h
    # first occurrence of the value inside message is rewritten
    assert out["message"][0].as_py() == msg.replace(value, h, 1)


@settings(max_examples=100, deadline=None)
@given(starts=st.lists(st.booleans(), min_size=1, max_size=30))
def test_multiline_block_count(starts):
    """Merged block count == number of blockStart lines (plus one if the
    group begins mid-block, multiLine.js:53-71 semantics)."""
    import pandas as pd
    from logagent_js_ray.stages.multiline import merge_bucket
    lines = [("START line %d" % i) if s else ("  cont %d" % i)
             for i, s in enumerate(starts)]
    g = pd.DataFrame({"conv_id": ["c"] * len(lines),
                      "turn_idx": range(len(lines)),
                      "text": lines})
    out = merge_bucket(g, r"^START", "conv_id", "text", "turn_idx")
    expected = sum(starts) + (0 if starts[0] else 1)
    assert len(out) == expected
    # every input line survives in exactly one block
    assert sum(len(t.split("\n")) for t in out["text"]) == len(lines)


@settings(max_examples=60, deadline=None)
@given(ips=st.lists(
    st.tuples(st.integers(0, 255), st.integers(0, 255),
              st.integers(0, 255), st.integers(0, 255)),
    min_size=1, max_size=8))
def test_ip_truncate_zeroes_last_octet(ips):
    from logagent_js_ray.stages.mask import truncate_ipv4
    import numpy as np
    vals = np.array([f"{a}.{b}.{c}.{d}" for a, b, c, d in ips],
                    dtype=object)
    out = truncate_ipv4(vals)
    for (a, b, c, _), got in zip(ips, out):
        assert got == f"{a}.{b}.{c}.0"


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 12), w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_any_shape(h, w, seed):
    import numpy as np

    from logagent_js_ray.ops.media_codecs import decode_bmp, encode_bmp
    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


@settings(max_examples=60, deadline=None)
@given(n=st.integers(1, 400), seed=st.integers(0, 2**31 - 1),
       rate=st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_any_signal(n, seed, rate):
    import numpy as np

    from logagent_js_ray.ops.media_codecs import (decode_wav_pcm16,
                                                  encode_wav_pcm16)
    sig = np.random.default_rng(seed).uniform(-1, 1, n)
    dec, r = decode_wav_pcm16(encode_wav_pcm16(sig, rate))
    assert r == rate and len(dec) == n
    assert np.abs(dec - sig).max() < 1e-3


@settings(max_examples=100, deadline=None)
@given(pri=st.integers(0, 191), host=IDENT, tag=IDENT,
       pid=st.integers(0, 99999), msg=SAFE_TEXT)
def test_syslog_3164_parse_total(pri, host, tag, pid, msg):
    from logagent_js_ray.stages.formats import (SYSLOG_FACILITY,
                                                syslog_frame_parse)
    from logagent_js_ray.functions.transforms import SYSLOG_SEVERITY
    line = f"<{pri}>Oct 11 22:14:15 {host} {tag}[{pid}]: {msg}"
    out = syslog_frame_parse(pa.table({"text": [line]}))
    assert out["severity"][0].as_py() == SYSLOG_SEVERITY[pri & 7].as_py()
    assert out["facility"][0].as_py() == \
        SYSLOG_FACILITY[pri >> 3].as_py()
    assert out["syslog_host"][0].as_py() == host
    assert out["syslog_tag"][0].as_py() == tag
    assert out["syslog_pid"][0].as_py() == pid
    assert out["message"][0].as_py() == msg


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
    min_size=0, max_size=200), min_size=1, max_size=8),
    chunk=st.integers(4, 64))
def test_gelf_chunk_roundtrip_any_payload(texts, chunk):
    import json as _json

    from logagent_js_ray.sources.wire_formats import gelf_chunk_split
    # split-side invariant only (reassembly needs Ray): headers parse
    # back to the exact (id, seq, total) written and payloads concat to
    # the original bytes
    dgs, originals = [], {}
    for mid, t in enumerate(texts):
        payload = _json.dumps({"m": t}).encode()
        parts = [payload[i:i + chunk]
                 for i in range(0, len(payload), chunk)] or [b""]
        if len(parts) > 255:
            continue
        originals[mid] = payload
        midb = mid.to_bytes(8, "little", signed=True)
        dgs += [b"\x1e\x0f" + midb + bytes([i, len(parts)]) + p
                for i, p in enumerate(parts)]
    if not dgs:
        return
    out = gelf_chunk_split(pa.table({"datagram": pa.array(
        dgs, pa.binary())}))
    joined: dict = {}
    for mid, seq, total, pl, ch in zip(
            out["gelf_msg_id"].to_pylist(), out["gelf_seq"].to_pylist(),
            out["gelf_total"].to_pylist(), out["payload"].to_pylist(),
            out["gelf_chunked"].to_pylist()):
        assert ch
        joined.setdefault(mid, {})[seq] = pl
    for mid, payload in originals.items():
        got = b"".join(v for _, v in sorted(joined[mid].items()))
        assert got == payload


# ---------------------------------------------------------------- mmdb

# disjoint CIDR set: pick prefix length then a block index within it
_NETS = st.lists(
    st.tuples(st.integers(min_value=4, max_value=24),   # prefix length
              st.integers(min_value=0, max_value=2**24 - 1)),
    min_size=1, max_size=24)


@settings(max_examples=60, deadline=None)
@given(nets=_NETS, record_size=st.sampled_from([24, 28, 32]),
       ip_version=st.sampled_from([4, 6]))
def test_mmdb_reader_matches_inserted_networks(tmp_path_factory, nets,
                                               record_size, ip_version):
    """Property: for ANY disjoint network set, the enumerated range
    table covers exactly the inserted CIDRs with the right records
    (write -> read round trip over random trees, all record sizes)."""
    import numpy as np

    from logagent_js_ray.sources.mmdb import load_maxmind_mmdb
    from tests.test_mmdb import build_mmdb, geo_record

    # normalize to disjoint networks: sort by start, drop overlaps
    cand = []
    for plen, idx in nets:
        start = (idx % (1 << plen)) << (32 - plen)
        cand.append((start, start + (1 << (32 - plen)) - 1, plen))
    cand.sort()
    chosen, hi = [], -1
    for s, e, plen in cand:
        if s > hi:
            chosen.append((s, e, plen))
            hi = e
    records = [geo_record(f"C{j % 50}", f"city-{j % 50}", "NA",
                          float(j), -float(j))
               for j in range(len(chosen))]
    networks = [
        (f"{s >> 24}.{(s >> 16) & 255}.{(s >> 8) & 255}.{s & 255}/{p}", j)
        for j, (s, _e, p) in enumerate(chosen)]
    path = tmp_path_factory.mktemp("mmdb") / "t.mmdb"
    path.write_bytes(build_mmdb(networks, records, record_size,
                                ip_version))
    t = load_maxmind_mmdb(str(path))
    # enumerated ranges == inserted ranges, in order, with right payloads
    assert list(t["start"]) == [s for s, _e, _p in chosen]
    assert list(t["end"]) == [e for _s, e, _p in chosen]
    assert list(t["country"]) == [f"C{j % 50}" for j in range(len(chosen))]
    assert np.array_equal(t["lat"], np.arange(len(chosen), dtype=float))


# --- corpus-cleaning operator invariants (ops/cleaning.py) -------------

# broad unicode text, but without the literal redaction tokens ('<' is
# excluded) so token-counting assertions are exact
NO_ANGLE = st.text(
    alphabet=st.characters(blacklist_characters="<",
                           blacklist_categories=("Cs",)),
    max_size=120)


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(NO_ANGLE, min_size=1, max_size=8))
def test_pii_redaction_token_counts_match(texts):
    from logagent_js_ray.ops.cleaning import pii_redact_batch
    out = pii_redact_batch(pa.table({"text": pa.array(texts,
                                                      pa.string())}))
    red = out["text_redacted"].to_pylist()
    for i in range(len(texts)):
        assert (out["n_pii"][i].as_py()
                == out["n_email"][i].as_py() + out["n_ipv4"][i].as_py()
                + out["n_phone"][i].as_py())
        # the input cannot contain '<', so every token in the output
        # was produced by exactly one counted replacement
        assert red[i].count("<EMAIL>") == out["n_email"][i].as_py()
        assert red[i].count("<IP>") == out["n_ipv4"][i].as_py()
        assert red[i].count("<PHONE>") == out["n_phone"][i].as_py()


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(st.text(max_size=120), min_size=1, max_size=8))
def test_normalize_is_idempotent(texts):
    from logagent_js_ray.ops.cleaning import normalize_text_batch
    t = pa.table({"text": pa.array(texts, pa.string())})
    once = normalize_text_batch(t)
    twice = normalize_text_batch(
        pa.table({"text": once["text_norm"]}))
    assert (once["text_norm"].to_pylist()
            == twice["text_norm"].to_pylist())
    for i, s in enumerate(once["text_norm"].to_pylist()):
        # collapse+trim postconditions
        assert "  " not in s and "\t" not in s and "\n" not in s
        assert not s.startswith(" ") and not s.endswith(" ")
        assert once["n_chars_norm"][i].as_py() == len(s)


LINE_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=40)


@settings(max_examples=200, deadline=None)
@given(line_lists=st.lists(st.lists(LINE_TEXT, max_size=8),
                           min_size=1, max_size=5))
def test_c4_line_filter_is_idempotent_and_sound(line_lists):
    from logagent_js_ray.ops.cleaning import c4_clean_batch
    texts = ["\n".join(ls) for ls in line_lists]
    t = pa.table({"text": pa.array(texts, pa.string())})
    once = c4_clean_batch(t)
    for i, ls in enumerate(line_lists):
        clean = once["text_clean"][i].as_py()
        kept = clean.split("\n") if clean else []
        assert len(kept) == once["n_lines_kept"][i].as_py()
        # soundness: every kept line satisfies the three line rules
        for ln in kept:
            assert ln.endswith(('.', '!', '?', '"'))
            assert len(ln.split(" ")) >= 3
            assert "javascript" not in ln.lower()
        # kept is a subsequence of the original lines
        it = iter(ls)
        assert all(any(ln == orig for orig in it) for ln in kept)
    # idempotence: re-cleaning the cleaned text keeps every line
    twice = c4_clean_batch(pa.table({"text": once["text_clean"]}))
    assert (twice["text_clean"].to_pylist()
            == once["text_clean"].to_pylist())
    assert (twice["n_lines_kept"].to_pylist()
            == once["n_lines_kept"].to_pylist())


@settings(max_examples=150, deadline=None)
@given(words=st.lists(st.from_regex(r"[a-c]{1,3}", fullmatch=True),
                      min_size=1, max_size=30))
def test_repetition_signals_reference_impl(words):
    from logagent_js_ray.ops.text_analysis import repetition_signals_batch
    text = " ".join(words)
    out = repetition_signals_batch(pa.table({"text": [text]}),
                                   top_ks=(2,), dup_ks=(3,))
    # independent reference computation
    from collections import Counter
    tlen = len(text)
    c2 = Counter(" ".join(words[j:j + 2]) for j in range(len(words) - 1))
    if c2:
        best = max(c2.values())
        gram = min(g for g, c in c2.items() if c == best)
        want_top = round(1e6 * best * len(gram) / tlen)
    else:
        want_top = 0
    c3 = Counter(" ".join(words[j:j + 3]) for j in range(len(words) - 2))
    want_dup = round(1e6 * sum((c - 1) * len(g)
                               for g, c in c3.items() if c >= 2) / tlen)
    assert out["top2gram_char_frac_e6"].to_pylist() == [want_top]
    assert out["dup3gram_char_frac_e6"].to_pylist() == [want_dup]
    assert out["dup_para_frac_e6"].to_pylist() == [0]


# --- round-4 operator invariants ------------------------------------

@settings(max_examples=120, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=60),
                min_size=1, max_size=12),
       st.integers(min_value=3, max_value=12))
def test_substr_span_merge_accounting(texts, min_len):
    """Window-start span merge: spans are disjoint, ordered, within
    the doc, and removed_chars == their total length (pure helpers —
    the distributed paths are brute-force-tested in test_substr)."""
    import numpy as np
    from logagent_js_ray.ops.substr import _cut_one, _merge_spans
    for t in texts:
        n = len(t)
        if n < min_len:
            continue
        starts = np.arange(0, n - min_len + 1, 1)
        # arbitrary subset of marked windows via content heuristic
        marked = starts[[t[s:s + 2] == "ab" for s in starts]] \
            if n >= 2 else starts[:0]
        if marked.shape[0] == 0:
            continue
        st_, en = _merge_spans(marked, min_len)
        assert (st_[1:] > en[:-1] - 1).all()  # islands break on gap>L
        assert (en - st_ >= min_len).all()
        assert en[-1] <= n and st_[0] >= 0
        clean = _cut_one(t, st_, en)
        assert len(clean) == n - int((en - st_).sum())


@settings(max_examples=120, deadline=None)
@given(st.dictionaries(IDENT, st.integers(min_value=0, max_value=10**9),
                       min_size=1, max_size=12),
       st.integers(min_value=0, max_value=10**6))
def test_apportion_budget_invariants(counts, budget):
    from logagent_js_ray.ops.sampling import apportion_budget
    alloc = apportion_budget(counts, budget)
    total = sum(counts.values())
    if total == 0 or budget <= 0:
        assert all(v == 0 for v in alloc.values())
        return
    assert sum(alloc.values()) == budget
    for k, c in counts.items():
        # within 1 of the exact proportional share (Hamilton property)
        assert abs(alloc[k] - budget * c / total) < 1 + 1e-9


@settings(max_examples=80, deadline=None)
@given(st.lists(st.from_regex(r"[ab]{1,12}", fullmatch=True),
                min_size=1, max_size=20),
       st.integers(min_value=0, max_value=12))
def test_bpe_encode_invariants(words, num_merges):
    """Encoding never produces more symbols than characters, always
    concatenates back to the word, and trained merges only shrink."""
    from logagent_js_ray.ops.bpe import encode_word, train_bpe
    merges = train_bpe([" ".join(words)], num_merges=num_merges)
    rank = {p: i for i, p in enumerate(merges)}
    for w in words:
        toks = encode_word(w, rank)
        assert "".join(toks) == w
        assert 1 <= len(toks) <= len(w)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=100),
       st.integers(min_value=1, max_value=100))
def test_bm25_contribution_bounds(tfs, sd_scale, nd):
    """Each integer BM25 term contribution is nonnegative for
    nonnegative idf and bounded by idf * (k1+1) = idf * 11/5."""
    from logagent_js_ray.ops.retrieval import idf_milli
    sd = 100 * sd_scale
    for tf in (abs(v) % 50 + 1 for v in tfs):
        for df in (0, 1, nd // 2, nd):
            idf = idf_milli(min(df, nd), nd)
            dl = 40
            contrib = (idf * tf * 22 * sd) \
                // (10 * sd * tf + 3 * sd + 9 * dl * nd)
            assert 0 <= contrib <= (idf * 11) // 5 + 1


@settings(max_examples=100, deadline=None)
@given(texts=st.lists(
    st.one_of(st.none(),
              st.text(alphabet=st.characters(
                  blacklist_categories=("Cs",)), max_size=40)),
    min_size=0, max_size=8))
def test_poly_gram_buckets_matches_scalar_property(texts):
    """Vectorized poly gram extraction == scalar Horner reference for
    ARBITRARY unicode texts (incl. None, empties, space runs, exotic
    whitespace that must NOT split — only U+0020 does)."""
    from logagent_js_ray.ops.importance import (BUCKETS, _grams,
                                                poly_gram_buckets)

    def poly_bucket(g):
        h = 0
        for ch in g:
            h = (h * 0x100000001B3 + ord(ch)) % (1 << 64)
        return ((h * 0x9E3779B97F4A7C15) % (1 << 64) >> 33) % BUCKETS

    bucket, doc_ix = poly_gram_buckets(texts)
    got = {}
    for b, d in zip(bucket.tolist(), doc_ix.tolist()):
        got.setdefault(d, []).append(b)
    for i, t in enumerate(texts):
        want = sorted(poly_bucket(g) for g in _grams(t or ""))
        assert sorted(got.get(i, [])) == want


@settings(max_examples=100, deadline=None)
@given(texts=st.lists(
    st.text(alphabet=" abcd", max_size=24), min_size=0, max_size=8),
    ref=st.lists(st.text(alphabet=" abcd", min_size=1, max_size=24),
                 min_size=1, max_size=6))
def test_lm_vectorized_matches_scalar_property(texts, ref):
    """Vectorized LM scoring == _doc_cost for arbitrary space-y texts
    against an arbitrary small trained LM — pure per-batch check (the
    map_batches closure body), no Ray session churn per example."""
    import math

    import pyarrow as pa
    from logagent_js_ray.ops import lm_quality as lq

    # train the LM scalar-side (brute; the Dataset trainer is
    # oracle-checked elsewhere)
    big, ctx, vocab = {}, {}, set()
    for t in ref:
        w = t.split(" ")
        for a, b in zip(w[:-1], w[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
            vocab |= {a, b}
    v = max(len(vocab), 1)
    lm = {"bigram": {p: round(1000 * (math.log(ctx[p[0]] + v)
                                      - math.log(c + 1)))
                     for p, c in big.items()},
          "ctx": {a: round(1000 * math.log(n + v))
                  for a, n in ctx.items()},
          "oov": round(1000 * math.log(v)), "v": v}

    class FakeRef:
        """resolve_broadcast cache key standing in for a ray.put ref."""

    ref_key = FakeRef()
    from logagent_js_ray import ops as _ops
    _ops._BROADCAST_CACHE[ref_key] = lm
    try:
        batch = pa.table({"text": pa.array(texts, pa.string())})
        # drive the exact map_batches closure without a Dataset
        captured = {}

        class DS:
            def map_batches(self, fn, **kw):
                captured["fn"] = fn
                return self
        lq.score_cross_entropy(DS(), ref_key)
        out = captured["fn"](batch)["ce_milli"].to_pylist() \
            if texts else []
        for i, t in enumerate(texts):
            tot, n = lq._doc_cost(t, lm)
            assert out[i] == (tot // n if n > 0 else 0)
    finally:
        _ops._BROADCAST_CACHE.pop(ref_key, None)
        lq._LM_STATE.pop(ref_key, None)
