"""Tests for ops/cleaning.py: C4-style line/page filtering, PII
redaction, unicode normalization."""

import hashlib

import pyarrow as pa

from logagent_js_ray.ops.cleaning import (PII_PATTERNS, c4_clean_batch,
                                          normalize_text_batch,
                                          pii_redact_batch)


def test_c4_line_rules():
    t = pa.table({"text": [
        # kept: terminal punct + >=3 words; header dropped (no punct);
        # 'Too short.' dropped (<3 words); javascript line dropped
        "Header no punct\nThis line is fine.\n"
        "Enable javascript to view.\nToo short.\n"
        "One more. And another. Third here. Fourth now.",
        # page dropped for lorem ipsum even though its lines survive
        "lorem ipsum dolor sit amet.\nA good sentence here is long.",
        # curly brace page ban
        "A perfectly good sentence right here.\nUses { braces } a lot.",
        "",
        None,
    ]})
    c = c4_clean_batch(t)
    assert c["text_clean"].to_pylist()[0] == (
        "This line is fine.\nOne more. And another. Third here. "
        "Fourth now.")
    assert c["n_lines"].to_pylist() == [5, 2, 2, 0, 0]
    assert c["n_lines_kept"].to_pylist() == [2, 2, 2, 0, 0]
    # sentences counted over CLEANED text: 1 + 4 = 5
    assert c["c4_sentences"].to_pylist() == [5, 2, 2, 0, 0]
    assert c["c4_keep"].to_pylist() == [True, False, False, False, False]


def test_c4_terminal_punct_variants():
    t = pa.table({"text": [
        'He said "stop right there."\nIs this a question here?\n'
        'What an exclamation indeed!\nends without punctuation here']})
    c = c4_clean_batch(t, min_sentences=1)
    kept = c["text_clean"].to_pylist()[0].split("\n")
    assert len(kept) == 3  # ., ?, ! and the quote line all end legally
    assert c["c4_keep"].to_pylist() == [True]


def test_c4_sentence_threshold_boundary():
    # exactly min_sentences passes, one fewer fails
    five = "One two three ok.\n" * 5
    four = "One two three ok.\n" * 4
    t = pa.table({"text": [five.rstrip("\n"), four.rstrip("\n")]})
    c = c4_clean_batch(t)
    assert c["c4_sentences"].to_pylist() == [5, 4]
    assert c["c4_keep"].to_pylist() == [True, False]


def test_pii_redact_counts_and_order():
    t = pa.table({"text": [
        "mail a.b+c@ex-ample.org and x@y.io call +1-555-0100 "
        "or 555-123-4567 from 10.0.0.1 and 192.168.1.254 done",
        "no pii at all here",
        "",
        None,
    ]})
    r = pii_redact_batch(t)
    assert r["n_email"].to_pylist() == [2, 0, 0, 0]
    assert r["n_ipv4"].to_pylist() == [2, 0, 0, 0]
    assert r["n_phone"].to_pylist() == [2, 0, 0, 0]
    assert r["n_pii"].to_pylist() == [6, 0, 0, 0]
    red = r["text_redacted"].to_pylist()
    assert red[0] == ("mail <EMAIL> and <EMAIL> call <PHONE> "
                      "or <PHONE> from <IP> and <IP> done")
    assert red[3] is None


def test_pii_email_digits_not_double_counted_as_phone():
    # the email redaction runs first, so digit-heavy locals/domains
    # never feed the phone pattern
    t = pa.table({"text": ["billing 123-456-789012@pay.example.com ok"]})
    r = pii_redact_batch(t)
    assert r["n_email"].to_pylist() == [1]
    assert r["n_phone"].to_pylist() == [0]
    assert r["text_redacted"].to_pylist() == ["billing <EMAIL> ok"]


def test_pii_patterns_are_re2_safe():
    # every pattern must compile under pyarrow's RE2 (no lookaround /
    # backrefs) — the oracle passes the same strings to DuckDB
    import pyarrow.compute as pc
    s = pa.array(["probe"])
    for _, pat, _ in PII_PATTERNS:
        pc.count_substring_regex(s, pattern=pat)


def test_normalize_nfc_and_whitespace():
    t = pa.table({"text": [
        "  hi \t there \n\n done ",
        "cafe\u0301",     # decomposed -> NFC composes to caf\xe9
        "caf\xe9",        # already composed -> unchanged
        "", None,
    ]})
    r = normalize_text_batch(t)
    out = r["text_norm"].to_pylist()
    assert out[0] == "hi there done"
    assert out[1] == out[2] == "caf\xe9"
    assert r["n_chars_norm"].to_pylist() == [13, 4, 4, 0, 0]
    # md5 parity contract: both forms digest identically post-NFC
    assert (hashlib.md5(out[1].encode()).hexdigest()
            == hashlib.md5(out[2].encode()).hexdigest())


def test_normalize_nfkc_folds_compatibility_forms():
    # NFKC folds the fi-ligature (U+FB01) and fullwidth letters
    # (U+FF21..) to ASCII; NFC keeps them
    t = pa.table({"text": ["\ufb01le \uff21\uff22"]})
    nfc = normalize_text_batch(t, form="NFC")["text_norm"].to_pylist()[0]
    nfkc = normalize_text_batch(t, form="NFKC")["text_norm"].to_pylist()[0]
    assert nfc == "\ufb01le \uff21\uff22"
    assert nfkc == "file AB"


def test_normalize_keeps_unicode_whitespace():
    # the collapse class is EXPLICIT ASCII whitespace (RE2 \s parity
    # with the oracle); NBSP (U+00A0) must survive
    t = pa.table({"text": ["a\u00a0b   c"]})
    out = normalize_text_batch(t)["text_norm"].to_pylist()[0]
    assert out == "a\u00a0b c"


def test_badwords_filter(ray_session):
    import pyarrow as pa
    from logagent_js_ray.ops.cleaning import (badwords_filter_batch,
                                              badwords_pattern)
    b = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": ["all clean words here",
                           "a slow day",
                           "slow spark slow",
                           "slowly sparks"]})  # boundaries: no hits
    out = badwords_filter_batch(b)
    assert out["n_badwords"].to_pylist() == [0, 1, 3, 0]
    assert out["badwords_ok"].to_pylist() == [True, False, False, True]
    # custom list + regex metachars are escaped
    out2 = badwords_filter_batch(b, words=("a.b", "day"))
    assert out2["n_badwords"].to_pylist() == [0, 1, 0, 0]
    assert r"\b(?:slow|spark)\b" == badwords_pattern()
