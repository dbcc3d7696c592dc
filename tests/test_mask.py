"""Mask-stage unit tests mirroring SURVEY.md §2.4 semantics
(hash-fields.js, ip-truncate-fields.js, remove-fields.js, ...)."""

import hashlib

import pyarrow as pa

from logagent_js_ray.stages.mask import (MaskConfig, REMOVED, mask_batch,
                                         truncate_ipv4)


def tbl(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


def test_hash_fields_and_message_rewrite():
    # hash-fields.js:24-47 — hash the field AND replace inside message
    t = tbl(message=["tok abc123 seen"], token=["abc123"], role=["user"])
    out = mask_batch(t, MaskConfig(hash_fields=["token"],
                                   message_cols=["message"]))
    h = hashlib.sha256(b"abc123").hexdigest()
    assert out["token"][0].as_py() == h
    assert out["message"][0].as_py() == f"tok {h} seen"


def test_hash_algo_configurable():
    t = tbl(message=["x"], token=["abc"], role=["user"])
    out = mask_batch(t, MaskConfig(hash_fields=["token"], algo="md5"))
    assert out["token"][0].as_py() == hashlib.md5(b"abc").hexdigest()


def test_ip_truncate():
    # ip-truncate-fields.js:31-42 (v4) and :56-87 (v6)
    assert list(truncate_ipv4(
        __import__("numpy").array(["1.2.3.4", "fe80::1", None], dtype=object)
    )) == ["1.2.3.0", "fe80::0", None]
    t = tbl(message=["from 1.2.3.4 ok"], client_ip=["1.2.3.4"], role=["u"])
    out = mask_batch(t, MaskConfig(ip_fields=["client_ip"],
                                   message_cols=["message"]))
    assert out["client_ip"][0].as_py() == "1.2.3.0"
    assert out["message"][0].as_py() == "from 1.2.3.0 ok"


def test_remove_fields_masks_message():
    # remove-fields.js:14-43
    t = tbl(message=["secret=abc done"], secret=["abc"], role=["u"])
    out = mask_batch(t, MaskConfig(remove_fields=["secret"],
                                   message_cols=["message"]))
    assert out["secret"][0].as_py() is None
    assert out["message"][0].as_py() == f"secret={REMOVED} done"


def test_rename_and_lowercase():
    t = tbl(Foo=["1"], role=["u"])
    out = mask_batch(t, MaskConfig(rename_fields={"Foo": "Bar"}))
    assert "Bar" in out.column_names
    out = mask_batch(t, MaskConfig(lowercase=True))
    assert "foo" in out.column_names


def test_match_source_gate():
    # plugin matchSource gate (grep.js:1-6 signature)
    t = tbl(message=["t abc", "t abc"], token=["abc", "abc"],
            role=["user", "system"])
    out = mask_batch(t, MaskConfig(hash_fields=["token"],
                                   match_source="^user$",
                                   message_cols=["message"]))
    assert out["token"][0].as_py() != "abc"   # gated row masked
    assert out["token"][1].as_py() == "abc"   # other source untouched
    assert out["message"][1].as_py() == "t abc"


def test_mask_order_coupling():
    """hash runs before remove in declared order; remove sees the hashed
    message (sequential filter chain, bin/logagent.js:608-647)."""
    t = tbl(message=["a=val1 b=val2"], a=["val1"], b=["val2"], role=["u"])
    out = mask_batch(t, MaskConfig(hash_fields=["a"], remove_fields=["b"],
                                   message_cols=["message"]))
    h = hashlib.sha256(b"val1").hexdigest()
    assert out["message"][0].as_py() == f"a={h} b={REMOVED}"


def test_message_rewrite_first_occurrence_only():
    """JS String.replace(str, str) rewrites only the first occurrence
    (hash-fields.js:35-38) — preserved exactly."""
    t = tbl(message=["abc then abc"], token=["abc"], role=["u"])
    out = mask_batch(t, MaskConfig(hash_fields=["token"],
                                   message_cols=["message"]))
    h = hashlib.sha256(b"abc").hexdigest()
    assert out["message"][0].as_py() == f"{h} then abc"


def test_aes_encrypt_fields_real_aes256():
    """aes-encrypt-fields.js:15-53 — byte-compatible with Node's legacy
    crypto.createCipher('aes256', password): EVP_BytesToKey(md5,
    nosalt) + AES-256-CBC + PKCS7, hex. The expected hex below was
    produced independently by `openssl enc -aes-256-cbc -md md5 -nosalt
    -pass pass:secret`."""
    import pyarrow as pa
    from logagent_js_ray.stages.mask import (MaskConfig, _evp_bytes_to_key,
                                             mask_batch)
    t = pa.table({
        "logSource": ["user", "user"],
        "card": ["hello world", None],
        "message": ["card=hello world ok", "no card"],
    })
    cfg = MaskConfig(aes_fields=["card"], aes_key="secret")
    out = mask_batch(t, cfg)
    expected = "a9943e6403791ebc6d72f58e69303ebc"
    assert out["card"][0].as_py() == expected
    assert out["card"][1].as_py() is None
    # in-message rewrite of the plaintext occurrence (js:40-42)
    assert out["message"][0].as_py() == f"card={expected} ok"
    assert out["message"][1].as_py() == "no card"
    # decrypt round-trip proves real AES, not a hash stand-in
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)
    key, iv = _evp_bytes_to_key(b"secret")
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    plain = dec.update(bytes.fromhex(expected)) + dec.finalize()
    assert plain[:-plain[-1]].decode() == "hello world"
