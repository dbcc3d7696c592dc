"""Mask stage — rebuild of logagent-js's PII/redaction output filters
(SURVEY.md §2.4) as vectorized ``map_batches`` transforms.

Mirrored operators (all gated by an optional ``matchSource`` regex over
``logSource``, like the plugin signature in
/root/reference/lib/plugins/input-filter/grep.js:1-6):

  * hash_fields   — /root/reference/lib/plugins/output-filter/hash-fields.js:24-47
                    sha256 (configurable algo) of listed fields AND
                    string-replace of the original value inside ``message``
  * ip_truncate   — /root/reference/lib/plugins/output-filter/ip-truncate-fields.js:31-87
                    IPv4 keeps first 3 octets (last -> 0); IPv6 zeroes the
                    last block; occurrences inside ``message`` rewritten
  * remove_fields — /root/reference/lib/plugins/output-filter/remove-fields.js:14-43
                    null out listed fields, optionally masking their old
                    values inside other fields with ``!REMOVED!``
  * rename_fields — /root/reference/lib/plugins/output-filter/rename-fields.js:5-26
  * lowercase_fields — /root/reference/lib/plugins/output-filter/lowercase-fields.js:5-43
  * aes_encrypt_fields — /root/reference/lib/plugins/output-filter/aes-encrypt-fields.js:15-53
                    Real AES-256-CBC, byte-compatible with Node's legacy
                    ``crypto.createCipher('aes256', password)``: key+IV
                    derived via OpenSSL EVP_BytesToKey (MD5, no salt),
                    PKCS7 padding, hex output. Falls back to a clearly
                    marked ``aes:<sha256(key||value)>`` stand-in only if
                    the ``cryptography`` package is absent.

Mutation-order coupling (SURVEY.md §7.5): filters run in DECLARED order
and each captures the pre-mask value before rewriting ``message``,
matching the reference's sequential filter chain
(/root/reference/bin/logagent.js:608-647).

Hashing short strings is a per-value hashlib loop (no vectorized sha256
kernel exists in pyarrow); it only touches the masked columns' non-null
values, and the reference itself documents ~10-15% overhead for this
(patterns.yml:16).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

REMOVED = "!REMOVED!"

try:
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)
    _HAVE_AES = True
except ImportError:  # pragma: no cover - present in this environment
    _HAVE_AES = False


def _evp_bytes_to_key(password: bytes, key_len: int = 32,
                      iv_len: int = 16) -> tuple[bytes, bytes]:
    """OpenSSL EVP_BytesToKey with MD5, no salt, count=1 — what Node's
    legacy ``crypto.createCipher`` uses to turn a password into key+IV
    (aes-encrypt-fields.js:16). Same password -> same ciphertext, which
    is what makes the reference's in-message rewrite deterministic."""
    d, prev = b"", b""
    while len(d) < key_len + iv_len:
        prev = hashlib.md5(prev + password).digest()
        d += prev
    return d[:key_len], d[key_len:key_len + iv_len]


def aes_encrypt_value(text: str, key: bytes, iv: bytes) -> str:
    """AES-256-CBC + PKCS7, hex digest — mirrors cipher.update/final
    ('utf8' -> 'hex', aes-encrypt-fields.js:15-20)."""
    data = text.encode("utf-8")
    pad = 16 - len(data) % 16
    data += bytes([pad]) * pad
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return (enc.update(data) + enc.finalize()).hex()


def _np(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False)


def _hash_values(values: np.ndarray, algo: str = "sha256",
                 prefix: str = "") -> np.ndarray:
    out = np.full(len(values), None, dtype=object)
    for i, v in enumerate(values):
        if v is not None and not (isinstance(v, float) and np.isnan(v)):
            h = hashlib.new(algo)
            h.update(str(v).encode())
            out[i] = prefix + h.hexdigest()
    return out


def _replace_in_message(msg: np.ndarray, old: np.ndarray,
                        new: np.ndarray) -> np.ndarray:
    # per-row replace of the old field value inside message
    # (hash-fields.js:35-38 does data.message.replace(value, hash) — JS
    # String.replace with a string pattern rewrites the FIRST occurrence
    # only; we preserve that exactly)
    for i in range(len(msg)):
        m, o = msg[i], old[i]
        if m is None or o is None:
            continue
        if not isinstance(o, str):  # int64 ids etc: JS coerces, so do we
            o = str(o)
        if o != "" and o in m:
            m2 = new[i] if new[i] is not None else ""
            msg[i] = m.replace(o, m2, 1)
    return msg


def _source_mask(batch: pa.Table, match_source: str | None) -> np.ndarray:
    if not match_source:
        return np.ones(batch.num_rows, dtype=bool)
    col = "logSource" if "logSource" in batch.column_names else "role"
    return _np(pc.match_substring_regex(batch[col], match_source))


class MaskConfig:
    """Ordered mask pipeline configuration."""

    def __init__(self, hash_fields=(), ip_fields=(), remove_fields=(),
                 rename_fields=None, lowercase=False, aes_fields=(),
                 aes_key: str = "", algo: str = "sha256",
                 match_source: str | None = None,
                 message_cols=("message", "text")):
        self.hash_fields = list(hash_fields)
        self.ip_fields = list(ip_fields)
        self.remove_fields = list(remove_fields)
        self.rename_fields = dict(rename_fields or {})
        self.lowercase = lowercase
        self.aes_fields = list(aes_fields)
        self.aes_key = aes_key
        self.algo = algo
        self.match_source = match_source
        self.message_cols = list(message_cols)


def truncate_ipv4(values: np.ndarray) -> np.ndarray:
    """a.b.c.d -> a.b.c.0 (ip-truncate-fields.js:31-42); IPv6 -> zero the
    final block (:56-87). Non-IP strings pass through unchanged."""
    out = np.full(len(values), None, dtype=object)
    for i, v in enumerate(values):
        if v is None:
            continue
        s = str(v)
        if s.count(".") == 3:
            head, _, _ = s.rpartition(".")
            out[i] = head + ".0"
        elif ":" in s:
            head, _, _ = s.rpartition(":")
            out[i] = head + ":0"
        else:
            out[i] = s
    return out


def mask_batch(batch: pa.Table, cfg: MaskConfig) -> pa.Table:
    gate = _source_mask(batch, cfg.match_source)
    names = batch.column_names
    cols: dict[str, np.ndarray] = {}

    def col(name: str) -> np.ndarray:
        if name not in cols:
            cols[name] = _np(batch[name]).astype(object, copy=True)
        return cols[name]

    def rewrite_messages(old: np.ndarray, new: np.ndarray) -> None:
        sel_old = np.where(gate, old, None)
        for mc in cfg.message_cols:
            if mc in names:
                _replace_in_message(col(mc), sel_old, new)

    for f in cfg.hash_fields:
        if f not in names:
            continue
        old = col(f).copy()
        hashed = _hash_values(old, cfg.algo)
        cols[f] = np.where(gate, hashed, old)
        rewrite_messages(old, hashed)

    if cfg.aes_fields and _HAVE_AES:
        aes_key, aes_iv = _evp_bytes_to_key(cfg.aes_key.encode("utf-8"))
    for f in cfg.aes_fields:
        if f not in names:
            continue
        old = col(f).copy()
        if _HAVE_AES:
            enc = np.array(
                [None if v is None else aes_encrypt_value(str(v), aes_key,
                                                          aes_iv)
                 for v in old], dtype=object)
        else:  # clearly-marked stand-in (no cryptography package)
            enc = _hash_values(
                np.array([None if v is None else cfg.aes_key + str(v)
                          for v in old], dtype=object),
                "sha256", prefix="aes:")
        cols[f] = np.where(gate, enc, old)
        rewrite_messages(old, enc)

    for f in cfg.ip_fields:
        if f not in names:
            continue
        old = col(f).copy()
        trunc = truncate_ipv4(old)
        cols[f] = np.where(gate, trunc, old)
        rewrite_messages(old, trunc)

    for f in cfg.remove_fields:
        if f not in names:
            continue
        old = col(f).copy()
        cols[f] = np.where(gate, None, old)
        rewrite_messages(old, np.full(len(old), REMOVED, dtype=object))

    out = batch
    for name, arr in cols.items():
        idx = out.schema.get_field_index(name)
        typ = out.schema.field(idx).type
        vals = arr.tolist()
        try:
            va = pa.array(vals, typ)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # masking a non-string column (hash/ip/aes of an int64 id)
            # yields strings; the column type follows, like the
            # reference's in-place JSON value replacement
            va = pa.array([None if v is None else str(v) for v in vals],
                          pa.string())
        out = out.set_column(idx, name, va)
    if cfg.rename_fields:
        out = out.rename_columns([cfg.rename_fields.get(c, c)
                                  for c in out.column_names])
    if cfg.lowercase:
        # True = allFields; a list lowercases only the NAMED field names
        # (lowercase-fields.js per-field contract)
        if cfg.lowercase is True:
            out = out.rename_columns(
                [c.lower() for c in out.column_names])
        else:
            targets = set(cfg.lowercase)
            out = out.rename_columns(
                [c.lower() if c in targets else c
                 for c in out.column_names])
    return out


def make_mask_fn(cfg: MaskConfig):
    def _mask(batch: pa.Table) -> pa.Table:
        return mask_batch(batch, cfg)
    return _mask
