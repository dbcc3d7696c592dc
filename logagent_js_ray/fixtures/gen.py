"""Deterministic synthetic transcript fixture generator.

Produces the primary input table per ``BASELINE.json.input_hint``:

    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp[us])

Design per FIXTURES.md: Zipf-ish conversation sizes (one hot conv_id to
exercise skew salting), text payload kinds chosen by a stable hash of
``(conv_id, turn_idx)`` so every scale contains all parser paths in fixed
proportions, rows written globally shuffled so the pipeline's
``sort(conv_id, turn_idx)`` is load-bearing, and all timestamps derived
arithmetically from a fixed base epoch (no wall-clock reads anywhere).

The payload kinds mirror the reference's parser unit tests
(/root/reference/test/test.js:5-121):

  json    -> parser JSON fast path   (lib/parser/parser.js:390-468)
  bunyan  -> bunyan normalization    (lib/parser/parser.js:424-439)
  access  -> access-log pattern + transform (patterns.yml:544-568)
  prose   -> fallback record         (lib/parser/parser.js:559-564)
  pii     -> login-event pattern feeding the mask stage (hash-fields.js)
  syslog  -> syslog priority decode  (patterns.yml:885-938)

Everything is pure numpy/pyarrow — no Ray, importable anywhere.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
GEN_VERSION = 3  # bump to invalidate cached fixture dirs
BASE_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds
# conversation start times wrap within this window so the hourly-bucket
# cube stays realistic (a log corpus has many events per hour, not ~40;
# unbounded staggering made the cube cardinality ~ row count at 8M turns)
SPAN_US = 90 * 86_400 * 1_000_000

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "browser", "python", "sql")

# kind thresholds over crc % 100 (cumulative): json 15, bunyan 25,
# access 55, prose 75, pii 90, syslog 100
KIND_JSON, KIND_BUNYAN, KIND_ACCESS, KIND_PROSE, KIND_PII, KIND_SYSLOG = range(6)
_KIND_CUM = np.array([15, 25, 55, 75, 90, 100])

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

# Scale-factor name -> approximate total turn count (FIXTURES.md §1).
# "sfbench" is the two-parallelism scaling corpus: large enough that
# compute dominates Ray's fixed per-stage overheads (~5 s), which is the
# regime the 8-vs-32-CPU efficiency criterion is meant to measure.
SF_TURNS = {"sf0.001": 5_000, "sf0.01": 60_000, "sf0.1": 600_000,
            "sfbench": 48_000_000}

FIXTURE_ROOT = os.environ.get(
    "LJR_FIXTURE_ROOT", os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
)


def _crc(conv: int, turn: int) -> int:
    return zlib.crc32(f"conv-{conv:08d}:{turn}".encode())


def _iso(us: int) -> str:
    """Render microsecond epoch as ISO-8601 Z string (second precision)."""
    s, _ = divmod(us, 1_000_000)
    days, rem = divmod(s, 86_400)
    hh, rem = divmod(rem, 3_600)
    mm, ss = divmod(rem, 60)
    y, mo, d = _civil_from_days(days)
    return f"{y:04d}-{mo:02d}-{d:02d}T{hh:02d}:{mm:02d}:{ss:02d}Z"


def _clf_ts(us: int) -> str:
    """Render microsecond epoch as common-log-format time '+0000'."""
    s, _ = divmod(us, 1_000_000)
    days, rem = divmod(s, 86_400)
    hh, rem = divmod(rem, 3_600)
    mm, ss = divmod(rem, 60)
    y, mo, d = _civil_from_days(days)
    return f"{d:02d}/{_MONTHS[mo - 1]}/{y:04d}:{hh:02d}:{mm:02d}:{ss:02d} +0000"


def _civil_from_days(z: int) -> tuple[int, int, int]:
    # Howard Hinnant's days-from-civil inverse (public-domain algorithm).
    z += 719_468
    era = z // 146_097
    doe = z - era * 146_097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146_096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + 3 if mp < 10 else mp - 9
    return y + (1 if m <= 2 else 0), m, d


def kind_of(conv: int, turn: int) -> int:
    return int(np.searchsorted(_KIND_CUM, (_crc(conv, turn) % 100), side="right"))


def _text_for(conv: int, turn: int, ts_us: int) -> str:
    c = _crc(conv, turn)
    k = kind_of(conv, turn)
    if k == KIND_JSON:
        return ('{"message": "metric update %d", "counter": %d, '
                '"service": "svc-%d", "region": "r%d"}'
                % (c % 1000, c % 100, c % 5, c % 3))
    if k == KIND_BUNYAN:
        level = (20, 30, 40, 50)[c % 4]
        return ('{"pid":%d,"level":%d,"msg":"job %d done","time":"%s","v":0}'
                % (6000 + c % 100, level, c % 1000, _iso(ts_us)))
    if k == KIND_ACCESS:
        ip = f"{10 + c % 90}.{(c >> 8) % 256}.{(c >> 16) % 256}.{c % 250 + 1}"
        method = ("GET", "GET", "GET", "POST", "PUT", "DELETE")[c % 6]
        path = f"/page/{c % 50}"
        if c % 12 == 0:  # dash variants hit the '- -> 0' transform
            status, size = "-", "-"
        else:
            status = ("200", "200", "200", "301", "404", "500")[(c >> 4) % 6]
            size = str(c % 5000)
        return (f'{ip} - - [{_clf_ts(ts_us)}] "{method} {path} HTTP/1.1" '
                f'{status} {size} "-" "Mozilla/5.0"')
    if k == KIND_PROSE:
        words = ("a simple log line matching no patterns",
                 "free form note about the run",
                 "totally unstructured chatter here",
                 "nothing to see in this line")[c % 4]
        return f"{words} #{c % 10000}"
    if k == KIND_PII:
        user = f"user{c % 500}"
        ip = f"{10 + c % 90}.{(c >> 8) % 256}.{(c >> 16) % 256}.{c % 250 + 1}"
        return (f"login user={user} email={user}@example.com ip={ip} "
                f"token=tok_{c % 0xFFFFFF:06x}")
    # syslog
    pri = c % 192
    return (f"<{pri}>1 {_iso(ts_us)} host{c % 10} app{c % 5} - - - "
            f"task {c % 1000} finished")


def generate_transcripts(total_turns: int, seed: int = SEED,
                         shuffle: bool = True) -> pa.Table:
    rng = np.random.default_rng(seed)
    # conversation sizes: one hot conversation takes ~5% of all turns,
    # the rest Zipf-ish in [2, 60]
    hot = max(4, total_turns // 20)
    sizes = [hot]
    remaining = total_turns - hot
    while remaining > 0:
        n = int(min(2 + rng.zipf(1.6), 60, remaining))
        sizes.append(n)
        remaining -= n
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci, n in enumerate(sizes):
        cid = f"conv-{ci:08d}"
        conv_start = BASE_EPOCH_US + (ci * 137_000_000) % SPAN_US
        for t in range(n):
            c = _crc(ci, t)
            if t == 0:
                role = "system"
            else:
                role = ROLES[(0, 0, 0, 1, 1, 1, 1, 2, 3, 3)[c % 10]]
            tool = TOOLS[c % 4] if role == "tool" else "none"
            ts_us = conv_start + t * 13_000_000 + (c % 7) * 1_000_000
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(_text_for(ci, t, ts_us))
            tools.append(tool)
            tss.append(ts_us)
    tbl = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    if not shuffle:
        return tbl
    perm = rng.permutation(tbl.num_rows)  # global shuffle: sort is load-bearing
    return tbl.take(pa.array(perm))


def ensure_transcripts(sf: str, root: str | None = None, num_files: int | None = None,
                       force: bool = False) -> str:
    """Generate (once) and return the fixture directory for scale ``sf``.

    Writes ``<root>/<sf>/transcripts/part-XXX.parquet`` — several files so
    partition-granular resume (state/manifest.py) has real fragments.
    """
    root = root or FIXTURE_ROOT
    out_dir = os.path.join(os.path.abspath(root), sf, "transcripts")
    done = os.path.join(out_dir, "_DONE")
    if not force and os.path.exists(done):
        with open(done) as f:
            if f"v={GEN_VERSION}" in f.read():
                return out_dir
    total = SF_TURNS[sf] if sf in SF_TURNS else int(sf)
    # generate UNshuffled, then shuffle per output file with chunked
    # takes: a single full-table take concatenates >2 GB string columns
    # and hits Arrow's 32-bit offset limit at large scales
    tbl = generate_transcripts(total, shuffle=False)
    # 64-bit offsets for the take(): 32-bit string columns >2GB overflow
    # when take concatenates chunks; each written chunk is cast back to
    # plain string (always <2GB per file)
    orig_schema = tbl.schema
    import pyarrow as _pa
    for name in ("text", "conv_id", "role", "tool"):
        i = tbl.schema.get_field_index(name)
        tbl = tbl.set_column(i, name, tbl[name].cast(_pa.large_string()))
    if num_files is None:
        num_files = min(64, max(4, total // 250_000 or 4, 8 if total > 10_000 else 4))
    os.makedirs(out_dir, exist_ok=True)
    # regeneration must not leave stale part files behind: a smaller
    # num_files (or a GEN_VERSION bump) would otherwise mix old and new
    # corpora under the same glob, silently corrupting parity and bench
    import glob as _glob
    for old_part in _glob.glob(os.path.join(out_dir, "*.parquet")):
        os.remove(old_part)
    rng = np.random.default_rng(SEED)
    perm = rng.permutation(tbl.num_rows)
    step = -(-tbl.num_rows // num_files)
    for i in range(num_files):
        idx = perm[i * step:(i + 1) * step]
        if len(idx) == 0:
            break
        chunk = tbl.take(pa.array(idx)).cast(orig_schema)
        pq.write_table(chunk, os.path.join(out_dir, f"part-{i:03d}.parquet"))
    with open(done, "w") as f:
        f.write(f"rows={tbl.num_rows} v={GEN_VERSION}\n")
    return out_dir


def ensure_rawlines(root: str | None = None, n_convs: int = 300,
                    force: bool = False) -> str:
    """Raw-line fixture WITH continuation lines (indented), exercising
    the multiline merge operator (FIXTURES.md §2; reference
    lib/parser/multiLine.js). Same transcript shape; ~1/3 of lines are
    continuations starting with whitespace."""
    root = root or FIXTURE_ROOT
    path = os.path.join(os.path.abspath(root), "rawlines.parquet")
    if os.path.exists(path) and not force:
        return path
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci in range(n_convs):
        cid = f"raw-{ci:06d}"
        n = 3 + zlib.crc32(cid.encode()) % 20
        for t in range(n):
            c = _crc(ci + 1_000_000, t)
            if t > 0 and c % 3 == 0:
                text = f"  at frame_{c % 50} (line {c % 1000})"
            elif c % 7 == 0:
                text = f"Traceback: failure {c % 100}"
            else:
                text = f"event {c % 10000} happened"
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append("logger")
            texts.append(text)
            tools.append("none")
            tss.append(BASE_EPOCH_US + (ci * 977 + t * 13) * 1_000_000)
    tbl = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    rng = np.random.default_rng(SEED + 1)
    tbl = tbl.take(pa.array(rng.permutation(tbl.num_rows)))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)
    return path


def ensure_tool_catalog(root: str | None = None) -> str:
    """Small dimension table for the enrichment lookup (FIXTURES.md §5)."""
    root = root or FIXTURE_ROOT
    path = os.path.join(os.path.abspath(root), "tool_catalog.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tbl = pa.table({
        "tool": pa.array(["search", "browser", "python", "sql", "none"]),
        "tool_family": pa.array(["retrieval", "retrieval", "code", "code", "chat"]),
        "cost_tier": pa.array(["low", "medium", "high", "medium", "free"]),
    })
    pq.write_table(tbl, path)
    return path


MEDIA_GEN_VERSION = 1
MEDIA_N = 96


def _e6_half_away(x: np.ndarray) -> np.ndarray:
    from ..ops import e6_round_half_away  # single shared rounding rule
    return e6_round_half_away(x)


def _expected_image_features(img: np.ndarray) -> np.ndarray:
    """Expected DecodeImage feature vector, derived from the RAW rgb
    array (never the BMP payload): nearest resize to 64x64, channel
    means/stds, 26-bin grayscale histogram. Mirrors the op's dtypes and
    operation order exactly so float32 results are bit-equal; what it
    does NOT share is the encode->decode round trip and the Ray
    plumbing — a corrupted byte anywhere there fails the hash."""
    ys = (np.arange(64) * img.shape[0] // 64).clip(0, img.shape[0] - 1)
    xs = (np.arange(64) * img.shape[1] // 64).clip(0, img.shape[1] - 1)
    flat = img[ys][:, xs].reshape(-1, 3).astype(np.float32)
    f = np.empty(32, np.float32)
    f[0:3] = flat.mean(axis=0) / 255.0
    f[3:6] = flat.std(axis=0) / 255.0
    gray = flat.mean(axis=1)
    hist, _ = np.histogram(gray, bins=26, range=(0.0, 255.0))
    f[6:32] = hist.astype(np.float32) / max(len(gray), 1)
    return f


def _expected_audio_features(sig: np.ndarray,
                             n_frames: int = 8,
                             n_bands: int = 16) -> np.ndarray:
    """Expected ExtractAudioFeatures vector from the RAW float signal:
    PCM16 quantization (what the WAV round trip preserves), framed
    |rFFT|, log-spaced band pooling, log1p."""
    pcm = (np.clip(sig, -1.0, 1.0) * 32767.0).astype("<i2")
    samples = pcm.astype(np.float32) / 32768.0
    n = len(samples)
    if n < n_frames:
        samples = np.pad(samples, (0, n_frames - n))
        n = n_frames
    frame_len = n // n_frames
    frames = samples[:frame_len * n_frames].reshape(n_frames, frame_len)
    spec = np.abs(np.fft.rfft(frames * np.hanning(frame_len), axis=1))
    nbin = spec.shape[1]
    edges = np.unique(np.geomspace(1, nbin, n_bands + 1).astype(int))
    while len(edges) < n_bands + 1:
        edges = np.append(edges, edges[-1] + 1)
    out = np.empty((n_frames, n_bands), np.float32)
    for b in range(n_bands):
        lo, hi = edges[b] - 1, max(edges[b + 1] - 1, edges[b])
        out[:, b] = spec[:, lo:hi].sum(axis=1)
    return np.log1p(out).astype(np.float32).reshape(-1)


def ensure_media(root: str | None = None, n: int = MEDIA_N,
                 force: bool = False) -> str:
    """Media fixture pair for the hash-checked multimodal row:

    * ``media/media.parquet`` — encoded BMP/WAV/Y4M payloads
      (ops.multimodal.synthesize_media_table);
    * ``media/media_features.parquet`` — the EXPECTED
      (media_id, stage, idx, value_e6) feature rows, derived here from
      the raw pre-encoding arrays (ops.multimodal.media_raws) with
      fixture-local arithmetic, so the driver's value-hash compares the
      full encode -> decode -> feature pipeline against closed-form
      expectations (round-2 verdict: grade content, not row counts).
    """
    from ..ops.multimodal import media_raws, synthesize_media_table
    root = root or FIXTURE_ROOT
    out_dir = os.path.join(os.path.abspath(root), "media")
    done = os.path.join(out_dir, "_DONE")
    if not force and os.path.exists(done):
        with open(done) as f:
            if f"v={MEDIA_GEN_VERSION} n={n}" in f.read():
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(synthesize_media_table(n),
                   os.path.join(out_dir, "media.parquet"))
    mids, stages, idxs, vals = [], [], [], []
    for mid, kind, raw, _meta in media_raws(n):
        if kind == "image":
            f = _expected_image_features(raw)
            e6 = _e6_half_away(f)
            mids += [mid] * len(f)
            stages += ["decode"] * len(f)
            idxs += list(range(len(f)))
            vals += e6.tolist()
        elif kind == "audio":
            f = _expected_audio_features(raw)
            e6 = _e6_half_away(f)
            mids += [mid] * len(f)
            stages += ["audio"] * len(f)
            idxs += list(range(len(f)))
            vals += e6.tolist()
        else:  # video: sampled frame luma means (every 10th, max 4)
            sel = list(range(0, len(raw), 10))[:4]
            for fi in sel:
                mids.append(mid)
                stages.append("frames")
                idxs.append(fi)
                vals.append(int(_e6_half_away(
                    np.array([raw[fi].mean()]))[0]))
    feats = pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "stage": pa.array(stages, pa.string()),
        "idx": pa.array(idxs, pa.int32()),
        "value_e6": pa.array(vals, pa.int64()),
    })
    pq.write_table(feats, os.path.join(out_dir, "media_features.parquet"))
    with open(done, "w") as f:
        f.write(f"rows={feats.num_rows} v={MEDIA_GEN_VERSION} n={n}\n")
    return out_dir


ANN_GEN_VERSION = 1
# the driver's correctness gate grades at sf0.01; like the transcript
# oracles (see pipelines/queries.py), the data-derived ANN fixture
# tables (centroids / twins / expected signature pairs) are PINNED to
# that scale. The plane tables depend only on (seed, dim=64) and hold
# at every sf.
ANN_PIN_SF_DIR = os.environ.get("LJR_ANN_PIN_SF_DIR",
                                "/root/testdata/sf0.01")


def _ann_normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _ann_kmeans(x: np.ndarray, n_lists: int, n_iters: int,
                seed: int) -> np.ndarray:
    """Fixture-local Lloyd's k-means, operation-for-operation the same
    float64 arithmetic as ops.similarity.train_ivf_centroids (argmax
    assignment, per-list mean, renormalize) so centroids are bit-equal
    — what it does NOT share is the Ray sampling plumbing."""
    x = _ann_normalize(x.astype(np.float64))
    n_lists = min(n_lists, len(x))
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), n_lists, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(n_lists):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
        cents = _ann_normalize(cents)
    return cents


def _ann_minhash_pairs(doc_ids, texts, num_perm=64, bands=16,
                       threshold=0.5, k=3):
    """Fixture-local MinHash+LSH expected pairs: crc32 token hashes,
    k-gram polynomial shingles mod 2^64 (masked to 32 bits), the
    (a*sh+b) mod Mersenne-61 permutation family, 4-row polynomial band
    hashes, same-band candidate pairs verified by signature agreement.
    Scalar Python arithmetic throughout (vs the operator's vectorized
    numpy batches) — the mm_pipeline precedent: same contract, none of
    the production plumbing."""
    P = 1_000_003
    M64 = (1 << 64) - 1
    MERS = (1 << 61) - 1
    rng = np.random.default_rng(7)
    a = rng.integers(1, 1 << 31, num_perm, dtype=np.uint64).tolist()
    b = rng.integers(0, 1 << 31, num_perm, dtype=np.uint64).tolist()
    rows_per_band = num_perm // bands
    sigs, buckets = {}, {}
    for did, text in zip(doc_ids, texts):
        toks = (text or "").split()
        if not toks:
            sh = [0]
        elif len(toks) < k:
            acc = 0
            for t in toks:
                acc = (acc * P + zlib.crc32(t.encode())) & M64
            sh = [acc]
        else:
            th = [zlib.crc32(t.encode()) for t in toks]
            ss = set()
            for j in range(len(toks) - k + 1):
                g = 0
                for v in th[j:j + k]:
                    g = (g * P + v) & M64
                ss.add(g)
            sh = sorted(ss)
        sig = [min((a[p] * (s & 0xFFFFFFFF) + b[p]) % MERS for s in sh)
               for p in range(num_perm)]
        sigs[did] = sig
        for bi in range(bands):
            bh = 0
            for v in sig[bi * rows_per_band:(bi + 1) * rows_per_band]:
                bh = (bh * P + v) & M64
            buckets.setdefault((bi, bh & 0x7FFF_FFFF_FFFF_FFFF),
                               []).append(did)
    pairs = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                key = (ids[i], ids[j])
                if key in pairs:
                    continue
                sa, sb = sigs[ids[i]], sigs[ids[j]]
                est = sum(x == y for x, y in zip(sa, sb)) / num_perm
                if est >= threshold:
                    pairs[key] = est
    return pairs


def _ann_simhash_pairs(doc_ids, texts, max_hamming=8):
    """Fixture-local SimHash expected pairs: crc32-pair 64-bit token
    hashes, ±1 bit votes, (max_hamming+1)-band pigeonhole blocking,
    exact popcount verify. Scalar Python arithmetic (see
    _ann_minhash_pairs)."""
    n_bands = min(max(2, max_hamming + 1), 32)
    width = 64 // n_bands
    hashes, buckets = {}, {}
    for did, text in zip(doc_ids, texts):
        toks = (text or "").split()
        if not toks:
            h = 0
        else:
            v = [0] * 64
            for t in toks:
                th = zlib.crc32(t.encode()) | \
                    (zlib.crc32(t[::-1].encode()) << 32)
                for j in range(64):
                    v[j] += 1 if (th >> j) & 1 else -1
            h = sum(1 << j for j in range(64) if v[j] > 0)
        hashes[did] = h
        for bi in range(n_bands):
            shift = bi * width
            w = (64 - shift) if bi == n_bands - 1 else width
            key = (h >> shift) & ((1 << w) - 1)
            buckets.setdefault((bi, key), []).append(did)
    pairs = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                key = (ids[i], ids[j])
                if key in pairs:
                    continue
                ham = bin(hashes[ids[i]] ^ hashes[ids[j]]).count("1")
                if ham <= max_hamming:
                    pairs[key] = ham
    return pairs


def ensure_ann(root: str | None = None, sf_dir: str | None = None,
               force: bool = False) -> str:
    """ANN/near-dup oracle fixture pack for the hash-checked v_ann row
    (round-3 verdict item #1). Five tables under ``<root>/ann/``:

    * ``planes_knn.parquet`` — the 8 seed-11 hyperplanes
      (ops/similarity.LSHIndexScorer's exact tensor, column-sliced);
    * ``planes_neardup.parquet`` — the (4 tables × 6 planes) seed-11
      tensor of ops/dedup.HyperplaneBucketizer at n_rows=500;
    * ``centroids.parquet`` — IVF centroids from the fixture-local
      k-means (bit-equal to train_ivf_centroids on the pinned scale);
    * ``twins.parquet`` — the 10 planted near-dup twins
      (pipelines/queries._plant_near_dups arithmetic, fixture-local);
    * ``sig_pairs.parquet`` — EXPECTED MinHash/SimHash candidate pairs
      (the crc32/uint64-wrap hashing is not DuckDB-expressible, so
      these follow the mm_pipeline expected-table precedent).

    Plane/centroid/twin tables are INPUTS the SQL oracle scores with
    plain list arithmetic; only sig_pairs carries expected output."""
    from ..ops import e6_round_half_away
    root = root or FIXTURE_ROOT
    sf_dir = sf_dir or ANN_PIN_SF_DIR
    out_dir = os.path.join(os.path.abspath(root), "ann")
    done = os.path.join(out_dir, "_DONE")
    if not force and os.path.exists(done):
        with open(done) as f:
            if f"v={ANN_GEN_VERSION} sf={sf_dir}" in f.read():
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    dim = 64

    # hyperplane tables (seed/dim-determined, sf-independent)
    pk = np.random.default_rng(11).standard_normal((dim, 8))
    pq.write_table(pa.table({
        "plane_id": pa.array(range(8), pa.int32()),
        "plane": pa.array([pk[:, j].tolist() for j in range(8)],
                          pa.list_(pa.float64())),
    }), os.path.join(out_dir, "planes_knn.parquet"))
    pn = np.random.default_rng(11).standard_normal((4, dim, 6))
    tbls, pids, planes = [], [], []
    for t in range(4):
        for j in range(6):
            tbls.append(t)
            pids.append(j)
            planes.append(pn[t, :, j].tolist())
    pq.write_table(pa.table({
        "tbl": pa.array(tbls, pa.int32()),
        "plane_id": pa.array(pids, pa.int32()),
        "plane": pa.array(planes, pa.list_(pa.float64())),
    }), os.path.join(out_dir, "planes_neardup.parquet"))

    # sf-pinned tables
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    vecs32 = np.stack([np.asarray(v, np.float32)
                       for v in emb["embedding"].to_pylist()])
    cents = _ann_kmeans(vecs32[:4096], 8, 10, 7)
    pq.write_table(pa.table({
        "list_id": pa.array(range(len(cents)), pa.int32()),
        "centroid": pa.array([c.tolist() for c in cents],
                             pa.list_(pa.float64())),
    }), os.path.join(out_dir, "centroids.parquet"))

    ids = np.asarray(emb["vec_id"].to_pylist(), np.int64)
    tw_id, tw_vec = [], []
    for vid in range(10):
        pos = np.flatnonzero(ids == vid)
        if not len(pos):
            continue
        rng = np.random.default_rng(vid + 12345)
        v = vecs32[pos[0]] + 0.02 * rng.standard_normal(dim)
        tw_id.append(vid + 1_000_000)
        tw_vec.append(v.astype(np.float32).astype(np.float64).tolist())
    pq.write_table(pa.table({
        "vec_id": pa.array(tw_id, pa.int64()),
        "embedding": pa.array(tw_vec, pa.list_(pa.float64())),
    }), os.path.join(out_dir, "twins.parquet"))

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    did = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    mh = _ann_minhash_pairs(did, texts)
    sh = _ann_simhash_pairs(did, texts)
    methods, ia, ib, se6 = [], [], [], []
    for (x, y), est in sorted(mh.items()):
        methods.append("minhash")
        ia.append(x)
        ib.append(y)
        se6.append(int(e6_round_half_away(np.array([est]))[0]))
    for (x, y), ham in sorted(sh.items()):
        methods.append("simhash")
        ia.append(x)
        ib.append(y)
        se6.append(ham * 1_000_000)
    pq.write_table(pa.table({
        "method": pa.array(methods, pa.string()),
        "id_a": pa.array(ia, pa.int64()),
        "id_b": pa.array(ib, pa.int64()),
        "score_e6": pa.array(se6, pa.int64()),
    }), os.path.join(out_dir, "sig_pairs.parquet"))
    with open(done, "w") as f:
        f.write(f"v={ANN_GEN_VERSION} sf={sf_dir}\n")
    return out_dir


DSIR_GEN_VERSION = 1


def ensure_dsir(root: str | None = None, sf_dir: str | None = None,
                force: bool = False) -> str:
    """Pinned DSIR hashed-gram weight table for the d_fingerprint
    'dsir' rows: one parquet ``dsir/weights.parquet`` with a row per
    bucket 0..4095, w = integer milli-nat log importance ratio of the
    src0 (target) gram distribution over the full-corpus (raw) one.

    SCALAR reimplementation independent of the Ray operators (the
    mm_pipeline / sig_pairs precedent): single-space tokenizer,
    unigrams + bigrams, bucket = first 3 md5 hex chars, add-1
    smoothing, round(1000 * ln ratio) with math.log — the live
    ops/importance pipeline must reproduce these exact integers and
    the SQL oracle joins this table, so any drift in hashing, counting
    or smoothing fails the value hash. Data-derived; pinned to the
    driver's sf0.01 grading scale (ANN fixture precedent)."""
    import hashlib
    import math
    root = root or FIXTURE_ROOT
    sf_dir = sf_dir or ANN_PIN_SF_DIR
    out_dir = os.path.join(os.path.abspath(root), "dsir")
    done = os.path.join(out_dir, "_DONE")
    if not force and os.path.exists(done):
        with open(done) as f:
            if f"v={DSIR_GEN_VERSION}" in f.read():
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text", "source"])
    n_b = 4096
    t_cnt = [0] * n_b
    r_cnt = [0] * n_b
    for text, source in zip(docs["text"].to_pylist(),
                            docs["source"].to_pylist()):
        w = (text or "").split(" ")
        grams = w + [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]
        for g in grams:
            b = int(hashlib.md5(g.encode()).hexdigest()[:3], 16)
            r_cnt[b] += 1
            if source == "src0":
                t_cnt[b] += 1
    t_tot = sum(t_cnt) + n_b
    r_tot = sum(r_cnt) + n_b
    ws = [round(1000 * (math.log(t + 1) - math.log(t_tot)
                        - math.log(r + 1) + math.log(r_tot)))
          for t, r in zip(t_cnt, r_cnt)]
    pq.write_table(pa.table({
        "bucket": pa.array(range(n_b), pa.int64()),
        "w": pa.array(ws, pa.int64()),
    }), os.path.join(out_dir, "weights.parquet"))
    with open(done, "w") as f:
        f.write(f"v={DSIR_GEN_VERSION} sf={sf_dir}\n")
    return out_dir


LM_GEN_VERSION = 1


def ensure_lm(root: str | None = None, sf_dir: str | None = None,
              force: bool = False) -> str:
    """Pinned CCNet-style bigram-LM artifact for the d_lang_id 'ppl'
    rows: ``lm/bigrams.parquet`` (w1, w2, cost), ``lm/ctx.parquet``
    (w1, ctx_cost) and ``lm/meta.parquet`` (oov_cost, t1, t2 percentile
    cutoffs) trained on the src0 reference docs — SCALAR
    reimplementation independent of ops/lm_quality (the ensure_dsir /
    sig_pairs precedent): add-1-smoothed integer milli-nat costs,
    vocabulary = words observed in bigram events, cutoffs = exact
    33rd/67th order statistics of the reference's own per-doc
    cross-entropies. The live train_bigram_lm/reference_cutoffs must
    reproduce every integer; the SQL oracle joins these tables.
    Data-derived; pinned to the driver's sf0.01 grading scale."""
    import math
    root = root or FIXTURE_ROOT
    sf_dir = sf_dir or ANN_PIN_SF_DIR
    out_dir = os.path.join(os.path.abspath(root), "lm")
    done = os.path.join(out_dir, "_DONE")
    if not force and os.path.exists(done):
        with open(done) as f:
            if f"v={LM_GEN_VERSION}" in f.read():
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text", "source"])
    ref = [t or "" for t, s in zip(docs["text"].to_pylist(),
                                   docs["source"].to_pylist())
           if s == "src0"]
    big: dict[tuple, int] = {}
    ctx_n: dict[str, int] = {}
    vocab: set[str] = set()
    for t in ref:
        w = t.split(" ")
        for a, b in zip(w[:-1], w[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx_n[a] = ctx_n.get(a, 0) + 1
            vocab.add(a)
            vocab.add(b)
    v = max(len(vocab), 1)
    cost = {p: round(1000 * (math.log(ctx_n[p[0]] + v)
                             - math.log(c + 1)))
            for p, c in big.items()}
    ctx_cost = {w1: round(1000 * math.log(n + v))
                for w1, n in ctx_n.items()}
    oov = round(1000 * math.log(v))

    def doc_ce(t: str) -> int:
        w = t.split(" ")
        tot = 0
        for a, b in zip(w[:-1], w[1:]):
            tot += cost.get((a, b), ctx_cost.get(a, oov))
        return tot // (len(w) - 1) if len(w) > 1 else 0

    ces = sorted(doc_ce(t) for t in ref)
    n = len(ces)
    t1 = ces[max(0, math.ceil(n / 3) - 1)] if n else 0
    t2 = ces[max(0, math.ceil(2 * n / 3) - 1)] if n else 0
    pq.write_table(pa.table({
        "w1": pa.array([p[0] for p in cost], pa.string()),
        "w2": pa.array([p[1] for p in cost], pa.string()),
        "cost": pa.array(list(cost.values()), pa.int64()),
    }), os.path.join(out_dir, "bigrams.parquet"))
    pq.write_table(pa.table({
        "w1": pa.array(list(ctx_cost.keys()), pa.string()),
        "ctx_cost": pa.array(list(ctx_cost.values()), pa.int64()),
    }), os.path.join(out_dir, "ctx.parquet"))
    pq.write_table(pa.table({
        "oov_cost": pa.array([oov], pa.int64()),
        "t1": pa.array([t1], pa.int64()),
        "t2": pa.array([t2], pa.int64()),
    }), os.path.join(out_dir, "meta.parquet"))
    with open(done, "w") as f:
        f.write(f"v={LM_GEN_VERSION} sf={sf_dir}\n")
    return out_dir


BM25_GEN_VERSION = 1
BM25_QUERY_DOCS = (0, 100, 200)  # query = first 8 tokens of each
BM25_QUERY_LEN = 8


def ensure_bm25(root: str | None = None, sf_dir: str | None = None,
                force: bool = False) -> str:
    """Pinned BM25 idf table for the v_ann 'bm25' rows: queries are
    the first 8 tokens of docs 0/100/200; ``bm25/idf.parquet`` carries
    round(1000 * ln((N - df + 0.5)/(df + 0.5) + 1)) per distinct query
    term and ``bm25/meta.parquet`` the corpus totals (sd, nd) — SCALAR
    reimplementation independent of ops/retrieval (the ensure_dsir /
    ensure_lm precedent). The live doc_freqs/idf_milli pipeline must
    reproduce these integers and the SQL oracle joins this table.
    Data-derived; pinned to the driver's sf0.01 grading scale."""
    import math
    root = root or FIXTURE_ROOT
    sf_dir = sf_dir or ANN_PIN_SF_DIR
    out_dir = os.path.join(os.path.abspath(root), "bm25")
    done = os.path.join(out_dir, "_DONE")
    if not force and os.path.exists(done):
        with open(done) as f:
            if f"v={BM25_GEN_VERSION}" in f.read():
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    by_id = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    terms: list[str] = []
    for qid in BM25_QUERY_DOCS:
        for t in (by_id[qid] or "").split(" ")[:BM25_QUERY_LEN]:
            if t not in terms:
                terms.append(t)
    texts = [t or "" for t in docs["text"].to_pylist()]
    nd = len(texts)
    sd = sum(len(t.split(" ")) for t in texts)
    tok_sets = [set(t.split(" ")) for t in texts]
    idf = []
    for term in terms:
        df_t = sum(term in s for s in tok_sets)
        idf.append(round(1000 * math.log((nd - df_t + 0.5)
                                         / (df_t + 0.5) + 1)))
    pq.write_table(pa.table({
        "term": pa.array(terms, pa.string()),
        "idf_milli": pa.array(idf, pa.int64()),
    }), os.path.join(out_dir, "idf.parquet"))
    pq.write_table(pa.table({
        "sd": pa.array([sd], pa.int64()),
        "nd": pa.array([nd], pa.int64()),
    }), os.path.join(out_dir, "meta.parquet"))
    with open(done, "w") as f:
        f.write(f"v={BM25_GEN_VERSION} sf={sf_dir}\n")
    return out_dir


BPE_GEN_VERSION = 1
BPE_NUM_MERGES = 64


def ensure_bpe(root: str | None = None, sf_dir: str | None = None,
               force: bool = False) -> str:
    """Pinned BPE artifact for the d_token_stats 'bpe' rows:
    ``bpe/merges.parquet`` (rank, a, b) learned from the src0
    reference docs and ``bpe/doc_counts.parquet`` (doc_id,
    n_tokens_bpe) for every document — fixture-local reimplementation
    of the Sennrich et al. procedure (word-internal, highest-count
    pair, lexicographic tie-break, rank-ordered encoding; the
    mm_pipeline expected-table precedent, since BPE has no SQL
    expression). The live ops/bpe pipeline must reproduce both tables
    exactly. Data-derived; pinned to the driver's sf0.01 scale."""
    root = root or FIXTURE_ROOT
    sf_dir = sf_dir or ANN_PIN_SF_DIR
    out_dir = os.path.join(os.path.abspath(root), "bpe")
    done = os.path.join(out_dir, "_DONE")
    if not force and os.path.exists(done):
        with open(done) as f:
            if f"v={BPE_GEN_VERSION}" in f.read():
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])
    freq: dict[tuple, int] = {}
    for t, s in zip(docs["text"].to_pylist(), docs["source"].to_pylist()):
        if s != "src0":
            continue
        for w in (t or "").split(" "):
            if w:
                freq[tuple(w)] = freq.get(tuple(w), 0) + 1
    merges = []
    for _ in range(BPE_NUM_MERGES):
        pc: dict[tuple, int] = {}
        for sym, f in freq.items():
            for pair in zip(sym[:-1], sym[1:]):
                pc[pair] = pc.get(pair, 0) + f
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        if pc[best] < 2:
            break
        merges.append(best)
        a, b = best
        nf: dict[tuple, int] = {}
        for sym, f in freq.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nf[tuple(out)] = nf.get(tuple(out), 0) + f
        freq = nf
    rank = {p: i for i, p in enumerate(merges)}

    def enc_len(w: str) -> int:
        sym = list(w)
        while len(sym) > 1:
            bi, br = -1, None
            for i in range(len(sym) - 1):
                r = rank.get((sym[i], sym[i + 1]))
                if r is not None and (br is None or r < br):
                    bi, br = i, r
            if br is None:
                break
            sym[bi:bi + 2] = [sym[bi] + sym[bi + 1]]
        return len(sym)

    wcache: dict[str, int] = {}
    ids, counts = [], []
    for did, t in zip(docs["doc_id"].to_pylist(),
                      docs["text"].to_pylist()):
        n = 0
        for w in (t or "").split(" "):
            if not w:
                continue
            if w not in wcache:
                wcache[w] = enc_len(w)
            n += wcache[w]
        ids.append(did)
        counts.append(n)
    pq.write_table(pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "a": pa.array([m[0] for m in merges], pa.string()),
        "b": pa.array([m[1] for m in merges], pa.string()),
    }), os.path.join(out_dir, "merges.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens_bpe": pa.array(counts, pa.int64()),
    }), os.path.join(out_dir, "doc_counts.parquet"))
    with open(done, "w") as f:
        f.write(f"v={BPE_GEN_VERSION} sf={sf_dir}\n")
    return out_dir


def fixture_dir_for(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our fixture sf name."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf not in SF_TURNS:
        import sys
        print(f"[fixtures] unknown scale {sf!r}: falling back to sf0.01",
              file=sys.stderr)
        sf = "sf0.01"
    return ensure_transcripts(sf)
