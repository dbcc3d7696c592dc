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


def fixture_dir_for(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our fixture sf name."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    if sf not in SF_TURNS:
        import sys
        print(f"[fixtures] unknown scale {sf!r}: falling back to sf0.01",
              file=sys.stderr)
        sf = "sf0.01"
    return ensure_transcripts(sf)
