"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels are REAL for the uncompressed public formats a
library-free environment can parse — 24-bit BMP images, RIFF/WAVE PCM16
audio and YUV4MPEG2 video (:mod:`.media_codecs`, numpy + struct only):
decode, nearest-neighbour resize, real FFT band-energy audio features,
real frame extraction. Compressed formats (JPEG/PNG/MP3/H.264) have no
decoder in this container and fall back to a clearly-marked
deterministic digest-derived stub, keeping schema and dataflow
identical; swap the fallback for PIL/librosa/pyav kernels on a cluster
with the libs installed.

Batch-size note (memory-aware): binary payload stages should use a SMALL
``batch_size`` (e.g. 32-256) so batch x concurrency fits the worker heap;
blocks of large binaries are what ``DataContext.target_max_block_size``
is for.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .media_codecs import (decode_bmp, decode_wav_pcm16, encode_bmp,
                           encode_wav_pcm16, encode_y4m, log_mel_like,
                           parse_y4m, resize_nearest)

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),            # typed metadata travels beside the blob
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
])


def media_raws(n: int = 64, seed: int = 5):
    """Yield the deterministic PRE-ENCODING media arrays: one
    ``(media_id, kind, raw, meta)`` tuple per row — the single source of
    truth for both :func:`synthesize_media_table` (which encodes them)
    and the fixture feature oracle (fixtures/gen.py), which derives the
    expected feature values from these raw arrays so a corrupted byte
    anywhere in encode/decode/feature-extract fails the hash."""
    rng = np.random.default_rng(seed)
    kinds = [("image", "audio", "video")[i % 3] for i in range(n)]
    for i, kind in enumerate(kinds):
        if kind == "image":
            w, h = (i % 16 + 1) * 8, (i % 9 + 1) * 8
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                (xx * 255 // max(w - 1, 1)),
                (yy * 255 // max(h - 1, 1)),
                rng.integers(0, 256, (h, w))], axis=-1).astype(np.uint8)
            yield i, kind, img, {"width": w, "height": h, "sample_rate": 0}
        elif kind == "audio":
            sr = 16000
            t = np.arange(800 + 16 * (i % 8)) / sr
            freq = 200.0 + 50.0 * (i % 10)
            sig = (np.sin(2 * np.pi * freq * t) * 0.5
                   + rng.standard_normal(len(t)) * 0.05)
            yield i, kind, sig, {"width": 0, "height": 0, "sample_rate": sr}
        else:
            w, h, nf = 16, 8, 12 + i % 5
            base = np.arange(w, dtype=np.uint8)[None, :] * 15
            frames = np.stack([np.roll(np.broadcast_to(
                base, (h, w)).copy(), f, axis=1) for f in range(nf)])
            yield i, kind, frames, {"width": w, "height": h,
                                    "sample_rate": 0}


def synthesize_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic media rows with REAL payloads: BMP gradients+noise
    for images, sine+noise WAVs for audio, moving-gradient y4m clips
    for video — so the decode stages below exercise their real kernels
    end-to-end without any external library."""
    payloads, widths, heights, rates, kinds = [], [], [], [], []
    for _i, kind, raw, meta in media_raws(n, seed):
        kinds.append(kind)
        widths.append(meta["width"])
        heights.append(meta["height"])
        rates.append(meta["sample_rate"])
        if kind == "image":
            payloads.append(encode_bmp(raw))
        elif kind == "audio":
            payloads.append(encode_wav_pcm16(raw, meta["sample_rate"]))
        else:
            payloads.append(encode_y4m(raw))
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "sample_rate": pa.array(rates, pa.int32()),
    })


def _digest_features(tag: bytes, payload: bytes, dim: int) -> np.ndarray:
    """Declared deterministic STUB for formats with no in-container
    decoder: digest-seeded features with the real schema."""
    digest = hashlib.sha256(tag + payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


class DecodeImage:
    """Actor-pool stage: decode + resize + feature-extract.

    24-bit BMP payloads decode for REAL (media_codecs.decode_bmp):
    nearest-neighbour resize to ``target_size`` and a 32-dim feature of
    channel means/stds + a 26-bin grayscale histogram. Other formats
    (JPEG/PNG...) use the digest stub until a real decoder (PIL) is
    installed and passed via ``use_real_decoder``.
    """

    FEATURE_DIM = 32

    def __init__(self, target_size: tuple[int, int] = (64, 64),
                 use_real_decoder: bool = False):
        pa.set_cpu_count(1)  # actor-pool rule: no Arrow thread fan-out
        self.target = target_size
        self.pil = None
        if use_real_decoder:  # explicit opt-in: presence of PIL alone
            # must never change behavior (ADVICE r1)
            try:  # pragma: no cover - not installed in this environment
                from PIL import Image
                self.pil = Image
            except ImportError:
                pass

    def _features_from_rgb(self, img: np.ndarray) -> np.ndarray:
        img = resize_nearest(img, self.target[0], self.target[1])
        f = np.empty(self.FEATURE_DIM, np.float32)
        flat = img.reshape(-1, 3).astype(np.float32)
        f[0:3] = flat.mean(axis=0) / 255.0
        f[3:6] = flat.std(axis=0) / 255.0
        gray = flat.mean(axis=1)
        hist, _ = np.histogram(gray, bins=26, range=(0.0, 255.0))
        f[6:32] = hist.astype(np.float32) / max(len(gray), 1)
        return f

    def _decode_impl(self, payload: bytes) -> tuple[np.ndarray, bool]:
        if payload[:2] == b"BM":
            try:
                return self._features_from_rgb(decode_bmp(payload)), True
            except ValueError:
                pass  # exotic BMP -> stub
        return _digest_features(b"image:", payload, self.FEATURE_DIM), False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # Ray emits empty blocks routinely, and
            # an upstream kind filter can empty a block entirely
            out = batch.drop_columns(["payload"])
            out = out.append_column("features", pa.nulls(
                0, pa.list_(pa.float32(), self.FEATURE_DIM)))
            out = out.append_column("decoded_w", pa.array([], pa.int32()))
            out = out.append_column("decoded_h", pa.array([], pa.int32()))
            return out.append_column("real_decode",
                                     pa.array([], pa.bool_()))
        payloads = batch["payload"].to_pylist()
        pairs = [self._decode_impl(p) for p in payloads]
        feats = np.stack([p[0] for p in pairs])
        out = batch.drop_columns(["payload"])  # blob consumed, not carried
        out = out.append_column(
            "features", pa.array(list(feats),
                                 pa.list_(pa.float32(), self.FEATURE_DIM)))
        out = out.append_column(
            "decoded_w", pa.array([self.target[0]] * len(payloads), pa.int32()))
        out = out.append_column(
            "decoded_h", pa.array([self.target[1]] * len(payloads), pa.int32()))
        return out.append_column(
            "real_decode", pa.array([p[1] for p in pairs], pa.bool_()))


class ExtractAudioFeatures:
    """Audio feature-extract (mel-spectrogram-shaped output). RIFF/WAVE
    PCM16 payloads decode for REAL: framed |rFFT| pooled into log-spaced
    bands (media_codecs.log_mel_like) — genuine DSP, numpy only. Other
    codecs use the digest stub until librosa/torchaudio is installed."""

    N_MELS = 16
    N_FRAMES = 8

    def __init__(self, sample_rate: int = 16000,
                 use_real_decoder: bool = False):
        pa.set_cpu_count(1)  # actor-pool rule: no Arrow thread fan-out
        self.sample_rate = sample_rate
        self.librosa = None
        if use_real_decoder:  # explicit opt-in, same rationale as
            # DecodeImage: importability of librosa must not flip
            # behavior (ADVICE r1)
            try:  # pragma: no cover - not installed in this environment
                import librosa
                self.librosa = librosa
            except ImportError:
                pass

    def _features(self, payload: bytes) -> np.ndarray:
        if payload[:4] == b"RIFF":
            try:
                samples, _rate = decode_wav_pcm16(payload)
                return log_mel_like(samples, self.N_FRAMES,
                                    self.N_MELS).reshape(-1)
            except ValueError:
                pass
        return _digest_features(b"audio:", payload,
                                self.N_FRAMES * self.N_MELS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        keep = [i for i, k in enumerate(kinds) if k == "audio"]
        out = batch.select(["media_id", "sample_rate"]).take(
            pa.array(keep, pa.int64()))
        feats = [self._features(payloads[i]) for i in keep]
        dim = self.N_FRAMES * self.N_MELS
        arr = (pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats)), dim) if feats
            else pa.nulls(0, pa.list_(pa.float32(), dim)))
        return out.append_column("mel_features", arr)


class SampleFrames:
    """Video frame-sampling: YUV4MPEG2 payloads parse for REAL — one
    output row per sampled frame with its true luma mean; containers
    without an in-sandbox parser emit index-only rows (frame_luma
    null), the declared stub."""

    def __init__(self, every_n: int = 10, max_frames: int = 4):
        pa.set_cpu_count(1)  # actor-pool rule: no Arrow thread fan-out
        self.every_n = every_n
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_frame, out_luma = [], [], []
        for mid, kind, payload in zip(ids, kinds, payloads):
            if kind != "video":
                continue
            if payload[:9] == b"YUV4MPEG2":
                try:
                    _w, _h, frames = parse_y4m(payload)
                    for j, f in enumerate(
                            range(0, len(frames), self.every_n)):
                        if j >= self.max_frames:
                            break
                        out_id.append(mid)
                        out_frame.append(f)
                        out_luma.append(float(frames[f].mean()))
                    continue
                except ValueError:
                    pass
            for f in range(self.max_frames):  # stub: indices only
                out_id.append(mid)
                out_frame.append(f * self.every_n)
                out_luma.append(None)
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "frame_idx": pa.array(out_frame, pa.int32()),
                         "frame_luma": pa.array(out_luma, pa.float64())})
