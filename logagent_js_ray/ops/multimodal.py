"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode/resize/feature kernels are STUBS in this environment (no
image/audio libraries are installed): ``DecodeImage`` tries to import a
real decoder and, absent one, uses a clearly-marked deterministic fake so
the Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested. Swap ``_decode_impl`` for a real kernel on
a cluster with the libs installed.

Batch-size note (memory-aware): binary payload stages should use a SMALL
``batch_size`` (e.g. 32-256) so batch x concurrency fits the worker heap;
blocks of large binaries are what ``DataContext.target_max_block_size``
is for.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),            # typed metadata travels beside the blob
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
])


def synthesize_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    kinds = [("image", "audio", "video")[i % 3] for i in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([(i % 16 + 1) * 32 for i in range(n)], pa.int32()),
        "height": pa.array([(i % 9 + 1) * 32 for i in range(n)], pa.int32()),
        "sample_rate": pa.array([16000] * n, pa.int32()),
    })


class DecodeImage:
    """Actor-pool stage: decode + resize + feature-extract.

    Real decoder loaded once per actor in ``__init__`` when available;
    otherwise a deterministic fake derives a fixed-length feature vector
    from the payload bytes (sha256-seeded), keeping schema and dataflow
    identical to the real path.
    """

    FEATURE_DIM = 32

    def __init__(self, target_size: tuple[int, int] = (64, 64),
                 use_real_decoder: bool = False):
        self.target = target_size
        self.real = False
        if use_real_decoder:  # explicit opt-in: presence of PIL alone
            # must never turn the working stub into a crash
            try:  # pragma: no cover - not installed in this environment
                from PIL import Image  # noqa: F401
                self.real = True
            except ImportError:
                pass

    def _decode_impl(self, payload: bytes) -> np.ndarray:
        if self.real:  # pragma: no cover
            raise NotImplementedError(
                "real decode kernel not implemented in this sandbox; "
                "construct with use_real_decoder=False (the default)")
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.FEATURE_DIM).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._decode_impl(p) for p in payloads])
        out = batch.drop_columns(["payload"])  # blob consumed, not carried
        out = out.append_column(
            "features", pa.array(list(feats),
                                 pa.list_(pa.float32(), self.FEATURE_DIM)))
        out = out.append_column(
            "decoded_w", pa.array([self.target[0]] * len(payloads), pa.int32()))
        out = out.append_column(
            "decoded_h", pa.array([self.target[1]] * len(payloads), pa.int32()))
        return out


class ExtractAudioFeatures:
    """Audio feature-extract plumbing (mel-spectrogram-shaped output).
    STUB kernel: no audio libs in this container, so features derive
    deterministically from the payload digest; schema (frames x mels
    fixed-size list), batch sizing and actor signature are the real
    contract a librosa/torchaudio kernel would drop into."""

    N_MELS = 16
    N_FRAMES = 8

    def __init__(self, sample_rate: int = 16000,
                 use_real_decoder: bool = False):
        self.sample_rate = sample_rate
        self.real = False
        if use_real_decoder:  # explicit opt-in, same rationale as
            # DecodeImage: importability of librosa must not flip a
            # working stage into a runtime crash
            try:  # pragma: no cover - not installed in this environment
                import librosa  # noqa: F401
                self.real = True
            except ImportError:
                pass

    def _features(self, payload: bytes) -> np.ndarray:
        if self.real:  # pragma: no cover
            raise NotImplementedError(
                "real audio kernel not implemented in this sandbox; "
                "construct with use_real_decoder=False (the default)")
        digest = hashlib.sha256(b"audio:" + payload).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        return rng.standard_normal(
            self.N_FRAMES * self.N_MELS).astype(np.float32)

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
    """Video frame-sampling plumbing: emits one row per sampled frame
    index (flat-map shape) without decoding in the sandbox."""

    def __init__(self, every_n: int = 10, max_frames: int = 4):
        self.every_n = every_n
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        out_id, out_frame = [], []
        for mid, kind in zip(ids, kinds):
            if kind != "video":
                continue
            for f in range(self.max_frames):
                out_id.append(mid)
                out_frame.append(f * self.every_n)
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "frame_idx": pa.array(out_frame, pa.int32())})
