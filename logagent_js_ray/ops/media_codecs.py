"""Pure-numpy codecs for the uncompressed public media formats the
multimodal stages decode for real in this environment: 24-bit BI_RGB
BMP (images), RIFF/WAVE PCM16 (audio), YUV4MPEG2 (video). No external
libraries — every byte layout here is from the public format specs, so
the decode kernels in :mod:`.multimodal` are genuinely real for these
containers; only compressed formats (JPEG/PNG/MP3/H.264) remain
declared stubs.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- BMP

BMP_HEADER = 14
DIB_HEADER = 40  # BITMAPINFOHEADER


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> 24-bit uncompressed BMP (BI_RGB, bottom-up
    rows, 4-byte row padding)."""
    h, w, _ = rgb.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    off = BMP_HEADER + DIB_HEADER
    head = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", DIB_HEADER, w, h, 1, 24, 0,
                      img_size, 2835, 2835, 0, 0)
    body = bytearray()
    zeros = b"\x00" * pad
    bgr = rgb[:, :, ::-1]  # BMP stores BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + zeros
    return head + dib + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB. Raises ValueError on
    anything else (compressed / paletted BMPs are out of scope)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp, comp = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    data = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    img = data.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if flip:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbour resize by index sampling (vectorized)."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


# ----------------------------------------------------------------- WAV

def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """float [-1, 1] mono -> RIFF/WAVE PCM16."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data),
                       b"WAVE")
    return riff + fmt + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono/stereo -> (float32 mono samples, rate).
    Walks the chunk list like any RIFF reader; non-PCM formats raise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, data = 12, None, 1, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    pcm = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    if channels > 1:
        pcm = pcm[:len(pcm) - len(pcm) % channels] \
            .reshape(-1, channels).mean(axis=1)
    return pcm, rate


def log_mel_like(samples: np.ndarray, n_frames: int,
                 n_bands: int) -> np.ndarray:
    """Real DSP feature: frame the signal, |rFFT| per frame, pool the
    spectrum into ``n_bands`` log-spaced bands, log-energy. The shape
    contract a librosa mel-spectrogram kernel drops into."""
    n = len(samples)
    if n < n_frames:
        samples = np.pad(samples, (0, n_frames - n))
        n = n_frames
    frame_len = n // n_frames
    frames = samples[:frame_len * n_frames].reshape(n_frames, frame_len)
    spec = np.abs(np.fft.rfft(frames * np.hanning(frame_len), axis=1))
    nbin = spec.shape[1]
    edges = np.unique(np.geomspace(1, nbin, n_bands + 1).astype(int))
    # geomspace can collapse edges at tiny frame sizes; pad linearly
    while len(edges) < n_bands + 1:
        edges = np.append(edges, edges[-1] + 1)
    out = np.empty((n_frames, n_bands), np.float32)
    for b in range(n_bands):
        lo, hi = edges[b] - 1, max(edges[b + 1] - 1, edges[b])
        out[:, b] = spec[:, lo:hi].sum(axis=1)
    return np.log1p(out).astype(np.float32)


# ----------------------------------------------------------------- Y4M

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w) uint8 luma frames -> YUV4MPEG2 (mono plane, C420 with
    flat chroma)."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    out = bytearray(head)
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    for i in range(n):
        out += b"FRAME\n" + frames[i].tobytes() + chroma + chroma
    return bytes(out)


def parse_y4m(payload: bytes):
    """YUV4MPEG2 -> (width, height, list of luma-plane uint8 arrays)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a y4m stream")
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    w = h = None
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    luma, chroma = w * h, 2 * ((h // 2) * (w // 2))
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        start = fnl + 1
        frames.append(np.frombuffer(payload, np.uint8, count=luma,
                                    offset=start).reshape(h, w))
        pos = start + luma + chroma
    return w, h, frames
