"""Pure-Python image codecs: PPM (P6) and BMP header parsing.

The container has no PIL/libjpeg, so the multimodal operators' *real-codec*
path uses these dependency-free codecs instead of deterministic stand-ins:
a binary payload is genuinely encoded, its header genuinely parsed, and its
pixel raster genuinely resampled — exercising the same
bytes→decode→transform→digest plumbing that wraps PIL/ffmpeg on a real
corpus (reference treats media as opaque bytes + typed metadata; cf.
schema/pcap.json's raw-bytes columns).

All functions are executor-side helpers for mapInPandas workers — plain
bytes in, plain bytes/tuples out; no Spark imports.
"""

from __future__ import annotations

import struct

PPM_MAGIC = b"P6"


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6): ASCII header + raw RGB raster. ``pixels`` must hold
    exactly width*height*3 bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} pixel bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM: returns (width, height, raster). Real parse —
    validates magic, reads whitespace-separated dims and maxval."""
    if not payload.startswith(PPM_MAGIC):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval separated by whitespace; the
    # raster starts exactly one byte after maxval
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated PPM header")
        fields.append(payload[i:j])
        i = j
    width, height, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = payload[i + 1 :]
    if len(raster) != width * height * 3:
        raise ValueError("raster length mismatch")
    return width, height, raster


def resize_ppm_nn(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Real 2-D nearest-neighbor resize of a P6 PPM; returns the resized
    raster (target_w*target_h*3 bytes). Source pixel for target (x, y) is
    (floor(x*w/tw), floor(y*h/th)) — the classic NN index map."""
    w, h, raster = decode_ppm(payload)
    out = bytearray(target_w * target_h * 3)
    k = 0
    for y in range(target_h):
        sy = (y * h) // target_h
        row = sy * w
        for x in range(target_w):
            sx = (x * w) // target_w
            src = (row + sx) * 3
            out[k : k + 3] = raster[src : src + 3]
            k += 3
    return bytes(out)


# --- BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) ------------------------------

BMP_MAGIC = b"BM"


def encode_bmp_header(width: int, height: int, bpp: int = 24) -> bytes:
    """A valid 54-byte BMP header (no raster) — enough surface to exercise
    the struct-level metadata parse real pipelines do before full decode."""
    row_size = (width * bpp // 8 + 3) & ~3
    image_size = row_size * abs(height)
    file_size = 54 + image_size
    file_header = struct.pack("<2sIHHI", BMP_MAGIC, file_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, image_size, 2835, 2835, 0, 0
    )
    return file_header + info_header


def decode_bmp_meta(payload: bytes) -> tuple[int, int, int]:
    """Parse BMP metadata: returns (width, height, bits-per-pixel)."""
    if not payload.startswith(BMP_MAGIC):
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    return width, height, bpp


WAV_RATE = 8000


def encode_wav(samples: list[int], rate: int = WAV_RATE) -> bytes:
    """Minimal RIFF/WAVE container: 44-byte canonical header + 16-bit
    little-endian mono PCM. ``samples`` are ints in [-32768, 32767]."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = rate * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse the RIFF/WAVE header and PCM block: returns (sample_rate,
    n_samples, samples). Validates magic, format tag (PCM), and mono/16-bit
    layout — a genuinely parsed container, not a stand-in."""
    if len(payload) < 44:
        raise ValueError("payload shorter than a canonical WAVE header")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_size, audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
        "<IHHIIHH", payload[16:36]
    )
    if fmt_size != 16 or audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError("unsupported WAVE layout")
    if payload[36:40] != b"data":
        raise ValueError("missing data chunk")
    (data_len,) = struct.unpack("<I", payload[40:44])
    n = data_len // 2
    samples = list(struct.unpack(f"<{n}h", payload[44 : 44 + data_len]))
    return rate, n, samples
