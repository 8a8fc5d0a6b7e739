"""Pure-stdlib media codecs (zlib + struct only — no PIL/ffmpeg).

This module closes the multimodal codec seam with REAL decoders: the
PNG functions parse actual PNG bytes (signature, chunked layout, CRC,
IDAT inflate, all five scanline filters per the PNG spec) and the WAV
functions parse actual RIFF/WAVE chunk lists (16-bit mono PCM) —
rather than the deterministic fake in ``operators/multimodal.py``.
Matching encoders exist so tests and oracle gates can synthesize valid
payloads from first-principles pixel/sample formulas. Supported
subsets: PNG 8-bit gray/RGB/RGBA non-interlaced, WAV 16-bit mono PCM —
the forms a training-data pipeline normalizes to anyway; anything else
raises ``ValueError`` (fail-loud beats silent garbage at 100 TB).

Everything here is per-item Python intended to run INSIDE Arrow-batched
``mapInPandas`` (see ``operators/multimodal.extract_media_features``);
nothing touches Spark directly.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# bytes per pixel by color type (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``
    bytes) into a valid non-interlaced PNG. Scanline filters cycle
    0,1,2,3,4 by row so a round trip exercises every filter-undo path
    in :func:`decode_png` (any per-row filter choice is spec-legal)."""
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(f"need {width * height * ch} pixel bytes, got {len(pixels)}")
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - ch] if i >= ch else 0) + prev[i]) // 2) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → ``(width, height, channels, pixels)`` with pixels
    as raw row-major 8-bit bytes. Verifies the signature and each
    chunk's CRC; undoes all five scanline filters."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width, height, color_type, idat = 8, None, None, None, bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color_type} "
                    f"interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("inflated size does not match geometry")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        row = bytearray(stride)
        for i in range(stride):
            x = line[i]
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                row[i] = x
            elif ftype == 1:
                row[i] = (x + a) & 0xFF
            elif ftype == 2:
                row[i] = (x + b) & 0xFF
            elif ftype == 3:
                row[i] = (x + (a + b) // 2) & 0xFF
            elif ftype == 4:
                row[i] = (x + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ftype}")
        out += row
        prev = bytes(row)
    return width, height, ch, bytes(out)


def encode_wav(samples: list[int], sample_rate: int = 16_000) -> bytes:
    """Encode 16-bit mono PCM samples into a valid RIFF/WAVE file."""
    import array

    data = array.array("h", samples).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Decode RIFF/WAVE → ``(sample_rate, samples)``. Supported subset:
    16-bit mono PCM (format tag 1); anything else raises ``ValueError``.
    Walks the chunk list properly (fmt need not be the first chunk,
    word-aligned sizes per the RIFF spec)."""
    import array

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={fmt_tag} ch={channels} bits={bits}"
                )
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    samples = array.array("h")
    samples.frombytes(data[: len(data) - (len(data) % 2)])
    return rate, samples.tolist()


def wav_decode_features(payload: bytes | None, kind: str, dim: int = 8) -> list[float]:
    """REAL audio ``decode_fn``: decode the WAV and emit
    ``[sample_rate, n_samples, duration_ms, sum, min, max, zero_crossings,
    0]`` padded/truncated to ``dim``."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    rate, samples = decode_wav(payload)
    n = len(samples)
    zc = sum(
        1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0)
    )
    feats = [
        float(rate),
        float(n),
        float(n * 1000 // rate) if rate else 0.0,
        float(sum(samples)),
        float(min(samples)) if n else 0.0,
        float(max(samples)) if n else 0.0,
        float(zc),
        0.0,
    ]
    return (feats + [0.0] * dim)[:dim]


def png_decode_features(payload: bytes | None, kind: str, dim: int = 8) -> list[float]:
    """REAL ``decode_fn`` for ``extract_media_features``: decode the PNG
    and emit ``[width, height, channels, pixel_sum, pixel_min,
    pixel_max, mean, n_pixels]`` (padded/truncated to ``dim``). Raises
    on non-PNG input — route by ``kind``/mime upstream."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    w, h, ch, px = decode_png(payload)
    n = len(px)
    feats = [
        float(w),
        float(h),
        float(ch),
        float(sum(px)),
        float(min(px)),
        float(max(px)),
        float(sum(px)) / n if n else 0.0,
        float(n),
    ]
    return (feats + [0.0] * dim)[:dim]
