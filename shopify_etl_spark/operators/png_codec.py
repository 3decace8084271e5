"""Minimal self-contained PNG codec (stdlib zlib/struct + numpy).

The multimodal layer needs a REAL decode path, but no image library ships
in this environment (no Pillow/opencv). PNG's baseline subset is small
enough to implement honestly: 8-bit depth, grayscale / gray+alpha / RGB /
RGBA, non-interlaced, all five scanline filters (None/Sub/Up/Average/
Paeth per RFC 2083 §6). That covers everything :func:`encode_png`
produces and the overwhelming majority of real-world screenshots and
ML-pipeline thumbnails.

``operators/multimodal.py`` prefers Pillow when importable and falls back
here for ``format='png'`` — the NotImplementedError seam now exists only
for non-PNG formats in Pillow-less environments.

Decode cost is one zlib inflate + per-scanline unfiltering (filters Sub/
Average/Paeth are sequential within a row by definition — every decoder
pays this; rows are numpy-vectorized where the filter allows). The Arrow
``mapInPandas`` batching above this keeps per-row Python overhead off the
hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (bit depth 8 only).
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels → color type


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 raster (H,W) or (H,W,C∈{2,3,4}) → PNG bytes (filter 0 rows)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, ch = *arr.shape, 1
    elif arr.ndim == 3 and arr.shape[2] in _COLOR_TYPE:
        h, w, ch = arr.shape
    else:
        raise ValueError(f"unsupported raster shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    flat = arr.reshape(h, w * ch)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"IDAT size mismatch: got {len(raw)}, want {(stride + 1) * h}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorizes (no intra-row dependency)
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential within a row
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f} on row {y}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes, max_pixels: int = 100_000_000) -> np.ndarray:
    """PNG bytes → uint8 raster (H,W) for grayscale, (H,W,C) otherwise.

    Supports the baseline subset: bit depth 8, color types 0/2/4/6,
    no interlace. CRCs are verified — corrupt payloads raise instead of
    yielding silently-wrong pixels.

    Executor-safe on untrusted bytes (fuzz-pinned, same contract as
    decode_jpeg): malformed streams raise clean ValueError only;
    ``max_pixels`` rejects bomb IHDR dims, and the inflate is
    length-bounded so a crafted zlib bomb cannot balloon past the
    declared raster size.
    """
    try:
        return _decode_png_impl(data, max_pixels)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, OverflowError, struct.error,
            zlib.error, TypeError) as e:
        raise ValueError(
            f"png: corrupt or truncated stream ({type(e).__name__}: {e})"
        ) from e


def _decode_png_impl(data: bytes, max_pixels: int) -> np.ndarray:
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}); baseline subset is 8-bit "
            "non-interlaced gray/GA/RGB/RGBA"
        )
    if w == 0 or h == 0 or w * h > max_pixels:
        raise ValueError(
            f"png: frame dimensions {w}x{h} outside sane bounds "
            f"(max_pixels={max_pixels})"
        )
    ch = _CHANNELS[color]
    # bound the inflate at the declared raster size: a crafted zlib bomb
    # (valid CRCs, tiny IDAT, huge expansion) must not out-allocate the
    # IHDR contract
    expected = h * (w * ch + 1)
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected)
    # when output hits `expected` exactly, the deflate terminator may sit
    # unread in unconsumed_tail — drain it (output still capped at 1 byte)
    # so oversize streams paused at a block boundary can't slip past, and
    # a stream that never reaches eof was truncated mid-block
    if d.decompress(d.unconsumed_tail, 1):
        raise ValueError("png: IDAT inflates past the declared raster size")
    if not d.eof:
        raise ValueError("png: IDAT deflate stream truncated (no terminator)")
    if len(raw) != expected:
        raise ValueError(
            f"png: IDAT inflates to {len(raw)} bytes, expected {expected}"
        )
    pixels = _unfilter(raw, w, h, ch)
    return pixels.reshape(h, w, ch) if ch > 1 else pixels.reshape(h, w)
