"""Self-contained PNG codec (stdlib zlib/struct + numpy).

The multimodal layer needs a REAL decode path, but no image library ships
in this environment (no Pillow/opencv). Since r12 the decoder covers the
FULL PNG still-image spec (RFC 2083 / ISO 15948), not just the 8-bit
truecolor subset a screenshot pipeline emits — a 100 TB crawl hits
palette GIFs-converted-to-PNGs, ancient 1/2/4-bit gray scans, Adam7
thumbnails and 16-bit scientific masters at volume:

* color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA);
* bit depths 1/2/4/8/16 exactly as the spec's combination table allows
  (low depths for gray and palette; 8/16 elsewhere);
* interlace 0 and 1 (the full 7-pass Adam7 schedule);
* all five scanline filters (None/Sub/Up/Average/Paeth), applied
  per-pass with the pass's own geometry, byte offset = bpp per spec;
* PLTE + tRNS: palette images decode to RGB, or RGBA when a tRNS chunk
  assigns per-entry alpha; gray/RGB tRNS (color-key transparency,
  spec 11.3.2.1) emits an alpha channel keyed on the raw sample value.

Output contract (matches what libpng's expand-to-8 gives and what the
Pillow differential in tests/test_codec_differential.py compares
against): gray 1/2/4-bit scales to uint8 by exact bit replication
(255/(2^d-1) is integral for d in {1,2,4}), 8-bit stays uint8, 16-bit
returns uint16; palette returns uint8 RGB(A).

``operators/multimodal.py`` prefers Pillow when importable and falls back
here for ``format='png'``.

Untrusted-bytes contract (fuzz-pinned): CRCs are verified, malformed
streams raise clean ValueError only, ``max_pixels`` rejects bomb IHDR
dims before any allocation, and the inflate is length-bounded so a
crafted zlib bomb cannot balloon past the declared raster size.

Decode cost is one zlib inflate + per-scanline unfiltering (filters Sub/
Average/Paeth are sequential within a row by definition — every decoder
pays this); sample unpacking (bit-depth expansion, 16-bit assembly,
palette lookup) is whole-image vectorized numpy. The Arrow
``mapInPandas`` batching above this keeps per-row Python overhead off
the hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
#: color type → samples per pixel
_NCH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: legal bit depths per color type (the spec's combination table)
_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
           4: (8, 16), 6: (8, 16)}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels → color type (encode)
#: Adam7 pass schedule: (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _scanline_bytes(w: int, ch: int, depth: int) -> int:
    return (w * ch * depth + 7) // 8


def _pass_dims(w: int, h: int):
    """Adam7 pass geometries: list of (x0, y0, dx, dy, pw, ph)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        out.append((x0, y0, dx, dy, pw, ph))
    return out


# ---------------------------------------------------------------------------
# Encode (fixture generators; filter-0 rows throughout)
# ---------------------------------------------------------------------------


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, n_samples) ints → (h, scanline_bytes) uint8 per the depth's
    packing (MSB-first sub-byte packing; big-endian 16-bit)."""
    h, n = samples.shape
    if depth == 8:
        return samples.astype(np.uint8)
    if depth == 16:
        out = np.zeros((h, n * 2), dtype=np.uint8)
        out[:, 0::2] = samples >> 8
        out[:, 1::2] = samples & 0xFF
        return out
    shifts = np.arange(depth - 1, -1, -1)
    bits = ((samples[:, :, None] >> shifts) & 1).reshape(h, n * depth)
    return np.packbits(bits.astype(np.uint8), axis=1)  # zero-padded tail


def _emit_idat(samples: np.ndarray, w: int, h: int, ch: int, depth: int,
               interlace: bool) -> bytes:
    """Full-image samples (h, w*ch) → filtered raw stream (filter 0)."""
    if not interlace:
        packed = _pack_rows(samples, depth)
        return b"".join(b"\x00" + packed[y].tobytes() for y in range(h))
    grid = samples.reshape(h, w, ch)
    raw = bytearray()
    for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
        if pw == 0 or ph == 0:
            continue
        sub = grid[y0::dy, x0::dx].reshape(ph, pw * ch)
        packed = _pack_rows(sub, depth)
        for y in range(ph):
            raw += b"\x00" + packed[y].tobytes()
    return bytes(raw)


def encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Raster → PNG bytes. uint8 (H,W) / (H,W,C∈{2,3,4}) encodes at
    depth 8; uint16 input encodes the same color types at depth 16.
    ``interlace=True`` emits the Adam7 schedule (filter-0 rows)."""
    depth = 16 if np.asarray(arr).dtype == np.uint16 else 8
    arr = np.ascontiguousarray(
        arr, dtype=np.uint16 if depth == 16 else np.uint8
    )
    if arr.ndim == 2:
        h, w, ch = *arr.shape, 1
    elif arr.ndim == 3 and arr.shape[2] in _COLOR_TYPE:
        h, w, ch = arr.shape
    else:
        raise ValueError(f"unsupported raster shape {arr.shape}")
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, _COLOR_TYPE[ch], 0, 0, int(interlace)
    )
    samples = arr.reshape(h, w * ch).astype(np.int64)
    raw = _emit_idat(samples, w, h, ch, depth, interlace)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png_gray(
    arr: np.ndarray, depth: int, interlace: bool = False
) -> bytes:
    """Low-depth grayscale fixture generator: (H,W) values < 2^depth →
    color-type-0 PNG at depth 1/2/4 (8/16 route through encode_png)."""
    if depth not in (1, 2, 4):
        raise ValueError("encode_png_gray is for depths 1/2/4")
    arr = np.ascontiguousarray(arr)
    if arr.ndim != 2:
        raise ValueError("gray raster must be (H, W)")
    if arr.size and int(arr.max()) >= (1 << depth):
        raise ValueError(f"sample exceeds {depth}-bit range")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, int(interlace))
    samples = arr.reshape(h, w).astype(np.int64)
    raw = _emit_idat(samples, w, h, 1, depth, interlace)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png_paletted(
    idx: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    depth: int | None = None,
    interlace: bool = False,
) -> bytes:
    """Index raster + (n,3) palette → color-type-3 PNG (PLTE [+ tRNS]).

    ``depth`` defaults to the smallest of 1/2/4/8 that fits the palette;
    ``trns`` is an optional per-entry uint8 alpha vector (may be shorter
    than the palette — remaining entries are opaque, per spec)."""
    idx = np.ascontiguousarray(idx)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= len(palette) <= 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    if idx.ndim != 2:
        raise ValueError("index raster must be (H, W)")
    if idx.size and int(idx.max()) >= len(palette):
        raise ValueError("palette index out of range")
    if depth is None:
        depth = next(d for d in (1, 2, 4, 8) if len(palette) <= (1 << d))
    if depth not in (1, 2, 4, 8):
        raise ValueError("palette depth must be 1/2/4/8")
    if len(palette) > (1 << depth):
        raise ValueError(f"palette too large for depth {depth}")
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, int(interlace))
    out = _SIGNATURE + _chunk(b"IHDR", ihdr)
    out += _chunk(b"PLTE", palette.tobytes())
    if trns is not None:
        trns = np.ascontiguousarray(trns, dtype=np.uint8)
        if trns.ndim != 1 or len(trns) > len(palette):
            raise ValueError("tRNS must be (n<=len(palette),) uint8")
        out += _chunk(b"tRNS", trns.tobytes())
    samples = idx.reshape(h, w).astype(np.int64)
    raw = _emit_idat(samples, w, h, 1, depth, interlace)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _unfilter(raw, offset: int, nbytes: int, h: int, bpp: int) -> np.ndarray:
    """Unfilter ``h`` scanlines of ``nbytes`` starting at ``raw[offset]``
    (each prefixed by its filter byte); ``bpp`` is the spec's left-pixel
    byte offset — max(1, ceil(channels*depth/8))."""
    out = np.zeros((h, nbytes), dtype=np.uint8)
    for y in range(h):
        base = offset + y * (nbytes + 1)
        f = raw[base]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=nbytes, offset=base + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(nbytes, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorizes (no intra-row dependency)
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential within a row
            rec = np.zeros(nbytes, np.int32)
            for x in range(nbytes):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
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


def _unpack_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, scanline_bytes) uint8 → (h, w*ch) int32 samples (MSB-first
    sub-byte order; big-endian 16-bit) — whole-image vectorized."""
    h = rows.shape[0]
    n = w * ch
    if depth == 8:
        return rows[:, :n].astype(np.int32)
    if depth == 16:
        return (
            rows[:, : 2 * n : 2].astype(np.int32) << 8
        ) | rows[:, 1 : 2 * n : 2].astype(np.int32)
    bits = np.unpackbits(rows, axis=1)[:, : n * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int32)
    return bits.reshape(h, n, depth).astype(np.int32) @ weights


def decode_png(data: bytes, max_pixels: int = 100_000_000) -> np.ndarray:
    """PNG bytes → raster.

    Full spec coverage: color types 0/2/3/4/6, bit depths 1/2/4/8/16
    per the legal combination table, interlace 0 and Adam7, all five
    filters, PLTE/tRNS. Output: gray depth<8 scales to uint8 by bit
    replication; depth 16 returns uint16; palette returns uint8 RGB
    (RGBA when tRNS is present); shapes (H,W) for 1-channel output,
    (H,W,C) otherwise. CRCs are verified — corrupt payloads raise
    instead of yielding silently-wrong pixels.

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
    plte = None
    trns = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if len(body) % 3 or not 3 <= len(body) <= 768:
                raise ValueError("png: malformed PLTE chunk")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if color not in _DEPTHS or depth not in _DEPTHS[color]:
        raise ValueError(
            f"png: illegal depth/color combination ({depth}, {color})"
        )
    if interlace not in (0, 1):
        raise ValueError(f"png: unknown interlace method {interlace}")
    if w == 0 or h == 0 or w * h > max_pixels:
        raise ValueError(
            f"png: frame dimensions {w}x{h} outside sane bounds "
            f"(max_pixels={max_pixels})"
        )
    if color == 3 and plte is None:
        raise ValueError("png: palette image without PLTE chunk")
    ch = _NCH[color]
    bpp = max(1, (ch * depth) // 8)

    if interlace == 0:
        segments = [(None, h, _scanline_bytes(w, ch, depth))]
    else:
        segments = [
            (p, ph, _scanline_bytes(pw, ch, depth))
            for p in _pass_dims(w, h)
            for pw, ph in [(p[4], p[5])]
            if pw and ph
        ]
    expected = sum(ph * (nb + 1) for _, ph, nb in segments)
    # bound the inflate at the declared raster size: a crafted zlib bomb
    # (valid CRCs, tiny IDAT, huge expansion) must not out-allocate the
    # IHDR contract
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

    if interlace == 0:
        rows = _unfilter(raw, 0, segments[0][2], h, bpp)
        samples = _unpack_samples(rows, w, ch, depth)
    else:
        grid = np.zeros((h, w * ch), dtype=np.int32).reshape(h, w, ch)
        offset = 0
        for (x0, y0, dx, dy, pw, ph), ph2, nb in segments:
            rows = _unfilter(raw, offset, nb, ph2, bpp)
            offset += ph2 * (nb + 1)
            sub = _unpack_samples(rows, pw, ch, depth).reshape(ph2, pw, ch)
            grid[y0::dy, x0::dx] = sub
        samples = grid.reshape(h, w * ch)

    if color == 3:
        idx = samples.reshape(h, w)
        if int(idx.max()) >= len(plte):
            raise ValueError("png: palette index outside the PLTE table")
        rgb = plte[idx]
        if trns is not None:
            if len(trns) > len(plte):
                raise ValueError("png: tRNS longer than the palette")
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    alpha = None
    if trns is not None:
        # color-key transparency (spec 11.3.2.1): tRNS for gray/RGB holds
        # one raw sample per channel, 2 bytes each at the SOURCE depth —
        # match on raw samples before any bit-replication scaling
        if color not in (0, 2):
            raise ValueError(
                f"png: tRNS chunk is illegal for color type {color}"
            )
        if len(trns) != 2 * ch:
            raise ValueError(
                f"png: malformed tRNS for color type {color} "
                f"({len(trns)} bytes, expected {2 * ch})"
            )
        key = np.frombuffer(trns, dtype=">u2").astype(np.int32)
        mask = (
            samples.reshape(h, w, ch) == key[None, None, :]
        ).all(axis=2)
        alpha = np.where(mask, 0, 65535 if depth == 16 else 255)
    if depth == 16:
        arr = samples.astype(np.uint16)
    elif depth < 8:  # gray only (per the combination table)
        arr = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    else:
        arr = samples.astype(np.uint8)
    arr = arr.reshape(h, w, ch) if ch > 1 else arr.reshape(h, w)
    if alpha is not None:
        planes = arr if arr.ndim == 3 else arr[:, :, None]
        return np.dstack([planes, alpha.astype(arr.dtype)])
    return arr
