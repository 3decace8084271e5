"""Minimal self-contained Y4M (YUV4MPEG2) frame codec (stdlib + numpy).

The multimodal layer's video path needs a REAL demux-to-frames step, but
no media library ships in this environment (no ffmpeg/pyav). YUV4MPEG2
is the uncompressed interchange container those tools themselves speak
(`ffmpeg -f yuv4mpeg ...`), and its spec is small enough to implement
honestly: a plain-text stream header (``YUV4MPEG2 W<w> H<h> F<n>:<d>
[C<colorspace> ...]``), then per frame a ``FRAME`` marker line followed
by raw planar YUV bytes. Supported colorspaces: mono (luma only), 4:2:0
(all three subsampling tags), 4:2:2 and 4:4:4 — every standard Y4M
colorspace; covers what encoders emit for grayscale and video.

``operators/multimodal.py::sample_frames`` uses this for
``format='y4m'`` payloads; other containers (mp4/mkv/avi) remain the
documented NotImplementedError seam where ffmpeg/pyav would plug in —
compressed codecs are not honestly reimplementable here.

Decode cost is one header parse plus numpy ``frombuffer`` views per
frame — no per-pixel Python. The Arrow ``mapInPandas`` batching above
this keeps per-row overhead off the hot path.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"
#: colorspace tag → bytes per frame as a fraction of w*h (num, den)
_PLANE_RATIO = {
    "C420": (3, 2), "C420jpeg": (3, 2), "C420mpeg2": (3, 2), "C420paldv": (3, 2),
    "C422": (2, 1),
    "C444": (3, 1),
    "Cmono": (1, 1),
}


def encode_y4m(frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """Grayscale rasters (each uint8 (H,W), same shape) → mono Y4M bytes."""
    if not frames:
        raise ValueError("encode_y4m: need at least one frame")
    h, w = frames[0].shape
    out = [b"%s W%d H%d F%d:%d Ip A1:1 Cmono\n" % (_MAGIC, w, h, *fps)]
    for f in frames:
        arr = np.ascontiguousarray(f, dtype=np.uint8)
        if arr.shape != (h, w):
            raise ValueError(f"frame shape {arr.shape} != {(h, w)}")
        out.append(b"FRAME\n")
        out.append(arr.tobytes())
    return b"".join(out)


def decode_y4m(data: bytes, luma_only: bool = True):
    """Y4M bytes → list of per-frame uint8 rasters.

    ``luma_only=True`` (the decimation/feature default) returns each
    frame's Y plane as (H,W); chroma planes are still parsed to advance
    the stream correctly. ``luma_only=False`` returns (H,W,3) for C444
    and the raw planar (luma, u, v) tuple for 4:2:0 / 4:2:2 (whose
    chroma dimensions differ from luma — callers upsample as needed).
    """
    if not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M: stream header has no newline")
    params = data[:nl].decode("ascii", "replace").split(" ")
    w = h = None
    cspace = "C420"  # the spec's default when no C tag is present
    for p in params[1:]:
        try:
            if p.startswith("W"):
                w = int(p[1:])
            elif p.startswith("H"):
                h = int(p[1:])
        except ValueError:
            raise ValueError(f"Y4M header has non-numeric tag {p!r}") from None
        if p.startswith("C"):
            cspace = p
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if w <= 0 or h <= 0:
        raise ValueError(f"Y4M frame dimensions {w}x{h} outside sane bounds")
    if cspace not in _PLANE_RATIO:
        raise ValueError(f"unsupported Y4M colorspace {cspace!r}")
    # Subsampled chroma planes are w//2 (and h//2 for 4:2:0) wide; with an
    # odd dimension the 2:1 byte-ratio frame size and the floor-divided
    # plane reshape disagree, so the stream is ambiguous — reject it
    # explicitly instead of desyncing or raising a confusing reshape error.
    if cspace.startswith("C420") and (w % 2 or h % 2):
        raise ValueError(
            f"Y4M {cspace} requires even frame dimensions, got {w}x{h}"
        )
    if cspace == "C422" and w % 2:
        raise ValueError(f"Y4M C422 requires even width, got {w}")
    num, den = _PLANE_RATIO[cspace]
    frame_bytes = (w * h * num) // den
    luma_bytes = w * h

    frames = []
    pos = nl + 1
    while pos < len(data):
        try:
            fnl = data.index(b"\n", pos)
        except ValueError:
            raise ValueError("truncated Y4M: FRAME marker cut off") from None
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"expected FRAME marker at offset {pos}")
        pos = fnl + 1
        if pos + frame_bytes > len(data):
            raise ValueError("truncated Y4M: incomplete frame payload")
        raw = data[pos : pos + frame_bytes]
        luma = np.frombuffer(raw[:luma_bytes], dtype=np.uint8).reshape(h, w)
        if luma_only or cspace == "Cmono":
            frames.append(luma)
        elif cspace == "C444":
            frames.append(
                np.frombuffer(raw, dtype=np.uint8)
                .reshape(3, h, w)
                .transpose(1, 2, 0)
                .copy()
            )
        else:  # 4:2:0 / 4:2:2 — subsampled chroma; return the planes
            cw = w // 2
            ch_ = h if cspace == "C422" else h // 2
            u = np.frombuffer(
                raw[luma_bytes : luma_bytes + cw * ch_], dtype=np.uint8
            ).reshape(ch_, cw)
            v = np.frombuffer(raw[luma_bytes + cw * ch_ :], dtype=np.uint8).reshape(
                ch_, cw
            )
            frames.append((luma, u, v))
        pos += frame_bytes
    return frames
