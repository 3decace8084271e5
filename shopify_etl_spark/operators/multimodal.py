"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``BinaryType`` columns with
a metadata struct (modality, format, dims, byte size). Decode / feature
extraction runs as Arrow-batched ``mapInPandas`` — the only place Python
touches the data, and it sees columnar batches, not rows.

Decode paths, in preference order:

* **Pillow**, when importable — any format it knows.
* **Built-in PNG codec** (``operators/png_codec.py``, stdlib zlib +
  numpy) — real decode of real PNG bytes with zero external deps; this
  is the live path in this environment.
* **Built-in JPEG codec** (``operators/jpeg_codec.py``, stdlib
  struct + numpy) — real decode of baseline / extended / progressive /
  arithmetic / lossless / hierarchical JPEG — every non-reserved T.81
  frame type (1/3 components, sampling factors ≤ 4, restart
  intervals).
* **Built-in GIF codec** (``operators/gif_codec.py``, stdlib struct +
  numpy) — real LZW decode of GIF87a/89a stills and animations
  (interlace, local palettes, transparency, frame composition with
  all four disposal methods).
* **Built-in Y4M demuxer** (``operators/y4m_codec.py``) — real
  frame extraction from uncompressed YUV4MPEG2 video payloads.
* **Built-in WAV codec** (``operators/wav_codec.py``) — real PCM
  sample decode (8/16/24/32-bit int + float32/64), IMA-ADPCM
  (format tag 0x0011) and G.711 µ-law/A-law (0x0007/0x0006)
  encode/decode for audio payloads.
* ``fake=True`` — deterministic byte-level features over the raw
  payload (no decode), useful for plumbing tests and non-image bytes.
* Everything else (compressed containers/codecs, exotic formats)
  raises NotImplementedError at the exact seam where ffmpeg/torchaudio
  would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal asset schema: payload + typed metadata struct.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("modality", StringType(), True),  # image|audio|video
                    StructField("format", StringType(), True),  # png|jpeg|wav|mp4…
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("n_bytes", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_sum", LongType(), True),
        StructField("byte_mean", LongType(), True),
        StructField("modality", StringType(), True),
    ]
)


def assets_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal asset table from documents (text → fake payload).

    Stands in for a real binary source (S3 image shards, tar archives…):
    payload = UTF-8 bytes of the text, metadata filled from the payload.
    Everything JVM-side (encode/length), so the 'ingest' scales like any
    column projection.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("asset_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("fake-raw").alias("format"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_raster(payload: bytes, fmt: str):
    """payload → uint8 numpy raster. Pillow when importable (any format),
    else the built-in codecs for ``fmt='png'`` (lossless) and
    ``fmt in ('jpeg', 'jpg')`` (baseline sequential);
    NotImplementedError for formats that genuinely need an absent codec.

    Import and decode are deliberately separate: only ImportError may
    route to the fallback chain silently. A Pillow DECODE failure (bad or
    unsupported bytes in a Pillow-equipped environment) still falls back
    to the built-in codecs for png/jpeg, and raises NotImplementedError
    for anything else — so behavior is identical with and without Pillow
    installed instead of leaking UnidentifiedImageError.
    """
    import numpy as np

    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        Image = None
    if Image is not None:
        import io

        try:
            return np.asarray(Image.open(io.BytesIO(bytes(payload))))
        except Exception:
            pass  # non-image / Pillow-unsupported bytes: same path as no-Pillow
    if fmt == "png":
        from .png_codec import decode_png

        return decode_png(bytes(payload))
    if fmt in ("jpeg", "jpg"):
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(bytes(payload))
    if fmt == "gif":
        from .gif_codec import decode_gif

        return decode_gif(bytes(payload))[0]  # first frame (still image)
    raise NotImplementedError(
        f"no codec for format={fmt!r} here (built-in codecs cover png, "
        "jpeg and gif; install Pillow for the rest)"
    )


def decode_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    ``fake=False`` decodes each payload to a pixel raster (Pillow or the
    built-in PNG codec via :func:`_decode_raster`) and emits pixel-level
    stats: n_bytes/byte_sum/byte_mean computed over DECODED PIXELS.
    ``fake=True`` computes the same stats over the raw payload bytes with
    no decode (plumbing tests, opaque formats). Batch shape: the UDF
    receives whole Arrow record batches; per-batch vectorized numpy work.

    NULL payloads are emitted with zeroed stats in BOTH modes — output
    cardinality equals input cardinality regardless of ``fake``, so
    toggling the flag never changes downstream join/count semantics.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                ids, nb, bs, mods = [], [], [], []
                for aid, payload, meta in zip(
                    pdf["asset_id"], pdf["payload"], pdf["meta"]
                ):
                    if payload is None:
                        ids.append(aid)
                        nb.append(0)
                        bs.append(0)
                        mods.append(meta["modality"] if meta is not None else None)
                        continue
                    raster = _decode_raster(
                        payload, meta["format"] if meta is not None else None
                    )
                    ids.append(aid)
                    nb.append(int(raster.size))
                    bs.append(int(raster.sum()))
                    mods.append(meta["modality"] if meta is not None else None)
                yield pd.DataFrame(
                    {
                        "asset_id": pd.Series(ids, dtype="int64"),
                        "n_bytes": pd.Series(nb, dtype="int64"),
                        "byte_sum": pd.Series(bs, dtype="int64"),
                        "byte_mean": pd.Series(
                            [s // max(n, 1) for s, n in zip(bs, nb)], dtype="int64"
                        ),
                        "modality": pd.Series(mods, dtype=object),
                    }
                )
                continue
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            byte_sum = payloads.map(lambda b: int(sum(b)) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "byte_mean": (byte_sum // n_bytes.clip(lower=1)).astype("int64"),
                    "modality": pdf["meta"].map(
                        lambda m: m["modality"] if m is not None else None
                    ),
                }
            )

    return assets.mapInPandas(extract, FEATURE_SCHEMA)


def resize_images(
    assets: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    fake: bool = True,
) -> DataFrame:
    """Batch image resize to a fixed raster (the normalization step before
    any vision-model embedding).

    ``fake=False`` decodes the payload (Pillow or the built-in PNG codec)
    and resizes the real raster by nearest-neighbor index sampling,
    emitting a raw interleaved uint8 payload of exactly
    ``target_w × target_h × channels`` bytes (format ``'raw'``).
    ``fake=True`` treats the payload as a square 1-byte/pixel grayscale
    raster (side = ceil(sqrt(n_bytes)), zero-padded) — same resize math,
    no decode. Either way downstream per-pixel operators can assume a
    fixed shape.
    """
    import math

    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for aid, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if payload is None:
                    continue
                if fake:
                    side = max(1, math.isqrt(max(len(payload) - 1, 0)) + 1)
                    raster = np.zeros(side * side, dtype=np.uint8)
                    raster[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
                    raster = raster.reshape(side, side)
                    out_fmt = "fake-raw"
                else:
                    raster = _decode_raster(
                        payload, meta["format"] if meta is not None else None
                    )
                    out_fmt = "raw"
                h, w = raster.shape[:2]
                ys = (np.arange(target_h) * h) // target_h
                xs = (np.arange(target_w) * w) // target_w
                out = raster[np.ix_(ys, xs)]
                ids.append(aid)
                payloads.append(np.ascontiguousarray(out).tobytes())
                metas.append(
                    {
                        "modality": "image",
                        "format": out_fmt,
                        "width": target_w,
                        "height": target_h,
                        "n_bytes": len(payloads[-1]),
                    }
                )
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype=object),
                    "meta": pd.Series(metas, dtype=object),
                }
            )

    return assets.mapInPandas(resize, ASSET_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_bytes", BinaryType(), True),
        StructField("n_frame_bytes", LongType(), True),
    ]
)


#: Compressed container formats routed through pyav when it is
#: importable (a real multimodal crawl is overwhelmingly these).
_AV_FORMATS = ("mp4", "webm", "mkv", "mov", "avi")


def _demux_frames(payload: bytes, fmt: str):
    """payload → iterator of (frame_idx, uint8 luma raster) — ONE output
    contract for every container format, so downstream sampling code is
    format-blind:

    * ``y4m``: the built-in uncompressed-container codec (always works,
      no dependencies — the testable twin of the compressed path).
    * ``gif``: the built-in GIF codec (``gif_codec.py`` — real LZW,
      interlace, frame composition); animation frames convert to
      ITU-R 601 luma so the per-frame bytes match the y4m contract.
    * mp4/webm/mkv/mov/avi: pyav WHEN IMPORTABLE (``import av``), frames
      converted to a gray plane so the per-frame bytes match the y4m
      path's luma contract exactly. Only ImportError routes to the
      NotImplementedError seam; a pyav DECODE failure on untrusted
      bytes re-raises as the clean ValueError the executor-safety
      contract promises (same hardening as the wav/y4m decoders).
    * anything else: NotImplementedError at the documented seam.
    """
    if fmt == "y4m":
        from .y4m_codec import decode_y4m

        yield from enumerate(decode_y4m(bytes(payload)))
        return
    if fmt == "gif":  # animations: built-in codec, ITU-R 601 luma frames
        import numpy as np

        from .gif_codec import decode_gif

        for fi, rgb in enumerate(decode_gif(bytes(payload))):
            yield fi, np.clip(
                np.round(
                    0.299 * rgb[..., 0]
                    + 0.587 * rgb[..., 1]
                    + 0.114 * rgb[..., 2]
                ),
                0,
                255,
            ).astype(np.uint8)
        return
    if fmt in _AV_FORMATS:
        try:
            import av  # noqa: PLC0415 - optional dependency
        except ImportError:
            raise NotImplementedError(
                f"no demuxer for format={fmt!r} here (built-in codecs "
                "cover y4m and gif; install pyav for compressed "
                "containers)"
            ) from None
        import io

        try:
            with av.open(io.BytesIO(bytes(payload))) as container:
                fi = 0
                for frame in container.decode(video=0):
                    yield fi, frame.to_ndarray(format="gray")
                    fi += 1
        except NotImplementedError:
            raise
        except Exception as e:  # noqa: BLE001 - av.AVError hierarchy varies
            raise ValueError(f"{fmt} demux failed: {e}") from e
        return
    raise NotImplementedError(
        f"no demuxer for format={fmt!r} here (built-in codecs cover y4m "
        "and gif; install pyav for compressed containers)"
    )


def sample_frames(
    assets: DataFrame,
    every_k: int = 4,
    frame_size: int = 64,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per every
    k-th frame (the standard decimation before per-frame embedding).

    ``mapInPandas`` is the right vehicle because the cardinality CHANGES
    (1 asset → n frames) — a pandas UDF can't grow rows, a generator of
    DataFrames can. ``fake=True`` frames the payload as fixed-size byte
    windows (deterministic stand-in for container parsing); ``fake=False``
    REALLY demuxes through :func:`_demux_frames` — the built-in
    uncompressed-container codec for ``format='y4m'`` (luma plane per
    frame), pyav for mp4/webm/mkv/mov/avi when importable, and the
    NotImplementedError seam otherwise; every format yields the same
    (frame_idx, gray raster) contract so the sampling below is
    format-blind. Batch boundaries don't leak into results: framing is
    per-asset, and Spark concatenates whatever DataFrames the generator
    yields.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            if not fake:
                for aid, payload, meta in zip(
                    pdf["asset_id"], pdf["payload"], pdf["meta"]
                ):
                    if payload is None:
                        continue
                    fmt = meta["format"] if meta is not None else None
                    for fi, luma in _demux_frames(payload, fmt):
                        if fi % every_k:
                            continue
                        ids.append(aid)
                        idxs.append(fi)
                        frames.append(luma.tobytes())
                yield pd.DataFrame(
                    {
                        "asset_id": pd.Series(ids, dtype="int64"),
                        "frame_idx": pd.Series(idxs, dtype="int64"),
                        "frame_bytes": pd.Series(frames, dtype=object),
                        "n_frame_bytes": pd.Series(
                            [len(f) for f in frames], dtype="int64"
                        ),
                    }
                )
                continue
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, every_k):
                    ids.append(aid)
                    idxs.append(fi)
                    frames.append(
                        bytes(payload[fi * frame_size : (fi + 1) * frame_size])
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(frames, dtype=object),
                    "n_frame_bytes": pd.Series(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    return assets.mapInPandas(sample, FRAME_SCHEMA)


def synth_wav_assets(docs: DataFrame, id_col: str = "doc_id", rate: int = 16000) -> DataFrame:
    """Deterministic WAV asset synthesis from a key column (stands in for
    a real audio source the way ``assets_from_documents`` stands in for an
    image shard store). Per key ``d``: ``n = 16 + d % 17`` sample frames,
    ``ch = 1 + d % 2`` channels, int16 sample ``i`` =
    ``((d*31 + i*7919) % 65536) - 32768`` — a full-range pseudo-signal a
    SQL oracle can regenerate exactly (``plans/catalog_ext2.py::
    audio_demux_stats``). Encoding runs distributed through the real RIFF
    writer (``wav_codec.encode_wav``), so the downstream decode exercises
    a genuine container round-trip, not canned bytes.
    """

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .wav_codec import encode_wav

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                n = 16 + d % 17
                ch = 1 + d % 2
                i = np.arange(n * ch, dtype=np.int64)
                v = ((d * 31 + i * 7919) % 65536 - 32768).astype(np.int16)
                blob = encode_wav(v.reshape(n, ch), rate)
                meta = {
                    "modality": "audio", "format": "wav",
                    "width": None, "height": None, "n_bytes": len(blob),
                }
                rows.append((d, blob, meta))
            yield pd.DataFrame(rows, columns=["asset_id", "payload", "meta"])

    from .text import spread_small

    # the synth+codec work is CPU-bound Python: a one-file input must
    # not serialize it through one task (round-robin spread; no-op on
    # wide inputs — the 100 TB case)
    return spread_small(docs.select(id_col)).mapInPandas(synth, ASSET_SCHEMA)


def synth_png_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG asset synthesis from a key column — the image
    twin of :func:`synth_wav_assets`. Per key ``d``: a grayscale raster
    ``w = 8 + d % 5`` × ``h = 6 + d % 4`` with pixel (r, c) =
    ``(d*31 + r*17 + c*7) % 256`` — a generator a SQL oracle regenerates
    exactly (``plans/catalog_ext2.py::image_decode_stats``). Encoding
    runs distributed through the real PNG writer (``png_codec.
    encode_png``: zlib deflate + filter-0 scanlines), so the downstream
    decode exercises a genuine compressed-container round-trip.
    """

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .png_codec import encode_png

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 5, 6 + d % 4
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                raster = ((d * 31 + r * 17 + c * 7) % 256).astype(np.uint8)
                blob = encode_png(raster)
                meta = {
                    "modality": "image", "format": "png",
                    "width": w, "height": h, "n_bytes": len(blob),
                }
                rows.append((d, blob, meta))
            yield pd.DataFrame(rows, columns=["asset_id", "payload", "meta"])

    from .text import spread_small

    # the synth+codec work is CPU-bound Python: a one-file input must
    # not serialize it through one task (round-robin spread; no-op on
    # wide inputs — the 100 TB case)
    return spread_small(docs.select(id_col)).mapInPandas(synth, ASSET_SCHEMA)


JPEG_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("dims_match", BooleanType(), False),
        StructField("mae_le_4", BooleanType(), False),
        StructField("psnr_ge_30", BooleanType(), False),
    ]
)


def jpeg_roundtrip_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    quality: int = 90,
) -> DataFrame:
    """Lossy-codec round-trip gate — the JPEG twin of the lossless
    ``image_decode_stats``/``audio_demux_stats`` pipelines, adapted to a
    codec whose pixels are NOT bit-recoverable: per key ``d`` a smooth
    deterministic gradient raster ``w = 24 + d % 9`` × ``h = 24 + d % 7``
    with pixel ``(r, c) = (d % 97) + 3r + 2c`` (≤ 248, no clipping —
    SQL-regenerable) is encoded through the REAL baseline JPEG writer and
    decoded back; the output carries the exact geometry plus
    by-construction quality flags (dims match; mean abs error ≤ 4; PSNR
    ≥ 30 dB — a linear ramp concentrates DCT energy in the lowest
    coefficients, far inside quality-90 quantization). Every step is a
    deterministic pure function of ``d``, so the flags are stable across
    partitionings and runs; the oracle regenerates the geometry and
    asserts the flags (the guarantee-gate pattern). One narrow
    ``mapInPandas`` chain, zero shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg_codec import decode_jpeg, encode_jpeg

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 24 + d % 9, 24 + d % 7
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                raster = ((d % 97) + 3 * r + 2 * c).astype(np.uint8)
                out = decode_jpeg(encode_jpeg(raster, quality=quality))
                dims = out.shape == (h, w)
                err = np.abs(
                    out.astype(np.float64) - raster.astype(np.float64)
                )
                mse = float((err**2).mean())
                psnr = float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)
                rows.append(
                    (d, w, h, w * h, dims, float(err.mean()) <= 4.0, psnr >= 30.0)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_pixels",
                    "dims_match", "mae_le_4", "psnr_ge_30",
                ],
            )

    from .text import spread_small

    # per-coefficient Huffman coding is the heaviest Python in the repo:
    # spread an under-partitioned input or one task pays it all
    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, JPEG_ROUNDTRIP_SCHEMA
    )


PROGRESSIVE_JPEG_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("dims_match", BooleanType(), False),
        StructField("matches_sequential", BooleanType(), False),
        StructField("psnr_ge_30", BooleanType(), False),
    ]
)


def progressive_jpeg_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    quality: int = 90,
) -> DataFrame:
    """Progressive-JPEG cross-path gate — the SOF2 twin of
    :func:`jpeg_roundtrip_stats`, closing the last image-codec seam: per
    key ``d`` the same deterministic gradient raster (``w = 24 + d % 9``
    × ``h = 24 + d % 7``, pixel ``(d % 97) + 3r + 2c``) is encoded
    through the REAL progressive writer (``encode_jpeg_progressive`` —
    libjpeg-style 10-scan script: spectral selection + successive
    approximation) and decoded back by the multi-scan coefficient-
    accumulating decoder.

    The headline flag is STRUCTURAL, not statistical: both coding paths
    quantize to identical coefficients and progressive scans transmit
    every bit of them, so the progressive decode must equal the
    baseline-sequential decode of the same raster BIT-FOR-BIT
    (``matches_sequential``) — a decoder that drops an EOB run,
    mis-walks a refinement pass, or shifts a bit-plane cannot pass.
    PSNR rides along as the usual lossy-quality bound. Every step is a
    pure function of ``d``; the oracle regenerates geometry and asserts
    the flags (guarantee-gate pattern). One narrow ``mapInPandas``
    chain, zero shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg_codec import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 24 + d % 9, 24 + d % 7
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                raster = ((d % 97) + 3 * r + 2 * c).astype(np.uint8)
                prog = decode_jpeg(encode_jpeg_progressive(raster, quality))
                base = decode_jpeg(encode_jpeg(raster, quality=quality))
                dims = prog.shape == (h, w)
                err = prog.astype(np.float64) - raster.astype(np.float64)
                mse = float((err**2).mean())
                psnr = (
                    float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)
                )
                rows.append(
                    (d, w, h, dims, bool(np.array_equal(prog, base)),
                     psnr >= 30.0)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height",
                    "dims_match", "matches_sequential", "psnr_ge_30",
                ],
            )

    from .text import spread_small

    # two full encodes + decodes of per-coefficient Python Huffman work
    # per row: spread an under-partitioned input or one task pays it all
    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, PROGRESSIVE_JPEG_SCHEMA
    )


ARITH_JPEG_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("dims_match", BooleanType(), False),
        StructField("matches_huffman", BooleanType(), False),
        StructField("smaller_than_huffman", BooleanType(), False),
        StructField("psnr_ge_30", BooleanType(), False),
    ]
)


def arith_jpeg_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    quality: int = 90,
) -> DataFrame:
    """Arithmetic-JPEG cross-path gate — the SOF9 twin of
    :func:`progressive_jpeg_stats`, closing the entropy-coding seam: per
    key ``d`` the same deterministic gradient raster is encoded through
    the REAL QM-coder writer (``encode_jpeg_arith`` — T.81 Annex D
    state machine + Annex F.1.4 DC/AC statistical model) and decoded
    back by the adaptive arithmetic decoder.

    The headline flag is STRUCTURAL: both entropy back ends transmit
    the IDENTICAL quantized coefficients, so the arithmetic decode must
    equal the Huffman decode of the same raster BIT-FOR-BIT
    (``matches_huffman``) — a decoder that mis-tracks a context bin, a
    carry ripple, a stuffed byte, or a conditioning category cannot
    pass. ``smaller_than_huffman`` pins the adaptive coder actually
    adapting (static Annex-K tables lose to it on these gradients).
    Every step is a pure function of ``d``; the oracle regenerates
    geometry and asserts the flags (guarantee-gate pattern). One narrow
    ``mapInPandas`` chain, zero shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg_codec import decode_jpeg, encode_jpeg, encode_jpeg_arith

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 24 + d % 9, 24 + d % 7
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                raster = ((d % 97) + 3 * r + 2 * c).astype(np.uint8)
                astream = encode_jpeg_arith(raster, quality=quality)
                hstream = encode_jpeg(raster, quality=quality)
                arith = decode_jpeg(astream)
                huff = decode_jpeg(hstream)
                dims = arith.shape == (h, w)
                err = arith.astype(np.float64) - raster.astype(np.float64)
                mse = float((err**2).mean())
                psnr = (
                    float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)
                )
                rows.append(
                    (d, w, h, dims, bool(np.array_equal(arith, huff)),
                     len(astream) < len(hstream), psnr >= 30.0)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "dims_match",
                    "matches_huffman", "smaller_than_huffman", "psnr_ge_30",
                ],
            )

    from .text import spread_small

    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, ARITH_JPEG_SCHEMA
    )


GIF_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_colors", LongType(), False),
        StructField("interlaced", BooleanType(), False),
        StructField("dims_match", BooleanType(), False),
        StructField("matches_source", BooleanType(), False),
    ]
)


def gif_roundtrip_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """GIF round-trip gate — the LOSSLESS image twin of
    ``image_decode_stats`` (PNG) on the legacy web format: per key ``d``
    a deterministic palette (``2 + d % 31`` colors) and index raster
    (``w = 8 + d % 6`` × ``h = 6 + d % 5``, pixel ``(d + 3r + 2c) %
    n_colors``) encode through the REAL LZW writer — interlaced on odd
    keys, so both row orders stay exercised — and decode back.

    GIF is lossless for palettized content, so the headline flag is
    EXACT: ``matches_source`` pins ``decode(encode(x)) ==
    palette[x]`` pixel-for-pixel — an LZW width-growth slip, a wrong
    interlace pass, or a palette offset bug cannot pass. Every step is
    a pure function of ``d``; the oracle regenerates geometry and
    asserts the flags (guarantee-gate pattern). One narrow
    ``mapInPandas`` chain, zero shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .gif_codec import decode_gif, encode_gif

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 6, 6 + d % 5
                nc = 2 + d % 31
                i = np.arange(nc, dtype=np.int64)
                pal = np.stack(
                    [
                        (d * 7 + i * 13) % 256,
                        (d * 11 + i * 17) % 256,
                        (d * 3 + i * 29) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                idx = ((d + 3 * r + 2 * c) % nc).astype(np.uint8)
                interlaced = bool(d % 2)
                frames = decode_gif(
                    encode_gif([idx], pal, interlace=interlaced)
                )
                ok_dims = (
                    len(frames) == 1 and frames[0].shape == (h, w, 3)
                )
                rows.append(
                    (
                        d, w, h, nc, interlaced, ok_dims,
                        ok_dims and bool(np.array_equal(frames[0], pal[idx])),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_colors",
                    "interlaced", "dims_match", "matches_source",
                ],
            )

    from .text import spread_small

    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, GIF_ROUNDTRIP_SCHEMA
    )


ADPCM_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_channels", LongType(), False),
        StructField("frames_match", BooleanType(), False),
        StructField("snr_ge_20", BooleanType(), False),
        StructField("ratio_le_045", BooleanType(), False),
    ]
)


def adpcm_roundtrip_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    rate: int = 8000,
) -> DataFrame:
    """Lossy-audio round-trip gate — the IMA-ADPCM twin of
    :func:`jpeg_roundtrip_stats`, closing the compressed-audio seam the
    same way JPEG closed the image one: per key ``d`` a band-limited
    deterministic tone (``n = 400 + d % 211`` frames,
    ``ch = 1 + d % 2`` channels, frequency ``100 + d % 50`` Hz at 8 kHz
    — smooth enough that 4-bit ADPCM tracks it) is encoded through the
    REAL block-structured IMA encoder (``wav_codec.encode_wav_adpcm``)
    and decoded back; the output carries the exact geometry plus
    by-construction quality flags (frame count survives the fact-chunk
    trim; SNR ≥ 20 dB; compressed size ≤ 0.45× the PCM encoding — the
    codec's ~4:1 with headers). Every step is a deterministic pure
    function of ``d``, so the flags are stable across partitionings and
    the oracle regenerates geometry and asserts the flags (the
    guarantee-gate pattern). One narrow ``mapInPandas`` chain, zero
    shuffles.

    The size bound is 0.45×PCM, not the asymptotic 0.25: these are
    sub-second clips (400–610 frames), so per-block headers and the
    zero-padded final block are a real fraction of the stream —
    ``block_words=16`` (129-frame blocks) keeps the worst case
    (n=400 mono: 0.393) under the bound at every synth geometry.

    SNR margin (ADVICE r7): channel 1's ``np.roll`` delay wraps the
    tone, so one sample jumps by up to ~12000 int16 steps and ADPCM
    must slew through it; measured exhaustively over the full geometry
    domain the worst-case SNR is 21.78 dB against the 20 dB flag — a
    1.78 dB margin. Any change to ``block_words``, the cold-start
    state, or the synth geometry must re-verify that margin before
    trusting the oracle's unconditional TRUE.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .wav_codec import decode_wav, encode_wav, encode_wav_adpcm

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                n, ch = 400 + d % 211, 1 + d % 2
                freq = 100 + d % 50
                i = np.arange(n, dtype=np.float64)
                tone = np.rint(
                    12000.0 * np.sin(2.0 * np.pi * freq * i / rate)
                ).astype(np.int16)
                sig = np.stack(
                    [np.roll(tone, 13 * c) for c in range(ch)], axis=1
                )
                blob = encode_wav_adpcm(sig, rate, block_words=16)
                back, _rate = decode_wav(blob)
                frames = back.shape == (n, ch)
                ref = sig.astype(np.float64) / 32768.0
                err = back.astype(np.float64) - ref
                snr = 10.0 * np.log10(
                    (ref**2).mean() / max((err**2).mean(), 1e-12)
                )
                ratio = len(blob) / len(encode_wav(sig, rate))
                rows.append((d, n, ch, frames, snr >= 20.0, ratio <= 0.45))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_frames", "n_channels",
                    "frames_match", "snr_ge_20", "ratio_le_045",
                ],
            )

    from .text import spread_small

    # per-sample ADPCM state walks are CPU-bound Python: spread an
    # under-partitioned input or one task pays it all
    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, ADPCM_ROUNDTRIP_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("n_channels", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("zero_cross_rate", DoubleType(), True),
    ]
)


def audio_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Per-asset audio summary features (the normalization/statistics pass
    before any speech-model embedding): sample geometry, duration, RMS
    level, peak, and zero-crossing rate (the classic cheap voiced/
    unvoiced signal).

    ``fake=False`` REALLY decodes ``format='wav'`` payloads with the
    built-in RIFF PCM codec (``operators/wav_codec.py`` — integer PCM
    8/16/24/32-bit and float32, any channel count) and raises for
    compressed formats at the exact seam where ffmpeg/torchaudio would
    plug in. ``fake=True`` frames the raw payload bytes as unsigned
    8-bit mono at a nominal 8 kHz (deterministic stand-in, no decode).

    Stats are channel-pooled (computed over the interleaved stream),
    matching what a corpus-curation filter wants: one loudness/activity
    number per asset. NULL payloads emit a zeroed row in both modes, so
    toggling ``fake`` never changes output cardinality.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .wav_codec import decode_wav

        for pdf in batches:
            rows = []
            for aid, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                if payload is None:
                    rows.append((aid, 0, 0, 0, 0, 0.0, 0.0, 0.0))
                    continue
                if fake:
                    arr = (
                        np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                            np.float32
                        )
                        - 128.0
                    ) / 128.0
                    arr = arr[:, None]
                    rate = 8000
                else:
                    fmt = meta["format"] if meta is not None else None
                    if fmt != "wav":
                        raise NotImplementedError(
                            f"no audio codec for format={fmt!r} here "
                            "(built-in covers wav; plug ffmpeg/torchaudio "
                            "for compressed encodings)"
                        )
                    arr, rate = decode_wav(bytes(payload))
                n = arr.shape[0]
                flat = arr.ravel()
                if n:
                    rms = float(np.sqrt(np.mean(flat * flat)))
                    peak = float(np.max(np.abs(flat)))
                    # sign changes per sample step, pooled across channels
                    zc = float(
                        np.mean(np.signbit(arr[1:]) != np.signbit(arr[:-1]))
                    ) if n > 1 else 0.0
                else:
                    rms = peak = zc = 0.0
                rows.append(
                    (
                        aid,
                        int(rate),
                        int(arr.shape[1]),
                        int(n),
                        int(n * 1000 // max(rate, 1)),
                        rms,
                        peak,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields],
            ).astype(
                {
                    "asset_id": "int64",
                    "sample_rate": "int64",
                    "n_channels": "int64",
                    "n_samples": "int64",
                    "duration_ms": "int64",
                    "rms": "float64",
                    "peak": "float64",
                    "zero_cross_rate": "float64",
                }
            )

    return assets.mapInPandas(extract, AUDIO_FEATURE_SCHEMA)


LOSSLESS_JPEG_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("prec_bits", LongType(), False),
        StructField("predictor", LongType(), False),
        StructField("n_channels", LongType(), False),
        StructField("sample_sum", LongType(), False),
        StructField("matches_source", BooleanType(), False),
    ]
)

ARITH_LOSSLESS_JPEG_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("prec_bits", LongType(), False),
        StructField("predictor", LongType(), False),
        StructField("n_channels", LongType(), False),
        StructField("restart_mcus", LongType(), False),
        StructField("sample_sum", LongType(), False),
        StructField("matches_source", BooleanType(), False),
        StructField("agrees_with_huffman_path", BooleanType(), False),
    ]
)


def lossless_jpeg_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Lossless-JPEG round-trip gate (SOF3, T.81 Annex H — r12): the
    DICOM/raw-camera twin of :func:`gif_roundtrip_stats`, with the same
    EXACT contract — no DCT, no quantization, so ``decode(encode(x))``
    must equal ``x`` bit-for-bit.

    Per key ``d``: a ``w = 8 + d % 7`` × ``h = 6 + d % 5`` raster with
    ``ch = 1 + 2·(d % 2)`` channels at ``prec = 16 if d % 4 == 0 else
    8`` bits, pixel ``(r, c, k) = (d·31 + r·17 + c·7 + k·13) mod
    2^prec``, encoded through the REAL predictive coder with predictor
    ``1 + d % 7`` (all seven T.81 H.1.2 predictors stay exercised),
    one-scan-per-component on ``d % 5 == 0`` — then decoded back.
    Output carries ``matches_source`` (exact equality) AND
    ``sample_sum``, the decoded pixels' integer sum: the oracle
    recomputes that sum from the synthesis formula in SQL, so a decoder
    that misreads a single sample value-mismatches even if the flag
    logic were wrong. Every step is a pure function of ``d``; sweep
    over the full synthesis-key domain (lcm of all periods = 140,
    verified exhaustively pre-ship) backs the blanket-TRUE flag. One
    narrow ``mapInPandas`` chain, zero shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg_codec import decode_jpeg, encode_jpeg_lossless

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 7, 6 + d % 5
                prec = 16 if d % 4 == 0 else 8
                pred = 1 + d % 7
                nch = 1 + 2 * (d % 2)
                interleave = d % 5 != 0
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                k = np.arange(nch, dtype=np.int64)[None, None, :]
                px = (d * 31 + r * 17 + c * 7 + k * 13) % (1 << prec)
                dtype = np.uint8 if prec == 8 else np.uint16
                img = px.astype(dtype)
                if nch == 1:
                    img = img[..., 0]
                got = decode_jpeg(
                    encode_jpeg_lossless(
                        img, predictor=pred, precision=prec,
                        interleave=interleave,
                    )
                )
                rows.append(
                    (
                        d, w, h, prec, pred, nch,
                        int(got.astype(np.int64).sum()),
                        bool(
                            got.dtype == img.dtype
                            and np.array_equal(got, img)
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "prec_bits",
                    "predictor", "n_channels", "sample_sum",
                    "matches_source",
                ],
            )

    from .text import spread_small

    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, LOSSLESS_JPEG_SCHEMA
    )


def arith_lossless_jpeg_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Arithmetic-lossless JPEG round-trip gate (SOF11, T.81 Annex H +
    the Annex D QM-coder — r13): completes the non-hierarchical T.81
    mode matrix. Same EXACT contract as :func:`lossless_jpeg_stats`
    (no DCT, no quantization → ``decode(encode(x)) == x``), with the
    entropy layer swapped for the H.1.2 conditioned difference model.

    Per key ``d``: the SAME raster synthesis as the Huffman gate
    (``w = 8 + d % 7`` × ``h = 6 + d % 5``, ``ch = 1 + 2·(d % 2)``,
    ``prec = 16 if d % 4 == 0 else 8``, predictor ``1 + d % 7``,
    one-scan-per-component on ``d % 5 == 0``) plus the SOF11-specific
    axes: a restart interval ``1 + d % 11`` on ``d % 3 == 0`` (QM
    coder, statistics, class grids and prediction anchor all reset per
    segment) and non-default DAC conditioning ``(L, U) = (1, 3)`` on
    ``d % 6 == 0``. Output carries the value-exact ``sample_sum``,
    ``matches_source``, and ``agrees_with_huffman_path`` — the SOF3
    decode of the SAME raster must agree bit-for-bit, pinning the two
    lossless entropy layers against each other on every key. Sweep
    over the full synthesis-key domain (lcm of all periods = 4620,
    verified exhaustively pre-ship) backs the blanket-TRUE flags. One
    narrow ``mapInPandas`` chain, zero shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg_codec import (
            decode_jpeg,
            encode_jpeg_lossless,
            encode_jpeg_lossless_arith,
        )

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 8 + d % 7, 6 + d % 5
                prec = 16 if d % 4 == 0 else 8
                pred = 1 + d % 7
                nch = 1 + 2 * (d % 2)
                interleave = d % 5 != 0
                restart = (1 + d % 11) if d % 3 == 0 else 0
                cond = (1, 3) if d % 6 == 0 else None
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                k = np.arange(nch, dtype=np.int64)[None, None, :]
                px = (d * 31 + r * 17 + c * 7 + k * 13) % (1 << prec)
                dtype = np.uint8 if prec == 8 else np.uint16
                img = px.astype(dtype)
                if nch == 1:
                    img = img[..., 0]
                got = decode_jpeg(
                    encode_jpeg_lossless_arith(
                        img, predictor=pred, precision=prec,
                        interleave=interleave, restart_interval=restart,
                        dc_cond=cond,
                    )
                )
                huff = decode_jpeg(
                    encode_jpeg_lossless(
                        img, predictor=pred, precision=prec,
                        interleave=interleave,
                    )
                )
                rows.append(
                    (
                        d, w, h, prec, pred, nch, restart,
                        int(got.astype(np.int64).sum()),
                        bool(
                            got.dtype == img.dtype
                            and np.array_equal(got, img)
                        ),
                        bool(
                            got.dtype == huff.dtype
                            and np.array_equal(got, huff)
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "prec_bits",
                    "predictor", "n_channels", "restart_mcus",
                    "sample_sum", "matches_source",
                    "agrees_with_huffman_path",
                ],
            )

    from .text import spread_small

    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, ARITH_LOSSLESS_JPEG_SCHEMA
    )


HIER_JPEG_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("prec_bits", LongType(), False),
        StructField("n_channels", LongType(), False),
        StructField("levels", LongType(), False),
        StructField("base_mode", StringType(), False),
        StructField("dct_rung", BooleanType(), False),
        StructField("sample_sum", LongType(), False),
        StructField("matches_source", BooleanType(), False),
    ]
)


def hier_jpeg_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hierarchical JPEG round-trip gate (T.81 Annex J — r13): DHP +
    EXP reference expansion + a non-differential base frame +
    differential LOSSLESS refinement frames (SOF7/SOF15). The final
    refinement corrects every sample, so ``decode(encode(x)) == x``
    EXACTLY even over a lossy baseline base — which makes this gate
    value-exact like :func:`lossless_jpeg_stats` (the oracle recomputes
    the decoded pixel sum from the synthesis formula in SQL).

    Per key ``d``: a ``w = 16 + d % 9`` × ``h = 16 + d % 7`` raster,
    ``ch = 1 + 2·(d % 2)`` channels, ``prec = 16 if d % 8 == 1 else
    8``, pyramid ``levels = 1 + d % 3`` (bumped to
    2 when a baseline base would otherwise ship with no refinement —
    a lossy base with zero residual frames is honestly lossy); base
    mode cycles baseline (quality ``60 + d % 35``, the lossy-base
    profile) / lossless / SOF11 on ``d % 4``, refinements switch to SOF15 QM coding on
    ``d % 3 == 0``, base predictor ``1 + d % 7``; on ``d % 6 == 2``
    the intermediate refinement level is a LOSSY differential-DCT rung
    covering the full 2x2 differential mode matrix by ``d % 24``:
    SOF5 (2), SOF13 (8, arith override), SOF6 (14, the spectral-
    selection progressive script), SOF14 (20) — each corrected exactly
    by the finest lossless rung. Sweep over the full
    synthesis-key domain (lcm of all periods = 2520, verified
    exhaustively pre-ship) backs the blanket-TRUE flag. One narrow
    ``mapInPandas`` chain, zero shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg_codec import decode_jpeg, encode_jpeg_hierarchical

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 16 + d % 9, 16 + d % 7
                nch = 1 + 2 * (d % 2)
                prec = 16 if d % 8 == 1 else 8
                levels = 1 + d % 3
                base = ("baseline", "lossless", "lossless_arith",
                        "lossless")[d % 4]
                if base == "baseline" and levels == 1:
                    # a lossy base with no refinement frame cannot be
                    # exact — the gate's contract needs >= 1 residual
                    levels = 2
                # DCT rungs on d == 2 (mod 6) -- even (gray, 8-bit)
                # with levels==3, so a real intermediate level exists.
                # The d%24 residue picks the mode-matrix cell: 2=SOF5,
                # 8=SOF13 (arith override), 14=SOF6, 20=SOF14
                dct_refine = d % 6 == 2
                dct_mode = "prog" if d % 24 in (14, 20) else "seq"
                arith = d % 3 == 0 or d % 24 in (8, 20)
                pred = 1 + d % 7
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                k = np.arange(nch, dtype=np.int64)[None, None, :]
                px = (d * 31 + r * 17 + c * 7 + k * 13) % (1 << prec)
                dtype = np.uint8 if prec == 8 else np.uint16
                img = px.astype(dtype)
                if nch == 1:
                    img = img[..., 0]
                got = decode_jpeg(
                    encode_jpeg_hierarchical(
                        img, levels=levels, base=base,
                        quality=60 + d % 35, predictor=pred,
                        precision=prec, arith=arith,
                        dct_refine=dct_refine, dct_mode=dct_mode,
                    )
                )
                rows.append(
                    (
                        d, w, h, prec, nch, levels, base, dct_refine,
                        int(got.astype(np.int64).sum()),
                        bool(
                            got.dtype == img.dtype
                            and np.array_equal(got, img)
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "prec_bits",
                    "n_channels", "levels", "base_mode", "dct_rung",
                    "sample_sum", "matches_source",
                ],
            )

    from .text import spread_small

    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, HIER_JPEG_SCHEMA
    )


G711_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_channels", LongType(), False),
        StructField("law", StringType(), False),
        StructField("frames_match", BooleanType(), False),
        StructField("snr_ge_30", BooleanType(), False),
        StructField("ratio_half_pcm", BooleanType(), False),
        StructField("err_le_segment", BooleanType(), False),
    ]
)


def g711_roundtrip_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    rate: int = 8000,
) -> DataFrame:
    """G.711 telephony round-trip gate — the µ-law/A-law sibling of
    :func:`adpcm_roundtrip_stats`: per key ``d`` a deterministic tone
    (``n = 300 + d % 173`` frames, ``ch = 1 + d % 2`` channels,
    ``120 + d % 40`` Hz, amplitude 11000) is companded through the REAL
    vectorized G.711 encoder (µ-law on even keys, A-law on odd) and
    expanded back. Flags: exact frame geometry; SNR ≥ 30 dB (log
    companding holds ~38 dB SNR on full-range content — wide margin);
    whole-container size ≤ 0.56× the PCM16 encoding (1 code byte per
    sample; the exact worst case is (56+n+pad)/(44+2n) = 0.5543 at the
    smallest synth geometry n=300 mono — headers, not codes); and the
    per-sample error never exceeds the amplitude's companding-segment
    step (512 int16 units: amplitude 11000 falls in segment 6 of both
    laws, step 128<<2 µ-law / 64<<3 A-law; sweep-measured worst 257 =
    half-step + rounding).
    The codec itself is differential-verified against stdlib audioop
    over the FULL domain (tests/test_codec_differential.py); this gate
    makes the path catalog-graded. One narrow mapInPandas chain, zero
    shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .wav_codec import decode_wav, encode_wav, encode_wav_g711

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                n, ch = 300 + d % 173, 1 + d % 2
                freq = 120 + d % 40
                law = "ulaw" if d % 2 == 0 else "alaw"
                i = np.arange(n, dtype=np.float64)
                tone = np.rint(
                    11000.0 * np.sin(2.0 * np.pi * freq * i / rate)
                ).astype(np.int16)
                sig = np.stack(
                    [np.roll(tone, 11 * c) for c in range(ch)], axis=1
                )
                blob = encode_wav_g711(sig, rate, law)
                back, _rate = decode_wav(blob)
                frames = back.shape == (n, ch)
                ref = sig.astype(np.float64) / 32768.0
                err = back.astype(np.float64) - ref
                snr = 10.0 * np.log10(
                    (ref**2).mean() / max((err**2).mean(), 1e-12)
                )
                max_err = float(np.abs(err).max()) * 32768.0
                ratio = len(blob) / len(encode_wav(sig, rate))
                rows.append(
                    (
                        d, n, ch, law, frames,
                        bool(snr >= 30.0),
                        bool(ratio <= 0.56),
                        bool(max_err <= 512.0),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_frames", "n_channels", "law",
                    "frames_match", "snr_ge_30", "ratio_half_pcm",
                    "err_le_segment",
                ],
            )

    from .text import spread_small

    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, G711_ROUNDTRIP_SCHEMA
    )


PROG_ARITH_JPEG_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("dims_match", BooleanType(), False),
        StructField("matches_baseline", BooleanType(), False),
        StructField("smaller_than_prog_huffman", BooleanType(), False),
        StructField("psnr_ge_30", BooleanType(), False),
    ]
)


def prog_arith_jpeg_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    quality: int = 85,
) -> DataFrame:
    """Progressive-arithmetic cross-path gate (SOF10 — r12), completing
    the JPEG DCT-mode matrix: per key ``d`` the SAME gradient synthesis
    as :func:`arith_jpeg_stats` is encoded through the T.81 Annex G
    scan script with the QM-coder back end
    (``encode_jpeg_arith_progressive``) and decoded by the real G.3
    model decoder. ``matches_baseline`` pins bit-exact agreement with
    the SOF0 Huffman decode — all four DCT encoders share one
    coefficient front half, so a model/context slip anywhere in the
    G.3 DC/AC first/refinement paths cannot pass.
    ``smaller_than_prog_huffman`` pins the adaptive coder beating the
    static Annex-K tables scan-for-scan. One narrow mapInPandas chain,
    zero shuffles.
    """

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .jpeg_codec import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_arith_progressive,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            rows = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 24 + d % 9, 24 + d % 7
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                raster = ((d % 97) + 3 * r + 2 * c).astype(np.uint8)
                pstream = encode_jpeg_arith_progressive(
                    raster, quality=quality
                )
                got = decode_jpeg(pstream)
                base = decode_jpeg(encode_jpeg(raster, quality=quality))
                dims = got.shape == (h, w)
                err = got.astype(np.float64) - raster.astype(np.float64)
                mse = float((err**2).mean())
                psnr = (
                    float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)
                )
                rows.append(
                    (
                        d, w, h, dims,
                        bool(np.array_equal(got, base)),
                        len(pstream) < len(
                            encode_jpeg_progressive(raster, quality=quality)
                        ),
                        psnr >= 30.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "dims_match",
                    "matches_baseline", "smaller_than_prog_huffman",
                    "psnr_ge_30",
                ],
            )

    from .text import spread_small

    return spread_small(docs.select(id_col)).mapInPandas(
        roundtrip, PROG_ARITH_JPEG_SCHEMA
    )


PATCH_GRID_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_patches", LongType(), False),
        StructField("pixel_sum", LongType(), False),
    ]
)


def png_patch_grid(
    assets: DataFrame, patch: int = 4, id_col: str = "asset_id"
) -> DataFrame:
    """REAL image decode → ViT-style patch-token geometry per asset:
    ``n_patches = ceil(h/patch) · ceil(w/patch)`` over the DECODED raster
    (plus the decoded pixel sum as the byte-stat witness) — the image
    half of an interleaved multimodal training sample, where each image
    occupies ``n_patches`` sequence positions next to the document's
    text tokens (the LLaVA/Fuyu packing geometry).

    Zero-shuffle ``mapInPandas`` over the payload column; dimensions
    come from the decode itself, never the metadata, so a decoder that
    mangles geometry changes the downstream interleave manifest and
    hash-mismatches its oracle (``plans/catalog_ext6.py::
    interleaved_mm_spans``)."""

    def grid(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for aid, payload, meta in zip(
                pdf[id_col], pdf["payload"], pdf["meta"]
            ):
                raster = _decode_raster(
                    payload, meta["format"] if meta is not None else None
                )
                h, w = raster.shape[0], raster.shape[1]
                np_ = (-(-h // patch)) * (-(-w // patch))
                rows.append((int(aid), w, h, np_, int(raster.sum())))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_patches", "pixel_sum",
                ],
            )
            rows = []

    return assets.select(id_col, "payload", "meta").mapInPandas(
        grid, PATCH_GRID_SCHEMA
    )
