"""Built-in PNG codec: round-trips, filter unfiltering, corruption
detection, and the real (fake=False) Spark decode path end-to-end."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from shopify_etl_spark.operators import multimodal
from shopify_etl_spark.operators.png_codec import decode_png, encode_png


def _raster(h, w, ch=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("ch", [None, 2, 3, 4])
def test_png_round_trip_exact(ch):
    arr = _raster(13, 7, ch, seed=ch or 1)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


def _forward_filter(raster, ftype):
    """Reference forward filter (RFC 2083 §6) to exercise every decode
    branch — the encoder itself only emits filter 0."""
    h, stride = raster.shape
    ch = 1
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        row = raster[y].astype(np.int32)
        filt = np.zeros(stride, np.int32)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[x] = (row[x] - pred) & 0xFF
        out.append(ftype)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = row
    return bytes(out)


def _chunk(ctype, data):
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types_unfilter(ftype):
    arr = _raster(9, 11, seed=ftype + 10)
    ihdr = struct.pack(">IIBBBBB", 11, 9, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_forward_filter(arr, ftype)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), arr)


def test_png_bad_crc_rejected():
    png = bytearray(encode_png(_raster(4, 4)))
    # flip a byte inside the IDAT body (sig 8 + IHDR chunk 25 = 33;
    # IDAT body starts at 33 + 8)
    png[45] ^= 0xFF
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(png))


def test_png_not_a_png_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")


def _png_assets(spark, rasters):
    """Asset table with REAL PNG payloads, one per raster."""
    rows = [
        (i, encode_png(r), ("image", "png", r.shape[1], r.shape[0], None))
        for i, r in enumerate(rasters)
    ]
    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("modality", StringType(), True),
                        StructField("format", StringType(), True),
                        StructField("width", LongType(), True),
                        StructField("height", LongType(), True),
                        StructField("n_bytes", LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_real_decode_features_end_to_end(spark):
    """fake=False decodes real generated PNG bytes inside mapInPandas and
    reports pixel-level stats that match numpy ground truth."""
    rasters = [_raster(8, 8, seed=1), _raster(5, 9, 3, seed=2), _raster(3, 3, 4, seed=3)]
    feats = {
        r.asset_id: r
        for r in multimodal.decode_features(
            _png_assets(spark, rasters), fake=False
        ).collect()
    }
    assert set(feats) == {0, 1, 2}
    for i, arr in enumerate(rasters):
        assert feats[i].n_bytes == arr.size
        assert feats[i].byte_sum == int(arr.sum())
        assert feats[i].byte_mean == int(arr.sum()) // arr.size
        assert feats[i].modality == "image"


def test_real_resize_end_to_end(spark):
    """fake=False resize: decode real PNGs, nearest-neighbor to 4x4, output
    raw rasters matching the numpy gather on the source pixels."""
    rasters = [_raster(16, 12, seed=4), _raster(6, 6, 3, seed=5)]
    out = {
        r.asset_id: r
        for r in multimodal.resize_images(
            _png_assets(spark, rasters), target_w=4, target_h=4, fake=False
        ).collect()
    }
    for i, arr in enumerate(rasters):
        h, w = arr.shape[:2]
        ys = (np.arange(4) * h) // 4
        xs = (np.arange(4) * w) // 4
        expect = np.ascontiguousarray(arr[np.ix_(ys, xs)])
        got = np.frombuffer(bytes(out[i].payload), dtype=np.uint8)
        assert np.array_equal(got, expect.ravel())
        assert out[i].meta.format == "raw"
        assert out[i].meta.n_bytes == expect.size


def test_real_decode_unknown_format_still_raises(spark):
    assets = multimodal.assets_from_documents(
        spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    )
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        multimodal.decode_features(assets, fake=False).collect()


class TestDecoderRobustness:
    def test_fuzz_mutations_raise_clean_errors_only(self):
        """Same executor-safety contract as decode_jpeg: any byte-mutated
        stream either decodes or raises ValueError/NotImplementedError —
        never raw struct.error/zlib.error/IndexError."""
        import random

        import numpy as np

        rng = np.random.default_rng(1)
        rnd = random.Random(3)
        streams = [
            encode_png(rng.integers(0, 256, (20, 24), dtype=np.uint8)),
            encode_png(rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)),
        ]
        for _ in range(1500):
            s = bytearray(rnd.choice(streams))
            for _ in range(rnd.randint(1, 3)):
                op = rnd.random()
                if op < 0.5:
                    s[rnd.randrange(len(s))] = rnd.randrange(256)
                elif op < 0.75:
                    del s[rnd.randrange(len(s))]
                else:
                    s.insert(rnd.randrange(len(s)), rnd.randrange(256))
            try:
                decode_png(bytes(s))
            except (ValueError, NotImplementedError):
                pass

    def test_zlib_bomb_bounded_by_declared_raster(self):
        """A crafted stream with valid CRCs whose IDAT inflates far past
        the IHDR-declared raster must be rejected by the bounded inflate,
        never ballooned into memory."""
        import struct
        import zlib

        import pytest

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 10, 10, 8, 0, 0, 0, 0)
        bomb = zlib.compress(b"\x00" * 5_000_000, 9)
        png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="inflates past"):
            decode_png(png)

    def test_bomb_dims_rejected(self):
        """Valid-CRC IHDR declaring a huge raster fails the max_pixels
        guard before any allocation."""
        import struct
        import zlib

        import pytest

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00")) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="sane bounds"):
            decode_png(png)

    def test_oversize_idat_paused_at_block_boundary_rejected(self):
        """ADVICE r9: a level-0 (stored-block) stream pauses at the
        output cap with NO pending match state, so the old empty-input
        probe `d.decompress(b"", 1)` produced nothing and the oversize
        stream was silently accepted as a truncated decode. The probe
        must feed `unconsumed_tail` so the extra byte surfaces."""
        import struct
        import zlib

        import pytest

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        # 4x4 gray: expected raster = 4*(4*1+1) = 20 bytes; stream
        # inflates to 120 via stored blocks (compression level 0)
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        oversize = zlib.compress(b"\x00" * 120, 0)
        png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", oversize) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="inflates past"):
            decode_png(png)

    def test_truncated_idat_stream_rejected(self):
        """A deflate stream that yields exactly the declared raster but
        never reaches its terminator (Z_FULL_FLUSH prefix, no final
        block) is a truncated stream, not a valid image."""
        import struct
        import zlib

        import pytest

        def chunk(t, b):
            return (
                struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        c = zlib.compressobj()
        trunc = c.compress(b"\x00" * 20) + c.flush(zlib.Z_FULL_FLUSH)
        png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", trunc) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="truncated"):
            decode_png(png)


class TestFullSpecCoverage:
    """r12: the decoder covers the FULL PNG combination table — palette,
    Adam7, bit depths 1/2/4/8/16 — with lossless round-trip contracts
    against the fixture encoders."""

    @pytest.mark.parametrize("interlace", [False, True])
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_16bit_roundtrip(self, ch, interlace):
        from shopify_etl_spark.operators.png_codec import encode_png

        rng = np.random.default_rng(ch)
        shape = (13, 21) if ch == 1 else (13, 21, ch)
        img = rng.integers(0, 65536, shape, dtype=np.uint16)
        got = decode_png(encode_png(img, interlace=interlace))
        assert got.dtype == np.uint16 and np.array_equal(got, img)

    @pytest.mark.parametrize("interlace", [False, True])
    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_low_depth_gray_scales_by_bit_replication(self, depth, interlace):
        from shopify_etl_spark.operators.png_codec import encode_png_gray

        rng = np.random.default_rng(depth)
        img = rng.integers(0, 1 << depth, (16, 17), dtype=np.uint8)
        got = decode_png(encode_png_gray(img, depth, interlace=interlace))
        assert np.array_equal(got, img * (255 // ((1 << depth) - 1)))

    @pytest.mark.parametrize("interlace", [False, True])
    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_palette_roundtrip(self, depth, interlace):
        from shopify_etl_spark.operators.png_codec import encode_png_paletted

        rng = np.random.default_rng(depth + 20)
        npal = min(1 << depth, 11)
        pal = rng.integers(0, 256, (npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, (14, 9), dtype=np.uint8)
        got = decode_png(
            encode_png_paletted(idx, pal, depth=depth, interlace=interlace)
        )
        assert np.array_equal(got, pal[idx])

    def test_palette_trns_yields_rgba(self):
        from shopify_etl_spark.operators.png_codec import encode_png_paletted

        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
        trns = np.array([0, 128, 255], dtype=np.uint8)  # shorter: rest opaque
        idx = rng.integers(0, 6, (10, 12), dtype=np.uint8)
        got = decode_png(encode_png_paletted(idx, pal, trns=trns))
        assert got.shape == (10, 12, 4)
        alpha = np.array([0, 128, 255, 255, 255, 255], dtype=np.uint8)
        assert np.array_equal(got[..., :3], pal[idx])
        assert np.array_equal(got[..., 3], alpha[idx])

    def test_gray_and_rgb_trns_color_key_alpha(self):
        """tRNS on color types 0/2 (color-key transparency, spec
        11.3.2.1): pixels matching the raw-sample key get alpha 0,
        everything else full-scale alpha (r13, ADVICE fix — previously
        the chunk was silently dropped for non-palette types)."""
        import struct as _struct

        from shopify_etl_spark.operators.png_codec import (
            _chunk,
            encode_png,
            encode_png_gray,
        )

        def splice_trns(blob: bytes, payload: bytes) -> bytes:
            pos = 8  # insert the tRNS chunk just before the first IDAT
            while True:
                (length,) = _struct.unpack_from(">I", blob, pos)
                if blob[pos + 4 : pos + 8] == b"IDAT":
                    return blob[:pos] + _chunk(b"tRNS", payload) + blob[pos:]
                pos += 12 + length

        # gray depth 8: single-sample key
        g = np.array([[5, 9], [5, 7]], dtype=np.uint8)
        got = decode_png(splice_trns(encode_png(g), _struct.pack(">H", 5)))
        assert got.shape == (2, 2, 2) and got.dtype == np.uint8
        assert np.array_equal(got[..., 0], g)
        assert np.array_equal(got[..., 1], np.where(g == 5, 0, 255))

        # RGB depth 8: only the exact triple matches
        rgb = np.array(
            [[[1, 2, 3], [1, 2, 4]], [[9, 2, 3], [1, 2, 3]]], dtype=np.uint8
        )
        got = decode_png(
            splice_trns(encode_png(rgb), _struct.pack(">HHH", 1, 2, 3))
        )
        assert got.shape == (2, 2, 4)
        assert np.array_equal(got[..., :3], rgb)
        assert np.array_equal(
            got[..., 3], np.array([[0, 255], [255, 0]], np.uint8)
        )

        # depth 16: raw 16-bit key, uint16 alpha scale
        g16 = np.array([[700, 700], [5, 65535]], dtype=np.uint16)
        got = decode_png(
            splice_trns(encode_png(g16), _struct.pack(">H", 700))
        )
        assert got.dtype == np.uint16 and got.shape == (2, 2, 2)
        assert np.array_equal(got[..., 0], g16)
        assert np.array_equal(got[..., 1], np.where(g16 == 700, 0, 65535))

        # low-depth gray: the key matches the RAW (pre-replication)
        # sample while the emitted channel is bit-replicated
        g2 = np.array([[0, 1], [2, 3]], dtype=np.uint8)
        got = decode_png(
            splice_trns(encode_png_gray(g2, depth=2), _struct.pack(">H", 2))
        )
        assert got.shape == (2, 2, 2)
        assert np.array_equal(got[..., 0], g2 * 85)
        assert np.array_equal(got[..., 1], np.where(g2 == 2, 0, 255))

        # illegal placements still fail loudly
        ga = np.zeros((2, 2, 2), np.uint8)  # color type 4 (gray+alpha)
        with pytest.raises(ValueError, match="illegal for color type 4"):
            decode_png(splice_trns(encode_png(ga), _struct.pack(">H", 0)))
        with pytest.raises(ValueError, match="malformed tRNS"):
            decode_png(splice_trns(encode_png(g), b"\x00"))

    @pytest.mark.parametrize("shape", [(1, 1), (7, 1), (1, 9), (8, 8), (9, 10)])
    def test_adam7_small_rasters_every_pass_subset(self, shape):
        """Tiny rasters exercise the empty-pass paths (a 1x1 image has
        SIX empty Adam7 passes)."""
        from shopify_etl_spark.operators.png_codec import encode_png

        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img, interlace=True)), img)

    def test_adam7_filters_do_not_leak_across_passes(self):
        """Each Adam7 pass unfilters independently: a filter-2 (Up) first
        row of a later pass must see zeros, not the previous pass's last
        row. Hand-built stream: pass rows re-filtered with Up/Sub/Paeth."""
        from shopify_etl_spark.operators.png_codec import (
            _pass_dims,
            _scanline_bytes,
        )

        rng = np.random.default_rng(3)
        w = h = 12
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
            if not pw or not ph:
                continue
            sub = img[y0::dy, x0::dx].reshape(ph, pw * 3).astype(np.int32)
            prev = np.zeros(pw * 3, np.int32)
            for y in range(ph):
                row = sub[y]
                # filter 2 (Up) on every row of every pass: the first row
                # of each pass subtracts ZEROS — the cross-pass leak trap
                raw.append(2)
                raw.extend(((row - prev) & 0xFF).astype(np.uint8).tobytes())
                prev = row
            assert _scanline_bytes(pw, 3, 8) == pw * 3
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(png), img)

    def test_16bit_filters_use_byte_offset_bpp(self):
        """Filters operate on BYTES with offset bpp (6 for 16-bit RGB) —
        a Sub-filtered 16-bit stream decodes correctly only if the
        left-neighbor offset is bytes-per-pixel, not channels."""
        rng = np.random.default_rng(4)
        img = rng.integers(0, 65536, (5, 7, 3), dtype=np.uint16)
        rows = np.zeros((5, 42), dtype=np.uint8)
        flat = img.reshape(5, 21)
        rows[:, 0::2] = (flat >> 8).astype(np.uint8)
        rows[:, 1::2] = (flat & 0xFF).astype(np.uint8)
        raw = bytearray()
        for y in range(5):
            line = rows[y].astype(np.int32)
            filt = np.zeros(42, np.int32)
            for x in range(42):
                a = line[x - 6] if x >= 6 else 0
                filt[x] = (line[x] - a) & 0xFF
            raw.append(1)  # Sub
            raw.extend(filt.astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", 7, 5, 16, 2, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(png), img)

    def test_illegal_combinations_and_malformed_aux_chunks(self):
        from shopify_etl_spark.operators.png_codec import (
            encode_png_gray,
            encode_png_paletted,
        )

        rng = np.random.default_rng(5)
        # illegal depth/color combo via header splice (RGB at depth 4)
        data = bytearray(encode_png(rng.integers(0, 256, (4, 4, 3),
                                                 dtype=np.uint8)))
        data[24] = 4  # IHDR depth byte
        import zlib as _z
        data[29:33] = struct.pack(
            ">I", _z.crc32(bytes(data[12:29])) & 0xFFFFFFFF
        )
        with pytest.raises(ValueError, match="illegal depth/color"):
            decode_png(bytes(data))
        # palette stream whose PLTE is missing
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        pstream = bytearray(encode_png_paletted(
            rng.integers(0, 4, (4, 4), dtype=np.uint8), pal
        ))
        i = bytes(pstream).index(b"PLTE") - 4
        ln = struct.unpack(">I", pstream[i:i + 4])[0]
        del pstream[i:i + 12 + ln]
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(bytes(pstream))
        # out-of-range index inside the pixel data
        with pytest.raises(ValueError, match="palette index"):
            encode_png_paletted(
                np.full((2, 2), 9, dtype=np.uint8), pal
            )
        # encoder guards
        with pytest.raises(ValueError, match="bit range"):
            encode_png_gray(np.full((2, 2), 4, dtype=np.uint8), 2)

    def test_fuzz_extended_shapes_clean_errors_only(self):
        """Same executor-safety contract, now over palette / Adam7 /
        16-bit / low-depth streams."""
        import random

        from shopify_etl_spark.operators.png_codec import (
            encode_png,
            encode_png_gray,
            encode_png_paletted,
        )

        rnd = random.Random(7)
        rng = np.random.default_rng(7)
        pal = rng.integers(0, 256, (13, 3), dtype=np.uint8)
        streams = [
            encode_png(rng.integers(0, 65536, (9, 11, 3), dtype=np.uint16)),
            encode_png(rng.integers(0, 256, (12, 10, 4), dtype=np.uint8),
                       interlace=True),
            encode_png_gray(rng.integers(0, 4, (15, 9), dtype=np.uint8), 2),
            encode_png_paletted(
                rng.integers(0, 13, (11, 8), dtype=np.uint8), pal,
                trns=np.array([5, 250], dtype=np.uint8), interlace=True,
            ),
        ]
        for _ in range(1200):
            s = bytearray(rnd.choice(streams))
            for _ in range(rnd.randint(1, 3)):
                op = rnd.random()
                if op < 0.5:
                    s[rnd.randrange(len(s))] = rnd.randrange(256)
                elif op < 0.75:
                    del s[rnd.randrange(len(s))]
                else:
                    s.insert(rnd.randrange(len(s)), rnd.randrange(256))
            try:
                decode_png(bytes(s), max_pixels=1_000_000)
            except ValueError:
                pass
