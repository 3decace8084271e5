"""GIF codec tests: LOSSLESS round-trip (palettized content — PNG's
contract, not JPEG's PSNR bound), LZW width-growth/table-full paths,
interlace, multi-frame composition, disposal/transparency semantics,
documented seams, and the executor-safety mutation fuzz."""

import numpy as np
import pytest

from shopify_etl_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _pal(n, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (n, 3), dtype=np.uint8)


class TestLZW:
    @pytest.mark.parametrize("mcs", [2, 3, 5, 8])
    @pytest.mark.parametrize("n", [1, 2, 257, 6000])
    def test_roundtrip(self, mcs, n):
        rng = np.random.default_rng(mcs * 1000 + n)
        idx = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8)
        assert np.array_equal(_lzw_decode(_lzw_encode(idx, mcs), mcs, n), idx)

    def test_repetitive_content_exercises_kwkwk(self):
        """Runs of one symbol drive the KwKwK (code == next_code) path
        every few codes — the classic LZW corner."""
        idx = np.zeros(10_000, dtype=np.uint8)
        assert np.array_equal(
            _lzw_decode(_lzw_encode(idx, 2), 2, len(idx)), idx
        )

    def test_table_full_clear_roundtrip(self):
        """> 4096 distinct phrases force the encoder's table-full CLEAR;
        the decoder must resynchronize through it."""
        rng = np.random.default_rng(0)
        idx = rng.integers(0, 256, size=120_000, dtype=np.uint8)
        assert np.array_equal(
            _lzw_decode(_lzw_encode(idx, 8), 8, len(idx)), idx
        )

    def test_truncated_stream_raises(self):
        data = _lzw_encode(np.arange(16, dtype=np.uint8), 4)
        with pytest.raises(ValueError, match="truncated|ended"):
            _lzw_decode(data[: len(data) // 2], 4, 16)


class TestRoundTrip:
    def test_single_frame_lossless(self):
        rng = np.random.default_rng(7)
        pal = _pal(17)
        img = rng.integers(0, 17, size=(23, 31), dtype=np.uint8)
        frames = decode_gif(encode_gif([img], pal))
        assert len(frames) == 1
        assert np.array_equal(frames[0], pal[img])

    def test_interlaced_equals_progressive(self):
        rng = np.random.default_rng(8)
        pal = _pal(31)
        img = rng.integers(0, 31, size=(37, 19), dtype=np.uint8)
        plain = decode_gif(encode_gif([img], pal))[0]
        inter = decode_gif(encode_gif([img], pal, interlace=True))[0]
        assert np.array_equal(plain, inter)
        assert np.array_equal(plain, pal[img])

    def test_256_colors_width_growth(self):
        rng = np.random.default_rng(9)
        pal = _pal(256)
        img = rng.integers(0, 256, size=(120, 160), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif([img], pal))[0], pal[img])

    def test_two_colors_minimum_code_size(self):
        pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
        img = (np.indices((9, 13)).sum(axis=0) % 2).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif([img], pal))[0], pal[img])

    def test_multi_frame_partial_update_composition(self):
        rng = np.random.default_rng(10)
        pal = _pal(17)
        base = rng.integers(0, 17, size=(20, 20), dtype=np.uint8)
        patch = rng.integers(0, 17, size=(5, 7), dtype=np.uint8)
        fr = decode_gif(
            encode_gif(
                [base, patch], pal, offsets=[(0, 0), (3, 4)], screen=(20, 20)
            )
        )
        assert len(fr) == 2
        assert np.array_equal(fr[0], pal[base])
        expect = pal[base].copy()
        expect[3:8, 4:11] = pal[patch]
        assert np.array_equal(fr[1], expect)


class TestSemantics:
    def test_transparency_leaves_canvas(self):
        """A GCE-transparent index must not overwrite the canvas pixel
        underneath (hand-spliced GCE: the encoder never emits one for
        single frames)."""
        pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
        base = np.zeros((4, 4), dtype=np.uint8)
        over = np.ones((4, 4), dtype=np.uint8)
        over[1, 1] = 0  # index 0 will be declared transparent
        data = bytearray(encode_gif([base, over], pal, screen=(4, 4)))
        # the second frame's GCE: set the transparency flag + index 0
        i = data.index(b"\x21\xf9\x04", data.index(b"\x21\xf9\x04") + 1)
        data[i + 3] |= 0x01
        data[i + 6] = 0
        fr = decode_gif(bytes(data))
        expect = pal[over].copy()
        expect[1, 1] = pal[base][1, 1]  # transparent: base shows through
        assert np.array_equal(fr[1], expect)

    def test_disposal_restore_to_previous_composition(self):
        """Disposal 3: the sprite frame is visible while emitted, then
        the canvas reverts to its pre-sprite pixels for the next frame."""
        rng = np.random.default_rng(11)
        pal = _pal(9)
        base = rng.integers(0, 9, size=(8, 8), dtype=np.uint8)
        sprite = rng.integers(0, 9, size=(3, 3), dtype=np.uint8)
        patch = rng.integers(0, 9, size=(2, 2), dtype=np.uint8)
        fr = decode_gif(
            encode_gif(
                [base, sprite, patch],
                pal,
                offsets=[(0, 0), (2, 2), (5, 5)],
                screen=(8, 8),
                disposals=[1, 3, 1],
            )
        )
        assert len(fr) == 3
        expect0 = pal[base]
        assert np.array_equal(fr[0], expect0)
        expect1 = expect0.copy()
        expect1[2:5, 2:5] = pal[sprite]
        assert np.array_equal(fr[1], expect1)
        # frame 2: sprite reverted (restore-to-previous), patch drawn
        expect2 = expect0.copy()
        expect2[5:7, 5:7] = pal[patch]
        assert np.array_equal(fr[2], expect2)

    def test_disposal_3_after_disposal_2_restores_background(self):
        """'Previous' is the post-disposal canvas of the frame before —
        after a disposal-2 frame that is the background fill, not the
        frame's own pixels."""
        pal = _pal(6)
        a = np.full((4, 4), 2, dtype=np.uint8)
        b = np.full((4, 4), 3, dtype=np.uint8)
        c = np.full((2, 2), 4, dtype=np.uint8)
        fr = decode_gif(
            encode_gif(
                [a, b, c, c],
                pal,
                offsets=[(0, 0), (0, 0), (1, 1), (0, 0)],
                screen=(4, 4),
                bg_index=5,
                disposals=[1, 2, 3, 1],
            )
        )
        bg = pal[5]
        assert np.array_equal(fr[1], pal[b])
        expect2 = np.broadcast_to(bg, (4, 4, 3)).copy()
        expect2[1:3, 1:3] = pal[c]
        assert np.array_equal(fr[2], expect2)
        # frame 3 starts from the restored (all-background) canvas
        expect3 = np.broadcast_to(bg, (4, 4, 3)).copy()
        expect3[0:2, 0:2] = pal[c]
        assert np.array_equal(fr[3], expect3)

    def test_disposal_2_background_comes_from_global_table(self):
        """A frame with a LOCAL color table + disposal 2 must restore to
        the GLOBAL table's background color, not the local table's entry
        at the same index (ADVICE r11)."""
        gpal = np.array(
            [[1, 2, 3], [9, 9, 9], [200, 50, 25]], dtype=np.uint8
        )
        lpal = np.array([[77, 88, 99], [10, 20, 30]], dtype=np.uint8)
        base = np.full((3, 3), 1, dtype=np.uint8)
        over = np.zeros((3, 3), dtype=np.uint8)
        data = bytearray(
            encode_gif([base, over, base], gpal, bg_index=2,
                       disposals=[1, 2, 1])
        )
        # splice a local color table onto frame 2 (the disposal-2 one):
        # image descriptors start at 0x2c; set the LCT flag (2 entries)
        # and insert lpal bytes right after the descriptor.
        descs = []
        i = -1
        while True:
            i = data.find(b"\x2c", i + 1)
            if i == -1:
                break
            descs.append(i)
        # the first 0x2c is frame 1's descriptor; take the second. (0x2c
        # can also appear inside LZW data, so verify the descriptor shape:
        # its packed byte is at +9.)
        d = descs[1]
        assert data[d + 9] in (0x00, 0x40)
        data[d + 9] |= 0x80  # LCT present, size bits 0 → 2 entries
        data[d + 10:d + 10] = lpal.tobytes()
        fr = decode_gif(bytes(data))
        # frame 2 drew local color 0 everywhere
        assert np.array_equal(fr[1], np.broadcast_to(lpal[0], (3, 3, 3)))
        # frame 3's base redraw covers all, but decode must not have
        # crashed looking up bg in the 2-entry local table; verify via a
        # 4th... simpler: re-decode with frame 3 as a partial update.
        data2 = bytearray(
            encode_gif(
                [base, over, np.full((1, 1), 1, np.uint8)],
                gpal,
                offsets=[(0, 0), (0, 0), (0, 0)],
                bg_index=2,
                disposals=[1, 2, 1],
            )
        )
        descs2 = []
        i = -1
        while True:
            i = data2.find(b"\x2c", i + 1)
            if i == -1:
                break
            descs2.append(i)
        d = descs2[1]
        assert data2[d + 9] in (0x00, 0x40)
        data2[d + 9] |= 0x80
        data2[d + 10:d + 10] = lpal.tobytes()
        fr2 = decode_gif(bytes(data2))
        expect = np.broadcast_to(gpal[2], (3, 3, 3)).copy()  # GLOBAL bg
        expect[0, 0] = gpal[1]
        assert np.array_equal(fr2[2], expect)

    def test_reserved_disposal_rejected(self):
        pal = _pal(4)
        img = np.zeros((3, 3), dtype=np.uint8)
        data = bytearray(encode_gif([img, img], pal))
        i = data.index(b"\x21\xf9\x04")
        data[i + 3] = (data[i + 3] & ~0x1C) | (5 << 2)
        with pytest.raises(ValueError, match="disposal"):
            decode_gif(bytes(data))

    def test_cumulative_frame_pixel_bomb_rejected(self):
        """A small stream with a big screen and many tiny frames must be
        rejected on TOTAL decoded pixels, not per-canvas (ADVICE r11:
        each emitted frame is a full-canvas copy)."""
        pal = _pal(2)
        tiny = np.zeros((1, 1), dtype=np.uint8)
        data = encode_gif(
            [tiny] * 64, pal, offsets=[(0, 0)] * 64, screen=(500, 500)
        )
        assert len(data) < 4000  # it really is a few-KB stream
        with pytest.raises(ValueError, match="exceeds"):
            decode_gif(data, max_pixels=1_000_000)
        # same stream under a budget that admits all 64 frames is fine
        assert len(decode_gif(data, max_pixels=64 * 250_000)) == 64

    def test_rejects_non_gif_and_bomb_header(self):
        with pytest.raises(ValueError, match="signature"):
            decode_gif(b"\x89PNG\r\n\x1a\nnot a gif")
        bomb = bytearray(encode_gif([np.zeros((2, 2), np.uint8)], _pal(2)))
        bomb[6:10] = (50_000).to_bytes(2, "little") * 2
        with pytest.raises(ValueError, match="bounds"):
            decode_gif(bytes(bomb), max_pixels=10_000_000)

    def test_index_outside_color_table_rejected(self):
        pal = _pal(4)
        img = np.full((4, 4), 3, dtype=np.uint8)
        data = bytearray(encode_gif([img], pal))
        # shrink the declared GCT to 2 entries would break offsets; easier:
        # encode with a 5-entry palette (ct rounds up to 8) and splice the
        # pixel indices up past the palette via LZW re-encode
        idx = np.full(16, 200, dtype=np.uint8)  # way outside ct size 4
        with pytest.raises(ValueError):
            payload = encode_gif([img], pal)
            # replace image data with out-of-range indices at mcs 8
            head, tail = payload.split(b"\x2c", 1)
            decode_gif(
                head + b"\x2c" + tail[:9] + bytes([8])
                + b"".join(
                    bytes([len(c)]) + c
                    for c in [_lzw_encode(idx, 8)]
                )
                + b"\x00\x3b"
            )


class TestFuzz:
    def test_fuzz_mutations_raise_clean_errors_only(self):
        """Same executor-safety contract as the PNG/JPEG fuzz: mutated
        streams decode or raise ValueError/NotImplementedError — never a
        raw IndexError/struct.error/OverflowError."""
        import random

        rnd = random.Random(4)
        rng = np.random.default_rng(4)
        pal = _pal(31)
        img = rng.integers(0, 31, size=(16, 22), dtype=np.uint8)
        patch = rng.integers(0, 31, size=(4, 6), dtype=np.uint8)
        streams = [
            encode_gif([img], pal),
            encode_gif([img], pal, interlace=True),
            encode_gif([img, patch], pal, offsets=[(0, 0), (2, 3)]),
            encode_gif(
                [img, patch, patch],
                pal,
                offsets=[(0, 0), (2, 3), (7, 1)],
                disposals=[1, 3, 2],
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
                decode_gif(bytes(s), max_pixels=1_000_000)
            except (ValueError, NotImplementedError):
                pass


class TestMultimodalIntegration:
    def test_decode_raster_first_frame(self):
        from shopify_etl_spark.operators.multimodal import _decode_raster

        pal = _pal(9)
        img = np.arange(36, dtype=np.uint8).reshape(6, 6) % 9
        raster = _decode_raster(encode_gif([img], pal), "gif")
        assert np.array_equal(raster, pal[img])

    def test_demux_frames_gif_luma_contract(self):
        from shopify_etl_spark.operators.multimodal import _demux_frames

        pal = _pal(5)
        rng = np.random.default_rng(6)
        frames = [
            rng.integers(0, 5, size=(4, 6), dtype=np.uint8) for _ in range(3)
        ]
        got = list(_demux_frames(encode_gif(frames, pal), "gif"))
        assert [i for i, _ in got] == [0, 1, 2]
        rgb0 = pal[frames[0]].astype(np.float64)
        luma0 = np.clip(
            np.round(
                0.299 * rgb0[..., 0] + 0.587 * rgb0[..., 1] + 0.114 * rgb0[..., 2]
            ),
            0,
            255,
        ).astype(np.uint8)
        assert got[0][1].dtype == np.uint8
        assert np.array_equal(got[0][1], luma0)
